package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Round-5 pipeline operators: quality/repetition filters, benchmark
  * decontamination, Bloom incremental dedup, regex redaction.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("repetitionMetrics flags a degenerate doc and clears a diverse one") {
    val df = Seq(
      ("rep", "spam spam spam spam spam spam"),
      ("div", "one two three four five six")).toDF("doc_id", "text")
    val m = QualityFilters.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m("rep") == ((1.0, 1.0, 0.75)), "all-one-token doc: every metric maxed")
    assert(m("div")._1 === 1.0 / 6)
    assert(m("div")._3 === 0.0, "no repeated 3-gram in an all-distinct doc")
  }

  test("repetition metrics run in linear time (materialized arrays, no lambda re-eval)") {
    // Regression guard: with the gram arrays built INSIDE the counting
    // lambdas, Spark re-evaluates the construction per distinct element
    // (no CSE in lambda trees) — 24s for these 500 docs. Materialized,
    // it's sub-second; 10s is generous headroom for CI noise.
    val docs = graft.Tables(spark, graft.SparkFixture.sfDir).documents
    val t0 = System.nanoTime()
    QualityFilters.repetitionMetrics(docs, "doc_id", "text").foreach(_ => ())
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 10.0, f"repetitionMetrics took $sec%.1fs for 500 docs — lambda re-eval is back")
  }

  test("qualityGate keeps only docs passing every threshold") {
    val df = Seq(
      ("short", "too few words"),
      ("spammy", Seq.fill(40)("buy").mkString(" ")),
      ("good", (1 to 40).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val keep = QualityFilters.qualityGate(df, "doc_id", "text", 30, 0.3, 0.2)
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(keep == Map("short" -> false, "spammy" -> false, "good" -> true))
  }

  test("redaction masks PII patterns and counts hits") {
    val df = Seq(
      ("a", "mail bob@example.com or 555-867-5309 at 10.0.0.1"),
      ("b", "nothing here")).toDF("doc_id", "text")
    val pat = s"${QualityFilters.EmailRe}|${QualityFilters.PhoneRe}|${QualityFilters.Ipv4Re}"
    val out = QualityFilters.redactionStats(df, "doc_id", "text", pat, "[PII]")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(out("a")._1 == 3)
    assert(out("a")._2 == "mail [PII] or [PII] at [PII]")
    assert(out("b") == ((0, "nothing here")))
  }

  test("decontamination finds exactly the docs overlapping the eval set") {
    val evalSet = Seq(("e1", "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      ("c1", "prefix alpha beta gamma delta epsilon zeta suffix"), // contains the eval 6-gram
      ("c2", "alpha beta gamma delta other words entirely"), // only shorter overlaps
      ("c3", "no overlap at all with anything")).toDF("doc_id", "text")
    val hit = Decontaminate.contaminated(corpus, evalSet, "doc_id", "text", n = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hit == Map("c1" -> 1L))
    val kept = Decontaminate.clean(corpus, evalSet, "doc_id", "text", n = 6)
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("c2", "c3"))
  }

  test("bloom filter has no false negatives and a sane positive rate") {
    val seen = (1 to 2000).map(i => s"seen_$i").toDF("key")
    val bloom = BloomDedup.buildBloom(seen, col("key"), 2000, 2000 * 8)
    val probeSeen = BloomDedup.definitelyNew(seen, bloom, col("key")).count()
    assert(probeSeen == 0, "a seen key must never be reported definitely-new")
    val fresh = (1 to 2000).map(i => s"new_$i").toDF("key")
    val passed = BloomDedup.definitelyNew(fresh, bloom, col("key")).count()
    assert(passed > 1800, s"fp rate should be ~2% at 8 bits/key, got ${2000 - passed} positives")
  }

  test("an empty seen-corpus bloom passes every incoming row as new") {
    val empty = spark.emptyDataset[String].toDF("key")
    val bloom = BloomDedup.buildBloom(empty, col("key"), 100, 800)
    val incoming = (1 to 50).map(i => s"doc_$i").toDF("key")
    assert(BloomDedup.definitelyNew(incoming, bloom, col("key")).count() == 50,
      "nothing was seen, so everything must be definitely-new")
  }

  test("bloom probe stays codegen-friendly (no UDF in the plan)") {
    val seen = (1 to 100).map(i => s"k$i").toDF("key")
    val bloom = BloomDedup.buildBloom(seen, col("key"), 100, 800)
    val plan = BloomDedup.definitelyNew(seen, bloom, col("key"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("lengthQuantileKeep: exact rank threshold, ties kept, histogram-not-corpus window") {
    // 10 docs, lengths 1..10 → p90 rank = ceil(0.9·10) = 9 → threshold
    // is the 9th ascending length (9); docs of length 9 and 10 survive
    val docs = (1 to 10).map(i => (i.toLong, "x" * i)).toDF("doc_id", "text")
    val kept = QualityFilters.lengthQuantileKeep(docs, "doc_id", "text", permille = 900)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((9L, 9L), (10L, 10L)), s"got $kept")
    // ties at the threshold all survive (>= semantics)
    val tied = Seq((1L, "aaa"), (2L, "bbb"), (3L, "ccc"), (4L, "d")).toDF("doc_id", "text")
    val keptTied = QualityFilters.lengthQuantileKeep(tied, "doc_id", "text", permille = 900)
      .collect().map(_.getLong(0)).toSet
    assert(keptTied == Set(1L, 2L, 3L), s"all max-length ties kept: $keptTied")
    // p50 on a known set
    val p50 = QualityFilters.lengthQuantileKeep(docs, "doc_id", "text", permille = 500)
      .collect().map(_.getLong(0)).toSet
    assert(p50 == (5L to 10L).toSet, s"p50 keeps the upper half: $p50")
  }

  test("rrf fusion: integer micro-points, cross-list consensus wins, deterministic cut") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rnk")
    val b = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("id", "rnk")
    val fused = HybridRetrieval.rrf(Seq(a, b), "id", "rnk", k0 = 60, n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // hand-computed: 1000000 div 61 = 16393, div 62 = 16129, div 63 = 15873
    val scores = fused.map(t => t._1 -> t._2).toMap
    assert(scores(10L) == 16393 + 15873)
    assert(scores(20L) == 16129 + 16393)
    assert(scores(30L) == 15873 && scores(40L) == 16129)
    // consensus docs (in both lists) outrank single-list docs
    assert(fused.take(2).map(_._1).toSet == Set(10L, 20L))
    assert(fused.map(_._3).toSeq.sorted == Seq(1L, 1L, 2L, 2L))
    // n bounds the fused list with a deterministic (score, id) cut
    val top1 = HybridRetrieval.rrf(Seq(a, b), "id", "rnk", k0 = 60, n = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(top1 == Seq(20L), "20 has the higher fused score")
  }

  test("perplexityBuckets: hand-computed thirds, value-based ties, integer milli-nats") {
    // token frequencies: aaa 12/21, bbb 6/21, ccc 3/21 → per-doc mean
    // log-probs are three distinct values; with 9 docs the ⌈n/3⌉=3 and
    // ⌈2n/3⌉=6 cuts land exactly on the group boundaries (cum 3/6/9)
    val df = Seq(
      (1L, "aaa aaa aaa aaa"), (2L, "aaa aaa aaa aaa"), (3L, "aaa aaa aaa aaa"),
      (4L, "bbb bbb"), (5L, "bbb bbb"), (6L, "bbb bbb"),
      (7L, "ccc"), (8L, "ccc"), (9L, "ccc")).toDF("doc_id", "text")
    val rows = CorpusLm.perplexityBuckets(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBucket("head") == Set(1L, 2L, 3L), byBucket.toString)
    assert(byBucket("middle") == Set(4L, 5L, 6L), byBucket.toString)
    assert(byBucket("tail") == Set(7L, 8L, 9L), byBucket.toString)
    // milli-nat scores: floor(ln(p)·1e6) / 1000 with floor semantics
    def milli(p: Double): Long = {
      val micro = math.floor(math.log(p) * 1e6).toLong
      val d = 1000L // n_tokens cancels: every token of a doc has the same lp
      (micro - (((micro % d) + d) % d)) / d
    }
    val scores = rows.map(r => r._1 -> r._2).toMap
    assert(scores(1L) == milli(12.0 / 21), s"head score ${scores(1L)}")
    assert(scores(4L) == milli(6.0 / 21), s"middle score ${scores(4L)}")
    assert(scores(7L) == milli(3.0 / 21), s"tail score ${scores(7L)}")
  }
}
