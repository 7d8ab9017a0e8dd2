package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  lazy val rows = (1 to 1000).map(i => (f"doc_$i%04d", if (i % 3 == 0) "web" else "book"))
  lazy val df = rows.toDF("doc_id", "source")

  test("bernoulli sample is deterministic and near the rate") {
    val a = Sampling.bernoulli(df, "doc_id", 0.2).collect().map(_.getString(0)).toSet
    val b = Sampling.bernoulli(df, "doc_id", 0.2).collect().map(_.getString(0)).toSet
    assert(a == b, "same input + rate must select the same rows")
    assert(a.size > 120 && a.size < 280, s"20% of 1000 should be ~200, got ${a.size}")
  }

  test("bernoulli at higher rate is a superset (nested samples)") {
    val small = Sampling.bernoulli(df, "doc_id", 0.1).collect().map(_.getString(0)).toSet
    val big = Sampling.bernoulli(df, "doc_id", 0.3).collect().map(_.getString(0)).toSet
    assert(small.subsetOf(big), "hash-threshold samples must nest as the rate grows")
  }

  test("stratified sample returns exactly n per stratum, deterministically") {
    val s1 = Sampling.stratifiedFixedN(df, "source", "doc_id", 25).collect()
    val byStratum = s1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byStratum == Map("web" -> 25, "book" -> 25))
    val s2 = Sampling.stratifiedFixedN(df, "source", "doc_id", 25)
      .collect().map(_.getString(0)).sorted
    assert(s1.map(_.getString(0)).sorted.sameElements(s2))
  }

  test("stratified sample caps at stratum size when n exceeds it") {
    val tiny = Seq(("a", "x"), ("b", "x"), ("c", "y")).toDF("doc_id", "source")
    val got = Sampling.stratifiedFixedN(tiny, "source", "doc_id", 5).count()
    assert(got == 3)
  }

  test("agg-based stratified sample is bit-identical to the window variant, window-free plan") {
    val longIds = (1L to 2000L).map(i => (i, if (i % 4 == 0) "book" else "web"))
      .toDF("doc_id", "source")
    val viaWindow = Sampling.stratifiedFixedN(longIds, "source", "doc_id", 25)
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaAgg = Sampling.stratifiedFixedNAgg(longIds, "source", "doc_id", 25)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaAgg == viaWindow, "both variants must select the same (hash, id) order")
    assert(viaAgg.count(_._2 == "web") == 25 && viaAgg.count(_._2 == "book") == 25)
    // the point of the variant: no per-stratum window in the plan —
    // partial aggregation bounds what one dominant stratum can shuffle
    val plan = Sampling.stratifiedFixedNAgg(longIds, "source", "doc_id", 25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"agg variant must not plan a window:\n${plan.take(600)}")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      "expected aggregate-based top-k")
  }

  test("agg-based stratified sample handles string ids; exotic id types rejected loudly") {
    // the fixture's ids are strings ("doc_0001") — r10's long-cast
    // nulled every one of them; now the string aggregator path must
    // match the window variant exactly
    val viaWindow = Sampling.stratifiedFixedN(df, "source", "doc_id", 25)
      .select("doc_id", "source")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaAgg = Sampling.stratifiedFixedNAgg(df, "source", "doc_id", 25)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaAgg == viaWindow, "string-id agg variant must match the window spec")
    assert(viaAgg.count(_._2 == "web") == 25 && viaAgg.count(_._2 == "book") == 25)
    // unsupported id types fail at plan time, not with null ids
    val exotic = Seq((Array(1.toByte), "x")).toDF("doc_id", "source")
    val e = intercept[IllegalArgumentException] {
      Sampling.stratifiedFixedNAgg(exotic, "source", "doc_id", 5)
    }
    assert(e.getMessage.contains("integral or string"))
  }

  test("string top-k tie-break follows Spark's UTF-8 binary order, not UTF-16") {
    // U+1F600 (surrogate pair, UTF-8 f0 9f 98 80) vs U+FFFD (UTF-8 ef
    // bf bd): Java's String '<' ranks the surrogate pair FIRST
    // (0xD83D < 0xFFFD code units) while Spark's UTF8String binary
    // order ranks it LAST (0xf0 > 0xef lead byte). The aggregator's
    // tie-break must agree with the window twin's orderBy — i.e. with
    // Spark — for the two paths to stay bit-identical.
    val supp = "😀"
    val bmp = "�"
    assert(supp.compareTo(bmp) < 0, "precondition: the two orders must disagree")
    val agg = new TopKStringAggregator(1)
    val kept = agg.finish(agg.merge(
      agg.reduce(agg.zero, ScoredStr(supp, 1.0)),
      agg.reduce(agg.zero, ScoredStr(bmp, 1.0))))
    val sparkFirst = Seq(supp, bmp).toDF("id").orderBy($"id").head().getString(0)
    assert(sparkFirst == bmp, "Spark must sort the BMP char first by UTF-8 bytes")
    assert(kept.map(_.neighbor_id) == Seq(sparkFirst),
      s"tie-break kept ${kept.map(_.neighbor_id)}, Spark order starts with $sparkFirst")
  }

  test("temperature mix allocates ~sqrt-proportional targets, integer-exact and deterministic") {
    // 900 "web" vs 100 "book": plain proportional would give 90/10; at
    // alpha=0.5 the weights are sqrt(900)=30 vs sqrt(100)=10 -> 75/25.
    val skewed = (1 to 1000).map(i => (f"doc_$i%04d", if (i <= 900) "web" else "book"))
      .toDF("doc_id", "source")
    val mixed = Sampling.temperatureMix(skewed, "source", "doc_id", totalN = 100)
    val byStratum = mixed.collect().groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(byStratum == Map("web" -> 75, "book" -> 25), byStratum.toString)
    // deterministic: the same call selects the same rows
    val again = Sampling.temperatureMix(skewed, "source", "doc_id", totalN = 100)
    assert(mixed.collect().map(_.getAs[String]("doc_id")).toSet ==
      again.collect().map(_.getAs[String]("doc_id")).toSet)
    // more sqrt applications flatten further: n^0.25 weights are
    // 5.477 vs 3.162 -> 63/36 of 100
    val flat = Sampling.temperatureMix(skewed, "source", "doc_id", 100, sqrtApplications = 2)
    val flatBy = flat.collect().groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(flatBy("web") < 70 && flatBy("book") > 30, flatBy.toString)
  }
}

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("components merge transitively across a chain") {
    // 1-2, 2-3, 3-4 is one component even though 1 and 4 never pair
    // directly; 5-6 is a second; 7 appears in no edge (absent).
    val edges = Seq(("d1", "d2"), ("d2", "d3"), ("d3", "d4"), ("d5", "d6"))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "d1" -> "d1", "d2" -> "d1", "d3" -> "d1", "d4" -> "d1",
      "d5" -> "d5", "d6" -> "d5"))
  }

  test("a long path converges within the diameter bound") {
    val chain = (1 until 15).map(i => (f"n$i%02d", f"n${i + 1}%02d")).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(chain, "id_a", "id_b").collect()
    assert(got.length == 15)
    assert(got.forall(_.getString(1) == "n01"), "every node labels to the min id")
  }

  test("edge direction does not matter") {
    val e1 = Seq(("b", "a")).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(e1, "id_a", "id_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a"))
  }

  test("convergence survives AQE dropping an inner batched round's metrics (r17)") {
    // With broadcast joins disabled the per-round join plans as a
    // shuffle join, and AQE materializes the pair-batch's INNER round
    // as an independent query stage — whose CollectMetrics can vanish
    // from the final execution's observed metrics (its Observation
    // resolves to an EMPTY map; seen live at sf0.1, where d71 threw
    // `key not found: changes` while sf0.001's broadcast-collapsed
    // plan hid it). Convergence must key off the batch's LAST
    // (plan-root) observation only; this pins the non-broadcast shape.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val chain = (1 until 40).map(i => (f"m$i%02d", f"m${i + 1}%02d"))
        .toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 64)
        .collect()
      assert(got.length == 40)
      assert(got.forall(_.getString(1) == "m01"), "every node labels to the min id")
    } finally spark.conf.set(key, prev)
  }

  test("leakageSafeSplit keeps every exact-dup group on one side, near the rate") {
    // 500 distinct texts, each duplicated once with whitespace/case noise
    // the fingerprint normalizes away — dup pairs must never straddle
    val docs = (1 to 500).flatMap { i =>
      Seq((i.toLong * 2, s"alpha beta doc $i"), (i.toLong * 2 + 1, s"  Alpha  BETA   doc $i "))
    }.toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplit(docs, "text", testPermille = 200, seed = "s")
      .select("fp", "split").collect().map(r => (r.getString(0), r.getString(1)))
    val sidesPerGroup = out.groupBy(_._1).values.map(_.map(_._2).distinct.length)
    assert(sidesPerGroup.forall(_ == 1), "a fingerprint group straddled the split")
    val testFrac = out.count(_._2 == "test").toDouble / out.length
    assert(testFrac > 0.12 && testFrac < 0.28, s"20% target, got $testFrac")
    // deterministic across reruns
    val again = Sampling.leakageSafeSplit(docs, "text", testPermille = 200, seed = "s")
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.length == 1000 && again.size == 1000)
  }

  test("groupSplit over near-dup cluster ids keeps whole clusters together") {
    // cluster ids as produced by Dedup.connectedComponents: the group
    // key IS the cluster label, so near-dups co-locate by construction
    val labeled = Seq(
      (1L, "c1"), (2L, "c1"), (3L, "c1"),
      (4L, "c4"), (5L, "c5"), (6L, "c5")).toDF("doc_id", "cluster")
    val got = Sampling.groupSplit(labeled, "cluster", testPermille = 500, seed = "s")
      .collect().map(r => (r.getString(1), r.getString(2)))
    got.groupBy(_._1).foreach { case (c, rows) =>
      assert(rows.map(_._2).distinct.length == 1, s"cluster $c straddled the split")
    }
  }
}
