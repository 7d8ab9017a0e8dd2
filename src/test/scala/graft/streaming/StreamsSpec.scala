package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.streaming.Streams.Event

final case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)
final case class StreamImage(id: Long, content: Array[Byte])
final case class StreamVec(id: Long, embedding: Seq[Float])

class StreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling windows emit closed windows in append mode") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val out = Streams.windowedCounts(ms.toDF(), "ts", "user_id", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("graft_wc").outputMode("append").start()
    try {
      ms.addData(Event(1, ts(1), 1.0), Event(1, ts(3), 2.0), Event(2, ts(4), 5.0))
      q.processAllAvailable()
      // watermark still at 10:04-5m → nothing closed yet
      assert(spark.table("graft_wc").count() == 0)
      // an event at 10:31 pushes the watermark past the 10:00-10:10 window
      ms.addData(Event(1, ts(31), 1.0))
      q.processAllAvailable()
      ms.addData(Event(2, ts(45), 1.0))
      q.processAllAvailable()
      val rows = spark.table("graft_wc").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
        .toSet
      assert(rows.contains((1L, 2L, 3.0)), s"got $rows")
      assert(rows.contains((2L, 1L, 5.0)), s"got $rows")
    } finally q.stop()
  }

  test("streaming dedup emits first arrivals and drops in-horizon re-arrivals") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    // key = user_id: value carries which arrival won
    val out = Streams.dedupStream(ms.toDF(), "ts", Seq("user_id"), "5 minutes")
    val q = out.writeStream.format("memory").queryName("graft_dedup").outputMode("append").start()
    try {
      ms.addData(Event(1, ts(1), 10.0), Event(1, ts(2), 20.0), Event(2, ts(3), 30.0))
      q.processAllAvailable()
      ms.addData(Event(1, ts(4), 40.0)) // still duplicate within horizon
      q.processAllAvailable()
      val rows = spark.table("graft_dedup").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSet
      assert(rows == Set((1L, 10.0), (2L, 30.0)), s"got $rows")
    } finally q.stop()
  }

  test("streaming as-of enrichment picks the latest dimension version at-or-before") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // Dimension timeline: user 1 priced at 10.0 from 10:02, repriced
    // 20.0 from 10:10; user 2 never priced.
    val dim = Seq(
      (1L, ts(2), 10.0, "v1"),
      (1L, ts(10), 20.0, "v2")).toDF("user_id", "valid_from", "price", "tag")
    val ms = MemoryStream[Event]
    val out = Streams.asofEnrich(ms.toDF(), dim, Seq("user_id"),
      streamTime = "ts", dimTime = "valid_from", dimCols = Seq("price", "tag"))
    val q = out.writeStream.format("memory").queryName("graft_asof").outputMode("append").start()
    try {
      ms.addData(
        Event(1, ts(1), 0.0),   // before any version → null
        Event(1, ts(2), 0.0),   // exactly at v1 → inclusive match
        Event(1, ts(5), 0.0),   // between versions → v1
        Event(1, ts(30), 0.0),  // after reprice → v2
        Event(2, ts(5), 0.0))   // keyless in dim → null
      q.processAllAvailable()
      val rows = spark.table("graft_asof").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
          Option(r.getAs[java.lang.Double]("asof_price")).map(_.doubleValue),
          Option(r.getAs[String]("asof_tag")))).toSet
      assert(rows == Set(
        (1L, ts(1), None, None),
        (1L, ts(2), Some(10.0), Some("v1")),
        (1L, ts(5), Some(10.0), Some("v1")),
        (1L, ts(30), Some(20.0), Some("v2")),
        (2L, ts(5), None, None)), s"got $rows")
    } finally q.stop()
  }

  test("streaming dedup state survives a checkpointed restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val ckpt = base.resolve("ckpt").toString
    val outDir = base.resolve("out").toString
    val ms = MemoryStream[Event]
    val out = Streams.dedupStream(ms.toDF(), "ts", Seq("user_id"), "10 minutes")
    // the memory sink cannot recover from a checkpoint; the file sink can
    def start() = out.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      ms.addData(Event(1, ts(1), 1.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint: user 1 must STILL be deduplicated —
    // if the state store were lost, its second event would re-emit
    val q2 = start()
    try {
      ms.addData(Event(1, ts(2), 2.0), Event(2, ts(3), 3.0))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSet
      assert(rows.contains((1L, 1.0)), s"first-run emission missing: $rows")
      assert(!rows.contains((1L, 2.0)),
        s"user 1 re-emitted after restart — dedup state lost: $rows")
      assert(rows.contains((2L, 3.0)), s"new key missing after restart: $rows")
    } finally q2.stop()
  }

  test("streaming corpus pipeline matches the batch gate→dedup→decontaminate twin") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.shingles
    import graft.operators.{BloomDedup, Dedup, QualityFilters}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // eval benchmark: one doc whose 4-grams contaminate part of the corpus
    val evalSet = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val goodA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val goodB = "solar wind carries charged particles far beyond planetary orbits today"
    val contaminated = "we note the quick brown fox jumps over and keeps running onward"
    val tooShort = "tiny doc"
    val repetitive = Seq.fill(12)("spam").mkString(" ")
    val docs = Seq(
      StreamDoc(1, ts(1), goodA),
      StreamDoc(2, ts(2), goodB),
      StreamDoc(3, ts(3), goodA), // exact dup of doc 1 → dropped
      StreamDoc(4, ts(4), contaminated), // shares 4-grams with eval → dropped
      StreamDoc(5, ts(5), tooShort), // fails min-token gate
      StreamDoc(6, ts(6), repetitive)) // fails ttr/repetition gate

    val ms = MemoryStream[StreamDoc]
    val out = Streams.corpusPipeline(ms.toDF(), evalSet,
      "text", "ts", "10 minutes", minTokens = 10, minTtr = 0.3, maxTokenFrac = 0.2)
    val q = out.writeStream.format("memory").queryName("graft_cp")
      .outputMode("append").start()
    val streamed =
      try {
        ms.addData(docs.take(3): _*)
        q.processAllAvailable()
        ms.addData(docs.drop(3): _*)
        q.processAllAvailable()
        spark.table("graft_cp").collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet
      } finally q.stop()

    // batch twin: same decisions via the batch operators (bloom probe
    // included, so bloom false positives — if any — hit both sides)
    val batch = docs.toDF()
    val gated = batch.filter(
      QualityFilters.gatePredicate(col("text"), 10, 0.3, 0.2))
    val deduped = Dedup.exactKeep(gated, "doc_id", "text")
    val evalGrams = evalSet.select(
      explode(array_distinct(shingles(col("text"), 4))).as("gram"))
    val bloom = BloomDedup.buildBloom(evalGrams, col("gram"), 1L << 18, 1L << 22)
    val batchSurvivors = deduped.filter(
      !exists(array_distinct(shingles(col("text"), 4)),
        g => BloomDedup.mightContain(bloom, g)))
      .select("doc_id", "text").as[(Long, String)].collect().toSet

    // first-arrival (stream) vs min-id (batch) keeper coincide here
    assert(streamed == batchSurvivors, s"stream=$streamed batch=$batchSurvivors")
    assert(streamed.map(_._1) == Set(1L, 2L), streamed)
  }

  test("stateful sessionization closes sessions on gap and on silence") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val out = Streams.sessionize(ms.toDS(), gapSeconds = 120, lateness = "1 minute")
    val q = out.writeStream.format("memory").queryName("graft_sess").outputMode("append").start()
    try {
      // user 1: two events 1 min apart (one session), then a 10-min gap
      ms.addData(Event(1, ts(1), 0), Event(1, ts(2), 0))
      q.processAllAvailable()
      ms.addData(Event(1, ts(12), 0)) // new session; watermark moves to 10:11
      q.processAllAvailable()
      ms.addData(Event(2, ts(30), 0)) // silence for user 1 → timeout fires
      q.processAllAvailable()
      val sessions = spark.table("graft_sess").as[Streams.SessionOut].collect()
      val u1 = sessions.filter(_.user_id == 1)
      assert(u1.exists(s => s.n_events == 2 && s.session_start == ts(1) && s.session_end == ts(2)),
        s"got ${u1.mkString(", ")}")
      assert(u1.exists(s => s.n_events == 1 && s.session_start == ts(12)),
        s"timeout-closed session missing: ${u1.mkString(", ")}")
    } finally q.stop()
  }

  test("streaming LM gate matches the batch unigram gate under the same model") {
    import org.apache.spark.sql.functions._
    import graft.operators.CorpusLm
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val corpus = Seq(
      StreamDoc(1, ts(1), "the cat sat on the mat"),
      StreamDoc(2, ts(2), "the dog sat on the rug"),
      StreamDoc(3, ts(3), "cat dog mat rug the the"),
      StreamDoc(4, ts(4), "emu ibex yak kiwi lynx oryx")) // singletons → low mean lp
    val corpusDf = corpus.toDF()
    val floor = -2400000L // between common-token and rare-token means

    // model trained offline on the batch corpus
    val (model, oov) = CorpusLm.unigramModel(corpusDf, "text")

    // batch twin decides keep with the same floor
    val batchKeep = CorpusLm.unigramLogProb(corpusDf, "doc_id", "text", floor)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet

    // stream the corpus plus one all-OOV doc through the map-side gate
    val ms = MemoryStream[StreamDoc]
    val out = Streams.lmGateStream(ms.toDF(), "text", model, oov, floor)
    val q = out.writeStream.format("memory").queryName("graft_lm")
      .outputMode("append").start()
    val streamedKeep =
      try {
        ms.addData(corpus :+ StreamDoc(9, ts(9), "qqq zzz yyy"): _*)
        q.processAllAvailable()
        spark.table("graft_lm").collect().map(_.getAs[Long]("doc_id")).toSet
      } finally q.stop()

    assert(streamedKeep == batchKeep, s"stream $streamedKeep vs batch $batchKeep")
    assert(batchKeep.nonEmpty && !batchKeep.contains(4L), "floor should split the corpus")
    assert(!streamedKeep.contains(9L), "all-OOV doc must fail the gate")
  }

  test("streaming length gate matches the batch d50 quantile gate on the same corpus") {
    import graft.operators.QualityFilters
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val corpus = (1 to 10).map(i => StreamDoc(i.toLong, ts(i), "x" * i))
    val corpusDf = corpus.toDF()
    // threshold computed OFFLINE (exact p70 rank), then the stream is
    // gated map-side — no state, no shuffle, batch-equal decisions
    val thr = QualityFilters.lengthQuantileThreshold(corpusDf, "doc_id", "text", permille = 700)
    val batchKeep = QualityFilters.lengthQuantileKeep(corpusDf, "doc_id", "text", permille = 700)
      .collect().map(_.getLong(0)).toSet

    val ms = MemoryStream[StreamDoc]
    val out = Streams.lengthGateStream(ms.toDF(), "text", thr)
    val q = out.writeStream.format("memory").queryName("graft_lengate")
      .outputMode("append").start()
    val streamedKeep =
      try {
        ms.addData(corpus.take(5): _*)
        q.processAllAvailable()
        ms.addData(corpus.drop(5): _*) // second batch: same artifact, no recompute
        q.processAllAvailable()
        spark.table("graft_lengate").collect().map(_.getAs[Long]("doc_id")).toSet
      } finally q.stop()
    assert(streamedKeep == batchKeep, s"stream $streamedKeep vs batch $batchKeep")
    assert(batchKeep == (7L to 10L).toSet, s"p70 of 1..10 keeps lengths 7..10: $batchKeep")
  }

  test("streaming bigram gate matches the batch d44 gate under the same model") {
    import org.apache.spark.sql.functions._
    import graft.operators.CorpusLm
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val corpus = Seq(
      StreamDoc(1, ts(1), "the cat sat on the mat"),
      StreamDoc(2, ts(2), "the cat sat on the rug"),
      StreamDoc(3, ts(3), "rug the on sat cat the"), // scrambled → rare pairs
      StreamDoc(4, ts(4), "solo")) // no pairs → vacuous keep
    val corpusDf = corpus.toDF()
    val floor = -1200000L

    // model trained offline on the batch corpus; small vocab → every
    // corpus bigram is in-model, so streaming == batch exactly
    val (model, oov) = CorpusLm.bigramModel(corpusDf, "text")

    val batch = CorpusLm.bigramLogProb(corpusDf, "doc_id", "text", floor)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    val batchKeep = batch.filter(_._2._2).keySet

    val ms = MemoryStream[StreamDoc]
    val out = Streams.bigramGateStream(ms.toDF(), "text", model, oov, floor)
    val q = out.writeStream.format("memory").queryName("graft_bigram")
      .outputMode("append").start()
    val streamed =
      try {
        // plus one doc whose pairs are all OOV — must gate on oov lp
        ms.addData(corpus :+ StreamDoc(9, ts(9), "qqq zzz yyy"): _*)
        q.processAllAvailable()
        spark.table("graft_bigram")
          .collect().map(r => r.getAs[Long]("doc_id") ->
            r.getAs[Long]("sum_lp_micro")).toMap
      } finally q.stop()

    assert(streamed.keySet.intersect(corpus.map(_.doc_id.toLong).toSet) == batchKeep,
      s"streamed ${streamed.keySet} vs batch $batchKeep")
    // scores, not just decisions, match the batch twin
    batchKeep.foreach(id =>
      assert(streamed(id) == batch(id)._1, s"doc $id score mismatch"))
    assert(!streamed.contains(9L), "all-OOV doc must fail the gate")
  }

  test("streaming source-drift KL matches the batch d53 statistic after each prefix") {
    import graft.operators.CorpusLm
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val batch1 = Seq(("a", "x x y"), ("b", "x z"))
    val batch2 = Seq(("a", "y y"), ("b", "z z z x")) // b's mix shifts → KL moves
    def batchKl(rows: Seq[(String, String)]) =
      CorpusLm.sourceDriftKl(rows.toDF("source", "text"), "source", "text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val ms = MemoryStream[(String, String)]
    @volatile var latest: Set[(String, Long, Long)] = Set.empty
    val q = Streams.sourceDriftStream(
      ms.toDF().toDF("source", "text"), "source", "text") { (out, _) =>
      latest = out.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    try {
      ms.addData(batch1: _*)
      q.processAllAvailable()
      assert(latest == batchKl(batch1),
        s"prefix-1 drift must equal the batch statistic: $latest")
      ms.addData(batch2: _*)
      q.processAllAvailable()
      assert(latest == batchKl(batch1 ++ batch2),
        s"full-stream drift must equal the batch statistic: $latest")
    } finally q.stop()
  }

  test("streaming Zipf slope matches the batch d57 statistic after each prefix") {
    import graft.operators.CorpusLm
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // batch2 stuffs source b with one token — its slope must move
    val batch1 = Seq(("a", "x x y z"), ("b", "x z y"))
    val batch2 = Seq(("a", "y y x"), ("b", "z z z z z z"))
    def batchSlope(rows: Seq[(String, String)]) =
      CorpusLm.zipfSlope(rows.toDF("source", "text"), "source", "text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    val ms = MemoryStream[(String, String)]
    @volatile var latest: Set[(String, Long, Double)] = Set.empty
    val q = Streams.zipfSlopeStream(
      ms.toDF().toDF("source", "text"), "source", "text") { (out, _) =>
      latest = out.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    }
    try {
      ms.addData(batch1: _*)
      q.processAllAvailable()
      assert(latest == batchSlope(batch1),
        s"prefix-1 slope must equal the batch statistic: $latest")
      ms.addData(batch2: _*)
      q.processAllAvailable()
      assert(latest == batchSlope(batch1 ++ batch2),
        s"full-stream slope must equal the batch statistic: $latest")
      assert(latest != batchSlope(batch1),
        "the stuffed batch must move the statistic or the pin is vacuous")
    } finally q.stop()
  }

  test("streaming near-dup gate matches the batch band-collision twin") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val d = Tables(spark, F.sfDir).documents
    val corpus = d.filter(col("doc_id") % 10 =!= 0)
    val probes = d.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // the build-once index (a production run persists this to parquet)
    val index = Dedup.bandIndexOf(corpus, "doc_id", "text").cache()

    val batchTwin = Dedup.bandCollisions(
        probes.toSeq.toDF("doc_id", "text"), "doc_id", "text", index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ms = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long, Long)]()
    val q = Streams.nearDupGateStream(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", index) { (out, _) =>
      out.collect().foreach(r => got.add((r.getLong(0), r.getLong(1), r.getLong(2))))
    }
    try {
      val (first, second) = probes.splitAt(probes.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == batchTwin,
      s"stream ${got.size()} rows vs batch ${batchTwin.size}")
    assert(batchTwin.nonEmpty, "fixture must produce at least one collision")
    index.unpersist()
  }

  test("streaming sliding distinct equals the batch dedupe-then-explode on closed hours") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def at(h: Int, m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1 appears twice in hour 10 (dedup must keep one), user 2
    // spans hours, user 3 appears once — plus a far-future sentinel to
    // close every real hour's watermark
    val evs = Seq(
      Event(1, at(10, 5), 1.0), Event(1, at(10, 40), 1.0),
      Event(2, at(10, 15), 1.0), Event(2, at(11, 20), 1.0),
      Event(3, at(12, 30), 1.0),
      Event(99, at(23, 50), 1.0))

    val ms = MemoryStream[Event]
    val out = Streams.slidingDistinctStream(ms.toDF(), "ts", "user_id",
      windowHours = 3, latenessMinutes = 10)
    val q = out.writeStream.format("memory").queryName("graft_sd")
      .outputMode("append").start()
    val streamed =
      try {
        ms.addData(evs.take(3): _*)
        q.processAllAvailable()
        ms.addData(evs.drop(3): _*)
        q.processAllAvailable()
        spark.table("graft_sd").collect()
          .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      } finally q.stop()

    // batch twin: q42's dedupe-then-explode-then-distinct shape
    val batch = evs.toDF()
      .select(date_trunc("hour", col("ts")).as("h"), col("user_id")).distinct()
      .select(explode(sequence(lit(0), lit(2))).as("k"), col("h"), col("user_id"))
      .select(expr("timestampadd(HOUR, k, h)").as("h"), col("user_id"))
      .distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("active"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap

    assert(streamed.nonEmpty, "watermark sentinel must close the real hours")
    streamed.foreach { case (h, n) =>
      assert(batch.get(h).contains(n), s"hour $h: stream=$n batch=${batch.get(h)}")
    }
    // hour 10: users 1 (deduped double arrival) and 2 → 2 distinct
    assert(streamed.get(at(10, 0)).contains(2L), streamed)
    // hour 12: users 1, 2 (from hours 10/11, counted ONCE) and 3 → 3
    assert(streamed.get(at(12, 0)).contains(3L), streamed)
  }

  test("streaming gram-novelty gate equals the batch novelty on id-ordered arrival") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val path = java.nio.file.Files.createTempDirectory("graft_grams").toString
    Dedup.buildGramIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", path)

    val docs = Seq(
      StreamDoc(1, ts(1), "a b c d"),      // both grams novel
      StreamDoc(2, ts(2), "a b c x"),      // "a b c" seen via doc 1
      StreamDoc(3, ts(3), "a b c d"),      // exact dup of doc 1 → 0 novel
      StreamDoc(4, ts(4), "p q r s t"))    // all novel

    val got = scala.collection.concurrent.TrieMap.empty[Long, (Long, Long, Double)]
    val ms = MemoryStream[StreamDoc]
    val q = Streams.gramNoveltyStream(ms.toDF(), "doc_id", "text", path) { (out, _) =>
      out.collect().foreach(r =>
        got(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getDouble(3)))
    }
    try {
      ms.addData(docs.take(2): _*)
      q.processAllAvailable()
      ms.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    // batch twin over the full corpus (arrival order == id order here)
    val batch = Dedup.gramNovelty(
      docs.toDF().select(col("doc_id"), col("text")), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.toMap == batch, s"stream $got vs batch $batch")
    // cross-batch memory: doc 3 (batch 2) is fully covered by doc 1 (batch 1)
    assert(got(3L)._2 == 0L)

    // a replayed batch id neither re-scores nor re-appends
    var replayed = 0
    Streams.applyGramNoveltyBatch(
      docs.take(2).toDF().select(col("doc_id"), col("text")),
      batchId = 0, path, "doc_id", "text") { (_, _) => replayed += 1 }
    assert(replayed == 0, "replay must not reach the sink")
    // and the index is unchanged: re-scoring doc 1's grams finds nothing new
    val again = Dedup.scoreAndIngestGrams(
      Seq((9L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text", path)
      .head()
    assert(again.getLong(2) == 0L, "every gram must already be in the index")
  }

  test("streaming gramian maintenance equals the batch v36 statistics at any split") {
    import org.apache.spark.sql.functions._
    import graft.operators.RollupIndex
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val path = java.nio.file.Files.createTempDirectory("graft_gram").toString
    RollupIndex.build(
      Seq.empty[(Int, Int, Long, Long)].toDF("i", "j", "n", "sum_qprod"),
      path, keyCols = Seq("i", "j"))

    val emb = Tables(spark, F.sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])].collect()

    val ms = MemoryStream[(Long, Array[Float])]
    val q = Streams.gramianAppendStream(
      ms.toDF().toDF("vec_id", "embedding"), "embedding", dim = 64, path)
    try {
      ms.addData(emb.take(emb.length / 3).toSeq: _*)
      q.processAllAvailable()
      ms.addData(emb.drop(emb.length / 3).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val merged = RollupIndex.open(spark, path).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val batchTwin = graft.operators.Gramian.increments(
      emb.toSeq.toDF("vec_id", "embedding"), "embedding", 64).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(merged.size == 64 * 65 / 2)
    assert(merged == batchTwin,
      "integer micro-products must merge exactly at any batch split")
  }

  test("streaming rollup maintenance: merged artifact equals the batch rollup, replays merge once") {
    import org.apache.spark.sql.functions._
    import graft.operators.RollupIndex
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val path = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    // start from an EMPTY rollup of the target schema
    RollupIndex.build(
      Seq.empty[(String, Timestamp, Long)].toDF("event_type", "hour", "n"),
      path, keyCols = Seq("event_type", "hour"))

    val evs = Seq(
      ("click", ts(1)), ("click", ts(2)), ("view", ts(5)),
      ("click", ts(31)), ("view", ts(32)), ("view", ts(33)))
      .map { case (t, time) => (t, time, 1.0) }

    val ms = MemoryStream[(String, Timestamp, Double)]
    val q = Streams.hourlyRollupAppendStream(
      ms.toDF().toDF("event_type", "ts", "value"), "event_type", "ts", path)
    try {
      ms.addData(evs.take(3): _*)
      q.processAllAvailable()
      ms.addData(evs.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    def snapshot(): Map[(String, Timestamp), Long] =
      RollupIndex.open(spark, path).collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getLong(2)).toMap

    val expected = evs.toDF("event_type", "ts", "value")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1)) -> r.getLong(2)).toMap
    assert(snapshot() == expected, s"got ${snapshot()} want $expected")

    // a replayed delivery of an already-applied batch id merges nothing
    Streams.applyRollupBatch(
      evs.take(3).toDF("event_type", "ts", "value"), batchId = 0, path) { b =>
      b.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
    }
    assert(snapshot() == expected, "replay must be a no-op")

    // a genuinely new batch id merges exactly once
    Streams.applyRollupBatch(
      Seq(("click", ts(7), 1.0)).toDF("event_type", "ts", "value"),
      batchId = 99, path) { b =>
      b.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
    }
    val after = snapshot()
    assert(after(("click", Timestamp.valueOf("2024-01-01 10:00:00"))) ==
      expected(("click", Timestamp.valueOf("2024-01-01 10:00:00"))) + 1)

    // versioned swap hygiene: at most the current and previous versions remain
    val dirs = new java.io.File(path).listFiles()
      .map(_.getName).filter(n => n == "agg" || n.startsWith("agg_v"))
    assert(dirs.length <= 2, dirs.mkString(", "))

    // the replay marker is INSIDE the meta row (atomic with the merge),
    // not a separate marker file whose write could race a crash
    assert(RollupIndex.lastApplied(spark, path, "default").contains(99L))
    assert(!new java.io.File(path, "_applied").exists,
      "rollup replays must not use the band-index marker-file window")
  }

  test("seasonal anomaly read off the maintained hourly rollup equals batch q46") {
    import org.apache.spark.sql.functions._
    import graft.operators.RollupIndex
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val path = java.nio.file.Files.createTempDirectory("graft_seasonal").toString
    RollupIndex.build(
      Seq.empty[(String, Timestamp, Long)].toDF("event_type", "hour", "n"),
      path, keyCols = Seq("event_type", "hour"))

    val evs = Tables(spark, F.sfDir).events
      .select(col("event_type"), col("ts"))
      .as[(String, Timestamp)].collect()

    val ms = MemoryStream[(String, Timestamp)]
    val q = Streams.hourlyRollupAppendStream(
      ms.toDF().toDF("event_type", "ts"), "event_type", "ts", path)
    try {
      val (first, second) = evs.splitAt(evs.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5))).toSet
    val got = rows(Streams.seasonalAnomalyFromRollup(spark, path))
    val want = rows(graft.queries.RelationalQueries
      .queries("q46_seasonal_anomaly")(spark, F.sfDir))
    assert(got == want,
      "anomaly flags over the maintained rollup must equal batch q46")
    assert(got.nonEmpty && got.exists(t => t._5 || t._6),
      "fixture must exercise at least one spike/dip flag")
  }

  test("transition matrix read off the maintained rollup equals batch q47 across a two-batch split") {
    import org.apache.spark.sql.functions._
    import graft.operators.RollupIndex
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val path = java.nio.file.Files.createTempDirectory("graft_trans").toString
    RollupIndex.build(
      Seq.empty[(String, String, Long)].toDF("prev_type", "next_type", "n_steps"),
      path, keyCols = Seq("prev_type", "next_type"))

    // global (ts, event_id) order preserves every user's order, so an
    // arbitrary midpoint split lands mid-journey for many users — the
    // boundary transitions the last-event snapshot must carry
    val evs = Tables(spark, F.sfDir).events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .as[(Long, Timestamp, Long, String)].collect()
    val (first, second) = evs.splitAt(evs.length / 2)

    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val q = Streams.transitionAppendStream(
      ms.toDF().toDF("user_id", "ts", "event_id", "event_type"), path)
    try {
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val got = rows(Streams.transitionMatrixFromRollup(spark, path))
    val want = rows(graft.queries.RelationalQueries
      .queries("q47_transition_matrix")(spark, F.sfDir))
    assert(got == want,
      s"stream-maintained shares must equal batch q47 (missing: ${(want -- got).take(3)}, extra: ${(got -- want).take(3)})")
    assert(got.nonEmpty)

    // a replayed delivery of the last batch id merges nothing
    Streams.applyTransitionBatch(
      second.toSeq.toDF("user_id", "ts", "event_id", "event_type"),
      batchId = 1, path)
    assert(rows(Streams.transitionMatrixFromRollup(spark, path)) == want,
      "replay must be a no-op")
    // snapshot hygiene: at most two last_v generations remain
    val snaps = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("last_v"))
    assert(snaps.length <= 2, snaps.mkString(", "))
  }

  test("retention cohorts read off the maintained weekly rollup equal batch q48 at any split") {
    import org.apache.spark.sql.functions._
    import graft.operators.RollupIndex
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val path = java.nio.file.Files.createTempDirectory("graft_weekly").toString
    RollupIndex.build(
      Seq.empty[(Long, Timestamp, Long)].toDF("user_id", "week", "n"),
      path, keyCols = Seq("user_id", "week"))

    val evs = Tables(spark, F.sfDir).events
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect()
    val (first, second) = evs.splitAt(evs.length / 3)

    val ms = MemoryStream[(Long, Timestamp)]
    val q = Streams.weeklyActivityAppendStream(
      ms.toDF().toDF("user_id", "ts"), "user_id", "ts", path)
    try {
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = rows(Streams.retentionFromRollup(spark, path))
    val want = rows(graft.queries.RelationalQueries
      .queries("q48_retention_cohorts")(spark, F.sfDir))
    assert(got == want, s"rollup-read cohorts must equal batch q48 " +
      s"(missing: ${(want -- got).take(3)}, extra: ${(got -- want).take(3)})")
    assert(got.nonEmpty)

    // the churn decomposition is ONE MORE CONSUMER of the same rollup:
    // rollup-derived weekly active/new/churn == batch q50 at this split
    def churnRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val gotChurn = churnRows(Streams.weeklyChurnFromRollup(spark, path))
    val wantChurn = churnRows(graft.queries.RelationalQueries
      .queries("q50_weekly_churn")(spark, F.sfDir))
    assert(gotChurn == wantChurn, s"rollup-read churn must equal batch q50 " +
      s"(missing: ${(wantChurn -- gotChurn).take(3)}, extra: ${(gotChurn -- wantChurn).take(3)})")
    assert(gotChurn.nonEmpty)
  }

  test("stickiness read off the maintained daily rollup equals batch q58 at any split") {
    import org.apache.spark.sql.functions._
    import graft.operators.RollupIndex
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val path = java.nio.file.Files.createTempDirectory("graft_daily").toString
    RollupIndex.build(
      Seq.empty[(Long, Timestamp, Long)].toDF("user_id", "day", "n"),
      path, keyCols = Seq("user_id", "day"))

    val evs = Tables(spark, F.sfDir).events
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect()
    val (first, second) = evs.splitAt(evs.length / 3)

    val ms = MemoryStream[(Long, Timestamp)]
    val q = Streams.dailyActivityAppendStream(
      ms.toDF().toDF("user_id", "ts"), "user_id", "ts", path)
    try {
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val got = rows(Streams.stickinessFromRollup(spark, path))
    val want = rows(graft.queries.RelationalQueries
      .queries("q58_stickiness")(spark, F.sfDir))
    assert(got == want, s"rollup-read stickiness must equal batch q58 " +
      s"(missing: ${(want -- got).take(3)}, extra: ${(got -- want).take(3)})")
    assert(got.nonEmpty)
  }

  test("value percentiles read off the maintained histogram rollup equal batch q55 at any split") {
    import org.apache.spark.sql.functions._
    import graft.operators.RollupIndex
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val path = java.nio.file.Files.createTempDirectory("graft_vhist").toString
    RollupIndex.build(
      Seq.empty[(String, Long, Long)].toDF("event_type", "v_cents", "n"),
      path, keyCols = Seq("event_type", "v_cents"))

    val evs = Tables(spark, F.sfDir).events
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    val (first, second) = evs.splitAt(evs.length / 3)

    val ms = MemoryStream[(String, Double)]
    val q = Streams.valueHistogramAppendStream(
      ms.toDF().toDF("event_type", "value"), "event_type", "value", path)
    try {
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val got = rows(Streams.percentilesFromRollup(spark, path))
    val want = rows(graft.queries.RelationalQueries
      .queries("q55_value_percentiles")(spark, F.sfDir))
    assert(got == want, s"rollup-read percentiles must equal batch q55 " +
      s"(missing: ${(want -- got).take(3)}, extra: ${(got -- want).take(3)})")
    assert(got.nonEmpty)
  }

  test("streaming phash gate flags exactly the batch matches against a static corpus") {
    import graft.operators.Multimodal
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def doc(seed: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(k => ((seed * 53 + k * 17) % 251).toByte)
    // corpus: three known images, fingerprinted once (the static index)
    val corpusImgs = Seq(
      (100L, Multimodal.synthBmp(doc(1, 140))),
      (101L, Multimodal.synthBmp(doc(2, 90))),
      (102L, Multimodal.synthBmp(doc(3, 220)))).toDF("id", "content")
    val corpusHashes = Multimodal.decodeBmpToAHash(corpusImgs, "id", "content")
      .persist()
    corpusHashes.count()

    // stream: a near-dup of corpus 100 (same prefix, extra tail), an
    // exact copy of 102, and a novel image
    val probes = Seq(
      StreamImage(1, Multimodal.synthBmp(doc(1, 140) ++ "tail".getBytes)),
      StreamImage(2, Multimodal.synthBmp(doc(3, 220))),
      StreamImage(3, Multimodal.synthBmp(doc(9, 150))))

    val got = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, Long, Int), java.lang.Boolean]())
    val ms = MemoryStream[StreamImage]
    val q = Streams.phashGateStream(
      ms.toDF(), "id", "content", corpusHashes) { (out, _) =>
      out.collect().foreach(r => got.add((r.getLong(0), r.getLong(1), r.getInt(2))))
    }
    try {
      ms.addData(probes.take(2): _*)
      q.processAllAvailable()
      ms.addData(probes.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val batchTwin = Multimodal.phashMatches(
      Multimodal.decodeBmpToAHash(probes.toDF("id", "content"), "id", "content"),
      corpusHashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == batchTwin)
    // the prefix near-dup and the exact copy are flagged; flag sets per probe
    val flagged = batchTwin.map(_._1)
    assert(flagged.contains(1L) && flagged.contains(2L))
    assert(batchTwin.contains((2L, 102L, 0)), "exact copy matches at Hamming 0")
    assert(!flagged.contains(3L), "novel image passes the gate")
    corpusHashes.unpersist()
  }

  test("streaming semdedup gate flags exactly the batch matches against the assigned corpus") {
    import org.apache.spark.sql.functions._
    import graft.operators.IvfIndex
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val corpus = Tables(spark, F.sfDir).embeddings.filter(col("vec_id") < 200)
    val cents = IvfIndex.train(corpus, "vec_id", "embedding", nLists = 4)
    val assigned = IvfIndex.assignLists(corpus, "vec_id", "embedding", cents).persist()
    assigned.count()

    // probes: exact copies of two corpus vectors (cosine ≈ 1 → flagged
    // at τ=0.99) and a vector orthogonal-ish to everything (novel)
    val byId = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val probes = Seq(
      StreamVec(1L, byId(5L)),
      StreamVec(2L, byId(150L)),
      StreamVec(3L, Seq.tabulate(byId(5L).length)(i => if (i % 2 == 0) 1.0f else -1.0f)))
    val tau = 990000L

    val got = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, Long, Long), java.lang.Boolean]())
    val ms = MemoryStream[StreamVec]
    val q = Streams.semdedupGateStream(
      ms.toDF(), "id", "embedding", assigned, cents, tau) { (out, _) =>
      out.collect().foreach(r => got.add((r.getLong(0), r.getLong(1), r.getLong(2))))
    }
    try {
      ms.addData(probes.take(2): _*)
      q.processAllAvailable()
      ms.addData(probes.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val batchTwin = IvfIndex.semdedupMatches(
      probes.toDF(), "id", "embedding", assigned, cents, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == batchTwin,
      s"stream flags must equal the batch twin (missing: ${(batchTwin -- got.asScala).take(3)}, " +
        s"extra: ${(got.asScala.toSet -- batchTwin).take(3)})")
    val flagged = batchTwin.map(_._1)
    assert(batchTwin.exists(t => t._1 == 1L && t._2 == 5L),
      s"exact copy of corpus 5 must flag: $batchTwin")
    assert(batchTwin.exists(t => t._1 == 2L && t._2 == 150L),
      s"exact copy of corpus 150 must flag: $batchTwin")
    assert(!flagged.contains(3L), s"the novel vector passes the gate: $batchTwin")
    assigned.unpersist()
  }

  test("streaming fuzzy entity gate flags exactly the batch matches against the corpus") {
    import org.apache.spark.sql.functions._
    import graft.operators.FuzzyMatch
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val corpus = Tables(spark, F.sfDir).part
      .select(col("p_partkey"), col("p_name")).persist()
    corpus.count()

    // probes: an exact copy of a corpus name that carries a RARE token
    // (common-token-only names are blocked out by design — the d70
    // recall bound), a one-edit variant, and a novel name
    val ctoks = corpus.select(col("p_name"),
      explode(split(col("p_name"), " ")).as("tok"))
    val rareToks = ctoks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= 25).select(col("tok"))
    val someName = ctoks.join(rareToks, Seq("tok"))
      .orderBy(col("p_name")).select(col("p_name")).head().getString(0)
    val probes = Seq(
      (1001L, someName),
      (1002L, someName.dropRight(1) + "x"),
      (1003L, "zzzz qqqq"))

    val got = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, Long, Long), java.lang.Boolean]())
    val ms = MemoryStream[(Long, String)]
    val q = Streams.fuzzyGateStream(
      ms.toDF().toDF("p_partkey", "p_name"), "p_partkey", "p_name", corpus) {
      (out, _) =>
        out.collect().foreach(r => got.add((r.getLong(0), r.getLong(1), r.getLong(2))))
    }
    try {
      ms.addData(probes.take(2): _*)
      q.processAllAvailable()
      ms.addData(probes.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val batchTwin = FuzzyMatch.matchesAgainst(
      probes.toDF("p_partkey", "p_name"), corpus, "p_partkey", "p_name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == batchTwin,
      s"stream flags must equal the batch twin (missing: ${(batchTwin -- got.asScala).take(3)}, " +
        s"extra: ${(got.asScala.toSet -- batchTwin).take(3)})")
    assert(batchTwin.exists(t => t._1 == 1001L && t._3 == 0L),
      s"exact corpus name must flag at dist 0: $batchTwin")
    assert(!batchTwin.map(_._1).contains(1003L),
      s"the novel name passes the gate: $batchTwin")
    corpus.unpersist()
  }

  test("streaming funnel state machine matches the batch q32 funnel counts") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Streams.{FunnelAdvance, TypedEvent}
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val batch = graft.queries.RelationalQueries.queries("q32_funnel")(spark, F.sfDir)
      .head()
    val expected = Seq(batch.getLong(0), batch.getLong(1), batch.getLong(2))

    val evs = Tables(spark, F.sfDir).events
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[TypedEvent].collect().sortBy(_.ts.getTime)

    val ms = MemoryStream[TypedEvent]
    val out = Streams.funnelStream(ms.toDS(), Seq("view", "click", "purchase"))
    val q = out.writeStream.format("memory").queryName("graft_funnel")
      .outputMode("append").start()
    val advances =
      try {
        val (first, second) = evs.splitAt(evs.length / 2)
        ms.addData(first.toSeq: _*)
        q.processAllAvailable()
        ms.addData(second.toSeq: _*)
        q.processAllAvailable()
        spark.table("graft_funnel").as[FunnelAdvance].collect()
      } finally q.stop()

    // one advance per user per stage, users counted per reached stage
    val byStage = (0 to 2).map(st => advances.count(_.stage == st).toLong)
    assert(byStage == expected, s"stream $byStage vs batch $expected")
    assert(advances.groupBy(a => (a.user_id, a.stage)).forall(_._2.length == 1),
      "a user advances each stage at most once")
  }

  test("streaming attribution credits equal the batch q56 matrix across a two-batch split") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Streams.{AttrEvent, AttrOut}
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // deliver every relevant event in (ts, event_id) order so the
    // split is a pure time cut — the regime where online == batch
    val evs = Tables(spark, F.sfDir).events
      .filter(col("event_type").isin("view", "click", "signup", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("value"))
      .as[AttrEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (first, second) = evs.splitAt(evs.length / 2)

    val ms = MemoryStream[AttrEvent]
    val out = Streams.attributionStream(ms.toDS())
    val q = out.writeStream.format("memory").queryName("graft_attr")
      .outputMode("append").start()
    val credits =
      try {
        ms.addData(first.toSeq: _*)
        q.processAllAvailable()
        ms.addData(second.toSeq: _*)
        q.processAllAvailable()
        spark.table("graft_attr").as[AttrOut].collect()
      } finally q.stop()

    val got = credits.groupBy(c => (c.first_touch, c.last_touch))
      .map { case (k, v) => (k._1, k._2, v.length.toLong, v.map(_.v_cents).sum) }
      .toSet
    val want = graft.queries.RelationalQueries
      .queries("q56_attribution")(spark, F.sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want, s"stream credits must equal batch q56 " +
      s"(missing: ${(want -- got).take(3)}, extra: ${(got -- want).take(3)})")
    assert(credits.map(_.event_id).distinct.length == credits.length,
      "each purchase is credited exactly once")
    assert(got.nonEmpty)
  }

  test("funnel recovers a cross-batch out-of-order advance via the pending buffer") {
    import graft.streaming.Streams.{FunnelAdvance, TypedEvent}
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ev(u: Long, t: Long, et: String) =
      TypedEvent(u, new java.sql.Timestamp(t), et)

    val ms = MemoryStream[TypedEvent]
    val out = Streams.funnelStream(ms.toDS(), Seq("view", "click", "purchase"))
    val q = out.writeStream.format("memory").queryName("graft_funnel_ooo")
      .outputMode("append").start()
    val advances =
      try {
        // batch 1 delivers the click and purchase BEFORE the view that
        // (in event time) precedes them arrives in batch 2
        ms.addData(ev(1L, 2000, "click"), ev(1L, 3000, "purchase"))
        q.processAllAvailable()
        ms.addData(ev(1L, 1000, "view"))
        q.processAllAvailable()
        spark.table("graft_funnel_ooo").as[FunnelAdvance].collect()
      } finally q.stop()

    // all three advances recovered, in stage order with increasing ts
    assert(advances.map(_.stage).sorted.toSeq == Seq(0, 1, 2),
      s"expected full recovery, got ${advances.toSeq}")
    val byStage = advances.sortBy(_.stage).map(_.ts.getTime).toSeq
    assert(byStage == Seq(1000L, 2000L, 3000L))
  }

  test("streaming ANN probe against a persisted index matches the batch probe") {
    import org.apache.spark.sql.functions._
    import graft.operators.IvfPqIndex
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val emb = Tables(spark, F.sfDir).embeddings
    val path = java.nio.file.Files.createTempDirectory("graft-stream-ann").toString
    IvfPqIndex.buildIndex(emb, "vec_id", "embedding", path,
      dim = 64, m = 8, k = 16, nLists = 8)
    val index = IvfPqIndex.openIndex(spark, path)

    val queryRows = emb.filter(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val batchExpected = index.topK(
        emb.filter(col("vec_id") < 6), "vec_id", "embedding", k = 3, nProbe = 3)
      .select("query_id", "neighbor_id", "rnk")
      .collect().map(_.toString).sorted.toSeq

    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val ms = MemoryStream[(Long, Array[Float])]
    val q = Streams.annProbeStream(
        ms.toDF().toDF("vec_id", "embedding"), index,
        "vec_id", "embedding", k = 3, nProbe = 3) { (res, _) =>
      got.synchronized {
        got ++= res.select("query_id", "neighbor_id", "rnk").collect().map(_.toString)
      }
    }
    try {
      // two arrivals: the probe serves each micro-batch independently
      ms.addData(queryRows.take(3).toSeq: _*)
      q.processAllAvailable()
      ms.addData(queryRows.drop(3).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.sorted.toSeq == batchExpected,
      s"stream ${got.size} rows vs batch ${batchExpected.size}")
  }

  test("streaming band-index maintenance appends once even when a restart replays the batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    val ingestRows = Seq((3L, "totally different content about glacier melt rates"),
      (4L, "yet another unrelated musing on deep sea vents"))
    val ingest = ingestRows.toDF("doc_id", "text")
    val pathS = java.nio.file.Files.createTempDirectory("bandidx-stream").toString
    val pathB = java.nio.file.Files.createTempDirectory("bandidx-batch").toString
    try {
      graft.operators.Dedup.buildBandIndex(base, "doc_id", "text", pathS)
      graft.operators.Dedup.buildBandIndex(base, "doc_id", "text", pathB)
      // the batch twin: one plain append
      graft.operators.Dedup.appendToBandIndex(ingest, "doc_id", "text", pathB)
      // the stream ingests the same docs as micro-batch 0...
      val ms = MemoryStream[(Long, String)]
      val q = Streams.bandIndexAppendStream(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text", pathS)
      try {
        ms.addData(ingestRows: _*)
        q.processAllAvailable()
      } finally q.stop()
      // ...and a RESTART replays micro-batch 0 (foreachBatch delivers
      // the same batchId again): the guard must skip the re-delivery
      Streams.appendBandBatch(ingest, 0L, pathS, "doc_id", "text")
      val s2 = spark.newSession()
      def rows(p: String) = graft.operators.Dedup.openBandIndex(s2, p).index
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      // multiplicity-sensitive compare: a double-append would DUPLICATE
      // rows, not just change the set
      assert(rows(pathS) == rows(pathB),
        "stream-appended index must equal the batch-appended index after a replayed batch")
      // a genuinely NEW batch id still appends
      Streams.appendBandBatch(
        Seq((5L, "fresh fifth document about orbital mechanics")).toDF("doc_id", "text"),
        1L, pathS, "doc_id", "text")
      assert(rows(pathS).size > rows(pathB).size, "new batch ids must still append")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(pathS))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(pathB))
    }
  }

  test("streaming IVF-PQ maintenance is replay-idempotent (same batch id appends once)") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
    val first = emb.filter(col("vec_id") % 2 === 0)
    val ingest = emb.filter(col("vec_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("ivfpq-stream").toString
    try {
      graft.operators.IvfPqIndex.buildIndex(first, "vec_id", "embedding", path,
        dim = 64, m = 8, k = 16, nLists = 8)
      // deliver micro-batch 0 twice — the restart-replay shape
      Streams.appendIvfPqBatch(ingest, 0L, path, "vec_id", "embedding")
      Streams.appendIvfPqBatch(ingest, 0L, path, "vec_id", "embedding")
      val idx = graft.operators.IvfPqIndex.openIndex(spark, path)
      val got = idx.codes.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
      // expected: ONE append — the full corpus encoded under the
      // index's quantizers, each id exactly once
      val want = graft.operators.IvfPqIndex.encodeCorpus(emb, "vec_id", "embedding",
          idx.centroids, idx.codebooks)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
      assert(got == want, s"replayed batch must append once: ${got.size} vs ${want.size} rows")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("streaming debounce decisions match the batch q39 lag flags on in-order delivery") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Streams.DebounceEvent
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // q39's plan with a gap wide enough that the sf0.001 fixture
    // actually drops events (its same-(user, type) gaps all exceed
    // 60 s; 2 h exercises both outcomes)
    val gapUs = 7200L * 1000000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("t"), col("event_id"))
    val batch = Tables(spark, F.sfDir).events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .select(col("event_id"),
        (col("prev_t").isNull || col("t") - col("prev_t") > gapUs).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    val evs = Tables(spark, F.sfDir).events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[DebounceEvent].collect().sortBy(e => e.ts.getTime)

    val ms = MemoryStream[DebounceEvent]
    val out = Streams.debounceStream(ms.toDS(), minGapUs = gapUs)
    val q = out.writeStream.format("memory").queryName("graft_debounce")
      .outputMode("append").start()
    try {
      val (first, second) = evs.splitAt(evs.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("graft_debounce")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got.size == batch.size, s"${got.size} vs ${batch.size}")
    assert(got == batch, "stream decisions must equal the batch lag flags")
    assert(got.values.exists(_ == false), "fixture must exercise some drops")
  }

  test("streaming sessionization matches the batch q25 counts on in-order delivery") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Streams.SessionEventIn
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // the batch gate itself is the spec
    val batch = graft.queries.RelationalQueries
      .queries("q25_sessionize")(spark, F.sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val evs = Tables(spark, F.sfDir).events
      .select(col("event_id"), col("user_id"), col("ts"))
      .as[SessionEventIn].collect().sortBy(e => e.ts.getTime)

    val ms = MemoryStream[SessionEventIn]
    val out = Streams.sessionizeStream(ms.toDS())
    val q = out.writeStream.format("memory").queryName("graft_sessionize")
      .outputMode("append").start()
    try {
      val (first, second) = evs.splitAt(evs.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("graft_sessionize")
      .groupBy(col("user_id"))
      .agg(sum(when(col("new_session"), 1L).otherwise(0L)).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == batch, "stream session/event counts must equal batch q25")
    assert(got.values.exists(_._1 > 1), "fixture must exercise multi-session users")
  }

  test("streaming CUSUM alarms match the batch fold on every closed hour") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Streams.AnomalyEvent
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val evs = Tables(spark, F.sfDir).events
      .select(col("event_type"), col("ts"))
      .as[AnomalyEvent].collect().sortBy(_.ts.getTime)

    // per-type gap-filled hourly series + the batch q45 reference rate
    val byType = evs.groupBy(_.event_type).map { case (t, es) =>
      val hours = es.map(e => e.ts.getTime / 3600000L)
      val (h0, h1) = (hours.min, hours.max)
      val counts = hours.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val series = (h0 to h1).map(h => h -> counts.getOrElse(h, 0L))
      t -> series
    }
    val refs = byType.map { case (t, ser) =>
      t -> (ser.map(_._2).sum / ser.length + 2L)
    }

    // threshold at the series' own max CUSUM, so the fixture exercises
    // BOTH flag outcomes at any scale factor
    val maxS = byType.map { case (t, ser) =>
      var s = 0L; var m = 0L
      // closed hours only — the final hour never emits
      ser.dropRight(1).foreach { case (_, n) =>
        s = math.max(0L, s + n - refs(t)); m = math.max(m, s)
      }
      m
    }.max
    val threshold = math.max(1L, maxS)

    // expected: the q45 fold over each type's series, closed hours only
    // (the final hour never closes — no later arrival exists)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH")
      .withZone(java.time.ZoneOffset.UTC)
    val expected = byType.flatMap { case (t, ser) =>
      var s = 0L
      ser.dropRight(1).map { case (h, n) =>
        s = math.max(0L, s + n - refs(t))
        ((t, fmt.format(java.time.Instant.ofEpochSecond(h * 3600L))),
          (n, s, s >= threshold))
      }
    }.toMap

    val ms = MemoryStream[AnomalyEvent]
    val out = Streams.cusumStream(ms.toDS(), refs, threshold)
    val q = out.writeStream.format("memory").queryName("graft_cusum")
      .outputMode("append").start()
    try {
      val (first, second) = evs.splitAt(evs.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("graft_cusum").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got.size == expected.size, s"${got.size} vs ${expected.size}")
    assert(got == expected,
      "stream CUSUM must equal the batch fold on closed hours")
    assert(got.values.exists(_._3), "fixture must raise at least one alarm")
    assert(got.values.exists(!_._3))
  }

  test("streaming anomaly flags match the prequential batch q41 on every closed hour") {
    import org.apache.spark.sql.functions._
    import graft.streaming.Streams.AnomalyEvent
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val batch = graft.queries.RelationalQueries
      .queries("q41_running_anomaly")(spark, F.sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getBoolean(3))))
      .toMap
    // the stream can only close an hour once a LATER event arrives, so
    // each type's final (still-open) grid hour never emits
    val lastHour = batch.keys.groupBy(_._1).map { case (t, ks) => t -> ks.map(_._2).max }
    val expected = batch.filter { case ((t, h), _) => h != lastHour(t) }

    val evs = Tables(spark, F.sfDir).events
      .select(col("event_type"), col("ts"))
      .as[AnomalyEvent].collect().sortBy(_.ts.getTime)

    val ms = MemoryStream[AnomalyEvent]
    val out = Streams.anomalyStream(ms.toDS())
    val q = out.writeStream.format("memory").queryName("graft_anomaly")
      .outputMode("append").start()
    try {
      val (first, second) = evs.splitAt(evs.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("graft_anomaly").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.size == expected.size, s"${got.size} vs ${expected.size}")
    assert(got == expected,
      "stream flags must equal the batch prequential flags on closed hours")
  }

  test("streaming OHLC bars match the batch q37 query after every prefix completes") {
    import org.apache.spark.sql.functions._
    import graft.{SparkFixture => F, Tables}
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val batch = graft.queries.RelationalQueries.queries("q37_ohlc")(spark, F.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet

    val evs = Tables(spark, F.sfDir).events
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[(Long, java.sql.Timestamp, String, Double)].collect()

    val ms = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val out = Streams.ohlcHourly(
      ms.toDF().toDF("event_id", "ts", "event_type", "value"),
      "event_type", "ts", "value", "event_id")
    val q = out.writeStream.format("memory").queryName("graft_ohlc")
      .outputMode("complete").start()
    try {
      val (first, second) = evs.splitAt(evs.length / 2)
      ms.addData(first.toSeq: _*)
      q.processAllAvailable()
      // mid-stream bars must be internally consistent (low <= open,
      // close <= high) even before the full data arrives
      val mid = spark.table("graft_ohlc").collect()
      assert(mid.nonEmpty && mid.forall(r =>
        r.getDouble(4) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3) &&
        r.getDouble(4) <= r.getDouble(5) && r.getDouble(5) <= r.getDouble(3)))
      ms.addData(second.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("graft_ohlc")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
      assert(got == batch, s"stream ${got.size} bars vs batch ${batch.size}")
    } finally q.stop()
  }

  test("band-index audit loop: a cap-starved template wave drops collision recall and alarms") {
    import org.apache.spark.sql.functions._
    import graft.core.Events
    import graft.operators.Dedup
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // corpus: 40 unique docs + 3 dup pairs (cluster size 2, under the
    // df cap of 4) — the pairs give the baseline audit non-vacuous
    // ground truth, and nothing is capped at build time
    def uniqueDoc(i: Int): String = (0 until 30).map(j => s"c${i}x$j").mkString(" ")
    val corpus = (0 until 40).map(i => (i.toLong, uniqueDoc(i))) ++
      (0 until 3).flatMap(p => Seq(
        (100L + 2 * p, s"pair $p body ${uniqueDoc(900 + p)}"),
        (101L + 2 * p, s"pair $p body ${uniqueDoc(900 + p)}")))
    val root = java.nio.file.Files.createTempDirectory("band-audit-loop")
    val path = s"$root/index"
    val corpusPath = s"$root/corpus"
    val events = scala.collection.mutable.ArrayBuffer.empty[Events.IndexAuditEvent]
    val handler = new Events.Handler {
      override def onEvent(e: Events.Event): Unit = e match {
        case a: Events.IndexAuditEvent => events.synchronized { events += a }
        case _ =>
      }
    }
    Events.register(handler)
    try {
      val corpusDf = corpus.toDF("doc_id", "text")
      Dedup.buildBandIndex(corpusDf, "doc_id", "text", path, maxBandDf = 4)
      corpusDf.write.mode("overwrite").parquet(corpusPath)
      val baseline = Streams.auditBandCollisionRecall(spark, path, corpusPath,
        spark.read.parquet(corpusPath).limit(64), "doc_id", "text")
      assert(baseline == 1.0, s"nothing is capped at build time: $baseline")

      // wave 1: IN-distribution — 4 fresh dup pairs, each cluster of 2
      // under the per-batch cap, so the append indexes them intact;
      // wave 2: a 12-doc identical-template cluster in ONE batch —
      // every shared bucket's df is 12 > cap 4, so the append drops
      // them wholesale and the wave ingests silently unfindable
      val wave1 = (0 until 4).flatMap(p => Seq(
        (200L + 2 * p, s"fresh $p pair ${uniqueDoc(800 + p)}"),
        (201L + 2 * p, s"fresh $p pair ${uniqueDoc(800 + p)}")))
      val wave2 = (0 until 12).map(i => (300L + i, s"template ${uniqueDoc(700)}"))

      val ms = MemoryStream[(Long, String)]
      val q = Streams.auditedBandAppendStream(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
        path, corpusPath, alarmBelow = baseline - 0.1, streamId = "band-audit")
      try {
        ms.addData(wave1: _*)
        q.processAllAvailable()
        ms.addData(wave2: _*)
        q.processAllAvailable()
      } finally q.stop()

      val got = events.synchronized { events.toList }.sortBy(_.batchId)
      assert(got.size == 2, s"one audit event per applied wave: $got")
      assert(got.forall(e => e.baseline == baseline && e.k == 0 &&
        e.streamId == "band-audit" && e.indexPath == path))
      val (healthy, starved) = (got.head, got.last)
      assert(!healthy.alarm,
        s"under-cap pair wave must not alarm: $healthy (baseline $baseline)")
      assert(starved.alarm,
        s"cap-starved template wave must alarm: $starved (baseline $baseline)")
      assert(baseline - starved.recall > 0.1,
        s"decay must be measurable: baseline $baseline vs ${starved.recall}")
      assert(healthy.recall > starved.recall, s"$healthy vs $starved")

      // replay shape: re-delivering an applied batch id neither
      // double-appends nor re-posts its audit event
      val before = Dedup.openBandIndex(spark, path).index.count()
      Streams.auditedBandBatch(wave2.toDF("doc_id", "text"), batchId = 1L,
        path, corpusPath, "doc_id", "text",
        alarmBelow = baseline - 0.1, baseline = baseline, streamId = "band-audit")
      assert(Dedup.openBandIndex(spark, path).index.count() == before,
        "replayed batch id must not double-append")
      assert(events.synchronized { events.size } == 2,
        "replayed batch id must not re-post an audit event")
    } finally {
      Events.unregister(handler)
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("streaming recall-audit loop: a drifted append wave raises an alarm event") {
    import org.apache.spark.sql.functions._
    import graft.core.Events
    import graft.operators.IvfPqIndex
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
    val build = emb.filter(col("vec_id") % 2 === 0)
    val root = java.nio.file.Files.createTempDirectory("ivfpq-audit-loop")
    val path = s"$root/index"
    val corpusPath = s"$root/corpus"
    val events = scala.collection.mutable.ArrayBuffer.empty[Events.IndexAuditEvent]
    val handler = new Events.Handler {
      override def onEvent(e: Events.Event): Unit = e match {
        case a: Events.IndexAuditEvent => events.synchronized { events += a }
        case _ =>
      }
    }
    Events.register(handler)
    try {
      IvfPqIndex.buildIndex(build, "vec_id", "embedding", path,
        dim = 64, m = 8, k = 16, nLists = 8)
      build.select(col("vec_id"), col("embedding"))
        .write.mode("overwrite").parquet(corpusPath)
      val baseline = Streams.auditMeanRecall(spark, path, corpusPath,
        spark.read.parquet(corpusPath).limit(64), "vec_id", "embedding",
        k = 5, nProbe = 3)

      // wave 1: IN-distribution vectors (the held-out half) — healthy;
      // wave 2: the IvfPqSpec drift shape (a huge dim-0 offset crowds
      // every vector into one list while the signal is compressed 20×,
      // so the frozen quantizers can no longer rank them)
      val wave1 = emb.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
      val wave2 = emb.filter(col("vec_id") % 2 === 1)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, lit(50.0f)).otherwise(x * lit(0.05f)).cast("float"))
            .as("embedding"))
        .as[(Long, Array[Float])].collect()

      val ms = MemoryStream[(Long, Array[Float])]
      val q = Streams.auditedIvfPqAppendStream(
        ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        path, corpusPath, k = 5, nProbe = 3,
        alarmBelow = baseline - 0.1, streamId = "audit-loop")
      try {
        ms.addData(wave1.toSeq: _*)
        q.processAllAvailable()
        ms.addData(wave2.toSeq: _*)
        q.processAllAvailable()
      } finally q.stop()

      val got = events.synchronized { events.toList }.sortBy(_.batchId)
      assert(got.size == 2, s"one audit event per applied wave: $got")
      assert(got.forall(e => e.baseline == baseline && e.k == 5 &&
        e.streamId == "audit-loop"))
      val (healthy, drifted) = (got.head, got.last)
      assert(!healthy.alarm,
        s"in-distribution wave must not alarm: $healthy (baseline $baseline)")
      assert(drifted.alarm,
        s"drifted wave must alarm: $drifted (baseline $baseline)")
      assert(baseline - drifted.recall > 0.1,
        s"decay must be measurable: baseline $baseline vs ${drifted.recall}")
      assert(healthy.recall > drifted.recall, s"$healthy vs $drifted")

      // replay shape: re-delivering an applied batch id neither
      // double-appends nor re-posts its audit event
      val before = IvfPqIndex.openIndex(spark, path).codes.count()
      Streams.auditedIvfPqBatch(
        emb.filter(col("vec_id") % 2 === 1).select(
          (col("vec_id") + 100000L).as("vec_id"), col("embedding")),
        batchId = 1L, path, corpusPath, "vec_id", "embedding",
        k = 5, nProbe = 3, alarmBelow = baseline - 0.1,
        baseline = baseline, streamId = "audit-loop")
      assert(IvfPqIndex.openIndex(spark, path).codes.count() == before,
        "replayed batch id must not double-append")
      assert(events.synchronized { events.size } == 2,
        "replayed batch id must not re-post an audit event")
    } finally {
      Events.unregister(handler)
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }
}
