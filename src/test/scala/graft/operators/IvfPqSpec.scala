package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class IvfPqSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  val DIM = 64
  val M = 8
  val K = 16
  val N_LISTS = 8

  lazy val emb = spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")
  lazy val cents = IvfIndex.train(emb, "vec_id", "embedding", nLists = N_LISTS)
  lazy val rcb = IvfPqIndex.trainResidual(emb, "vec_id", "embedding", cents,
    dim = DIM, m = M, k = K)

  test("residual encode kernel: eval == codegen on double arrays") {
    val res = emb.select(col("vec_id"),
      IvfPqIndex.residual(col("embedding"), cents).as("res"))
    val expr = org.apache.spark.sql.graft.PqExpr.encode(col("res"), rcb)
    val viaCodegen = res.select(col("vec_id"), expr.as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // force interpreted eval by disabling whole-stage codegen
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val factoryPrev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val viaEval = res.select(col("vec_id"), expr.as("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(viaCodegen == viaEval)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      factoryPrev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("residuals shrink: PQ over residuals quantizes tighter than over raw vectors") {
    // mean squared residual norm must be below mean squared vector norm
    // (the whole point of encoding residuals)
    val norms = emb.select(
      aggregate(IvfPqIndex.residual(col("embedding"), cents),
        lit(0.0), (a, x) => a + x * x).as("rn"),
      aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double")).as("vn"))
      .agg(avg("rn").as("rn"), avg("vn").as("vn")).head()
    assert(norms.getDouble(0) < norms.getDouble(1),
      s"residual energy ${norms.getDouble(0)} should be < vector energy ${norms.getDouble(1)}")
  }

  test("ivfPqTopK: corpus side carries only list_id + codes; ranking is complete") {
    val q = emb.filter(col("vec_id") < 10)
    val top = IvfPqIndex.ivfPqTopK(emb, q, "vec_id", "embedding", cents, rcb,
      k = 5, nProbe = 3)
    val rows = top.collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to rs.length))
      assert(rs.length <= 5)
    }
    // deterministic across reruns
    val again = IvfPqIndex.ivfPqTopK(emb, q, "vec_id", "embedding", cents, rcb,
      k = 5, nProbe = 3).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
      .sameElements(again.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted))
  }

  test("full probe IVF-PQ recalls at least as well as plain PQ at equal code budget") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = SimilaritySearch.dotTopK(emb, q, "vec_id", "embedding", k = 5)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      SimilaritySearch.recallAtK(approx, exact, k = 5)
        .agg(avg("recall")).head().getDouble(0)
    val ivfpq = meanRecall(IvfPqIndex.ivfPqTopK(emb, q, "vec_id", "embedding",
      cents, rcb, k = 5, nProbe = N_LISTS))
    val plainCb = PqIndex.train(emb, "vec_id", "embedding", dim = DIM, m = M, k = K)
    val plain = meanRecall(PqIndex.pqTopK(emb, q, "vec_id", "embedding", plainCb, k = 5))
    assert(ivfpq >= plain - 0.05,
      s"ivfpq full-probe recall $ivfpq should not trail plain PQ $plain")
    // the fixture embeddings are iid random (near-incompressible: weak
    // clusters, residuals barely shrink), so absolute recall is low for
    // BOTH pq variants (~0.25); this is a sanity floor, not a quality bar
    assert(ivfpq > 0.1, s"ivfpq recall@5 too low: $ivfpq")
  }

  test("persisted index: build-once artifacts, probe-without-train matches train-in-query") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq-idx").toString
    IvfPqIndex.buildIndex(emb, "vec_id", "embedding", path,
      dim = DIM, m = M, k = K, nLists = N_LISTS)
    // artifacts on disk: data-sized codes + artifact-sized centroids/codebooks
    Seq("codes", "centroids", "codebooks").foreach { d =>
      assert(new java.io.File(s"$path/$d").exists(), s"missing artifact $d")
    }
    val idx = IvfPqIndex.openIndex(spark, path)
    assert(idx.centroids.length == N_LISTS && idx.codebooks.length == M)
    assert(idx.codebooks.forall(_.length == K))
    // round-trip: persisted centroids/codebooks are bit-identical
    assert(idx.centroids.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      rcb.map(_.map(_.toSeq).toSeq).toSeq)
    val q = emb.filter(col("vec_id") < 10)
    // the probe path: NO training, NO raw corpus — only artifacts + queries
    val persisted = idx.topK(q, "vec_id", "embedding", k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    val trained = IvfPqIndex.ivfPqTopK(emb, q, "vec_id", "embedding", cents, rcb,
      k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    assert(persisted.sameElements(trained))
    // refine stage over the persisted index (raw corpus only for rescore)
    val pRefined = idx.topKRefined(emb, q, "vec_id", "embedding",
        k = 5, nProbe = 3, refineFactor = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    val tRefined = IvfPqIndex.ivfPqTopKRefined(emb, q, "vec_id", "embedding",
        cents, rcb, k = 5, nProbe = 3, refineFactor = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    assert(pRefined.sameElements(tRefined))
  }

  test("opened-index probe plan reads the codes artifact, not the corpus vectors") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq-idx2").toString
    IvfPqIndex.buildIndex(emb, "vec_id", "embedding", path,
      dim = DIM, m = M, k = K, nLists = N_LISTS)
    val idx = IvfPqIndex.openIndex(spark, path)
    val q = emb.filter(col("vec_id") < 10)
    val plan = idx.topK(q, "vec_id", "embedding", k = 5, nProbe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("codes"), s"probe must scan the codes artifact:\n$plan")
    // the ONLY file scan over embeddings.parquet is the query side
    val embScans = "embeddings\\.parquet".r.findAllIn(plan).length
    assert(embScans <= 1, s"corpus must not be re-scanned for the probe:\n$plan")
  }

  test("appendToIndex: incremental ingest equals full re-encode under the same quantizers") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq-idx3").toString
    // build (train + encode) on the FIRST half only
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    IvfPqIndex.buildIndex(first, "vec_id", "embedding", path,
      dim = DIM, m = M, k = K, nLists = N_LISTS)
    // ingest the second half: encode-only append, no retraining
    IvfPqIndex.appendToIndex(second, "vec_id", "embedding", path)
    val idx = IvfPqIndex.openIndex(spark, path)
    // the appended codes table is bit-identical to encoding the FULL
    // corpus under the index's (first-half-trained) quantizers
    val appended = idx.codes
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    val full = IvfPqIndex.encodeCorpus(emb, "vec_id", "embedding",
        idx.centroids, idx.codebooks)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    assert(appended.length == full.length)
    assert(appended.sameElements(full), "append must equal full re-encode bit-for-bit")
    // probes see the ingested rows: a second-half query can return
    // second-half neighbors
    val q = second.filter(col("vec_id") < 20)
    val hits = idx.topK(q, "vec_id", "embedding", k = 5, nProbe = N_LISTS)
      .collect().map(_.getLong(1)).toSet
    assert(hits.exists(_ % 2 == 1), s"appended vectors must be probeable: $hits")
  }

  test("compactIndex drops replay duplicates and bounds the file count; probes unchanged") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq-compact").toString
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    IvfPqIndex.buildIndex(first, "vec_id", "embedding", path,
      dim = DIM, m = M, k = K, nLists = N_LISTS)
    // an append plus an UNGUARDED replay of the same append — the
    // worst-case at-least-once residue compaction exists to clean
    IvfPqIndex.appendToIndex(second, "vec_id", "embedding", path)
    IvfPqIndex.appendToIndex(second, "vec_id", "embedding", path)
    val before = IvfPqIndex.openIndex(spark, path)
    assert(before.codes.count() > emb.count(), "setup must actually hold duplicates")
    IvfPqIndex.compactIndex(spark, path, targetFiles = 4)
    val after = IvfPqIndex.openIndex(spark, path)
    val got = after.codes.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
    val want = IvfPqIndex.encodeCorpus(emb, "vec_id", "embedding",
        after.centroids, after.codebooks)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
    assert(got == want, "compaction must keep each encoded row exactly once")
    val files = new java.io.File(s"$path/${after.codesDir}").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files <= 4, s"compaction must bound the file count, got $files")
    // versioned swap: the pointer moved off the original dir, and the
    // PREVIOUS version is retained for readers that resolved the old
    // pointer just before the flip
    assert(after.codesDir == "codes_v1", after.codesDir)
    assert(new java.io.File(s"$path/codes").isDirectory,
      "previous version must survive one compaction cycle")
    assert(before.codes.count() > 0,
      "an index opened BEFORE the compaction must stay readable")
    // a second compaction prunes the oldest version only
    IvfPqIndex.compactIndex(spark, path, targetFiles = 4)
    val after2 = IvfPqIndex.openIndex(spark, path)
    assert(after2.codesDir == "codes_v2", after2.codesDir)
    assert(!new java.io.File(s"$path/codes").exists(),
      "versions older than the previous one are pruned")
    assert(new java.io.File(s"$path/codes_v1").isDirectory)
    // probes against the compacted artifact still see both halves
    val q = emb.filter(col("vec_id") < 4)
    val hits = after.topK(q, "vec_id", "embedding", k = 5, nProbe = N_LISTS)
      .collect().map(_.getLong(1)).toSet
    assert(hits.exists(_ % 2 == 0) && hits.exists(_ % 2 == 1), s"both halves probeable: $hits")
  }

  test("recallAudit detects the recall decay of a distribution-shifted append") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq-audit").toString
    IvfPqIndex.buildIndex(emb, "vec_id", "embedding", path,
      dim = DIM, m = M, k = K, nLists = N_LISTS)
    val idx = IvfPqIndex.openIndex(spark, path)
    def meanRecall(audit: org.apache.spark.sql.DataFrame): Double = {
      val rows = audit.collect()
      assert(rows.nonEmpty)
      rows.map(r => r.getLong(1).toDouble / r.getLong(2)).sum / rows.length
    }
    // baseline: sample queries FROM the trained distribution
    val inDist = emb.filter(col("vec_id") < 10)
    val baseline = meanRecall(IvfPqIndex.recallAudit(idx, emb, inDist,
      "vec_id", "embedding", k = 5, nProbe = 3))
    // append a SHIFTED distribution: a huge constant offset in dim 0
    // dominates every vector (they all crowd into one list) while the
    // informative signal is compressed 20× — residuals land far outside
    // the trained codebook cloud, so the frozen quantizers snap them to
    // near-identical codes and ADC can no longer rank them. Exact
    // ranking is PRESERVED (dot = offset² + 0.0025·orig), so the decay
    // is purely quantizer drift — silent without the audit.
    val shifted = emb.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, lit(50.0f)).otherwise(x * lit(0.05f)).cast("float"))
        .as("embedding"))
    IvfPqIndex.appendToIndex(shifted, "vec_id", "embedding", path)
    val idx2 = IvfPqIndex.openIndex(spark, path)
    val fullCorpus = emb.select(col("vec_id"), col("embedding")).union(shifted)
    // audit with queries drawn from the SHIFTED set against the grown
    // corpus: the audit must REPORT the drop a probe user would feel
    val outDist = shifted.filter(col("vec_id") < 100010L)
    val drifted = meanRecall(IvfPqIndex.recallAudit(idx2, fullCorpus, outDist,
      "vec_id", "embedding", k = 5, nProbe = 3))
    assert(baseline > drifted,
      s"audit must report the drift: baseline $baseline vs drifted $drifted")
    assert(baseline - drifted > 0.1,
      s"decay should be MEASURABLE, not noise: $baseline vs $drifted")
    // and in-distribution probes against the grown index stay healthy
    val still = meanRecall(IvfPqIndex.recallAudit(idx2, fullCorpus, inDist,
      "vec_id", "embedding", k = 5, nProbe = 3))
    assert(still > drifted, s"in-dist recall $still must beat drifted $drifted")
  }

  test("exact re-ranking refine recovers recall over raw ADC ordering") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = SimilaritySearch.dotTopK(emb, q, "vec_id", "embedding", k = 5)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      SimilaritySearch.recallAtK(approx, exact, k = 5)
        .agg(avg("recall")).head().getDouble(0)
    val raw = meanRecall(IvfPqIndex.ivfPqTopK(emb, q, "vec_id", "embedding",
      cents, rcb, k = 5, nProbe = N_LISTS))
    val refined = meanRecall(IvfPqIndex.ivfPqTopKRefined(emb, q, "vec_id", "embedding",
      cents, rcb, k = 5, nProbe = N_LISTS, refineFactor = 8))
    // refine re-ranks a 8x candidate pool by the EXACT dot, so it can
    // only recover ordering the ADC approximation scrambled
    assert(refined >= raw, s"refined $refined must not trail raw ADC $raw")
    assert(refined >= 0.5, s"refined recall@5 with 8x pool too low: $refined")
  }

  test("tombstone deletes: probes exclude, delete wins over re-add, compaction drops physically") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq-del").toString
    IvfPqIndex.buildIndex(emb, "vec_id", "embedding", path,
      dim = DIM, m = M, k = K, nLists = N_LISTS)
    val total = emb.count()
    val victims = emb.filter(col("vec_id") >= 20 && col("vec_id") < 30)
    IvfPqIndex.deleteFromIndex(spark, path, victims, "vec_id")
    val idx = IvfPqIndex.openIndex(spark, path)
    assert(idx.tombstones.isDefined)
    assert(idx.liveCodes.count() == total - 10)
    val q = emb.filter(col("vec_id") < 10)
    val probed = idx.topK(q, "vec_id", "embedding", k = 5, nProbe = N_LISTS)
    val hitIds = probed.collect().map(_.getLong(1)).toSet
    assert(hitIds.forall(id => id < 20 || id >= 30),
      s"deleted ids must never surface: $hitIds")
    // every query still gets a full k among survivors (pre-scoring
    // exclusion, not post-filtering an already-cut candidate list)
    assert(probed.groupBy(col("query_id")).count().collect()
      .forall(_.getLong(1) == 5))

    // delete wins over a re-add within the same codes version
    IvfPqIndex.appendToIndex(emb.filter(col("vec_id") === 25L),
      "vec_id", "embedding", path)
    val reAdd = IvfPqIndex.openIndex(spark, path)
    assert(!reAdd.topK(q, "vec_id", "embedding", k = 5, nProbe = N_LISTS)
      .collect().map(_.getLong(1)).contains(25L))

    // compaction applies the deletes physically and clears tombstones
    val before = IvfPqIndex.openIndex(spark, path)
      .topK(q, "vec_id", "embedding", k = 5, nProbe = N_LISTS)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted.toSeq
    IvfPqIndex.compactIndex(spark, path, targetFiles = 4)
    val compacted = IvfPqIndex.openIndex(spark, path)
    assert(compacted.tombstones.isEmpty,
      "the compacted version must start tombstone-free")
    assert(compacted.codes.count() == total - 10)
    val after = compacted.topK(q, "vec_id", "embedding", k = 5, nProbe = N_LISTS)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted.toSeq
    assert(after == before, "compaction must be probe-invariant")
  }

  test("retrain restores the recall a drifted append decayed") {
    // the repair half of the drift contract: recallAudit DETECTS the
    // decay (IvfPqSpec's audit test), retrainIndex fixes it — rebuild
    // the quantizers from the CURRENT corpus and re-encode
    val path = java.nio.file.Files.createTempDirectory("ivfpq-retrain").toString
    IvfPqIndex.buildIndex(emb, "vec_id", "embedding", path,
      dim = DIM, m = M, k = K, nLists = N_LISTS)
    def meanRecall(audit: org.apache.spark.sql.DataFrame): Double = {
      val rows = audit.collect()
      rows.map(r => r.getLong(1).toDouble / r.getLong(2)).sum / rows.length
    }
    // drift shape chosen to be REPAIRABLE: a mirrored cluster (x → −x)
    // keeps full-scale discriminative signal (dot(−q,−x) = dot(q,x)),
    // but the frozen quantizers crowd every mirrored vector into the
    // anti-centroid lists with residuals far outside the trained
    // codebook cloud — ADC garbage until a retrain gives the mirror
    // its own centroids. (The audit test's 20×-compressed shape is
    // deliberately NOT repairable: there the signal itself is below
    // quantization noise, which is a data problem, not a quantizer
    // problem.)
    val shifted = emb.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => (-x).cast("float")).as("embedding"))
    IvfPqIndex.appendToIndex(shifted, "vec_id", "embedding", path)
    val fullCorpus = emb.select(col("vec_id"), col("embedding")).union(shifted)
    val outDist = shifted.filter(col("vec_id") < 100010L)
    val drifted = meanRecall(IvfPqIndex.recallAudit(
      IvfPqIndex.openIndex(spark, path), fullCorpus, outDist,
      "vec_id", "embedding", k = 5, nProbe = N_LISTS))

    val inBefore = meanRecall(IvfPqIndex.recallAudit(
      IvfPqIndex.openIndex(spark, path), fullCorpus,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, nProbe = N_LISTS))
    IvfPqIndex.retrainIndex(spark, path, fullCorpus, "vec_id", "embedding")
    val after = IvfPqIndex.openIndex(spark, path)
    val inAfter = meanRecall(IvfPqIndex.recallAudit(
      after, fullCorpus,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, nProbe = N_LISTS))
    // geometry preserved: hyperparams were read back from the artifacts
    assert(after.centroids.length == N_LISTS &&
      after.centroids.head.length == DIM &&
      after.codebooks.length == M && after.codebooks.head.length == K)
    val repaired = meanRecall(IvfPqIndex.recallAudit(
      after, fullCorpus, outDist, "vec_id", "embedding", k = 5, nProbe = N_LISTS))
    // The contract is SYMMETRY, not an absolute bar: the fixture
    // embeddings are iid-random (near-incompressible — see the
    // full-probe recall test above), so in-distribution recall itself
    // sits near the PQ noise floor. Retrain must (a) measurably lift
    // the drifted queries and (b) close most of the in-vs-drifted GAP
    // (trained-on-what-it-serves restored), without hurting the
    // in-distribution side. Deterministic: seeded k-means over fixed
    // fixtures — these are exact reproducible numbers, margins only
    // guard platform variance.
    assert(repaired > drifted + 0.05,
      s"retrain must measurably lift drifted recall: $drifted -> $repaired")
    assert((inAfter - repaired) < (inBefore - drifted) - 0.05,
      s"retrain must close the drift gap: before ${inBefore - drifted}, " +
        s"after ${inAfter - repaired}")
    assert(inAfter > inBefore - 0.1,
      s"retrain must not sacrifice in-distribution recall: $inBefore -> $inAfter")
    // the retrained index re-encoded the WHOLE corpus, and original
    // queries still resolve to original-corpus neighbors
    assert(after.codes.count() == fullCorpus.count())
    val hits = after.topK(emb.filter(col("vec_id") < 4), "vec_id", "embedding",
        k = 10, nProbe = N_LISTS)
      .collect().map(_.getLong(1)).toSet
    assert(hits.exists(_ < 100000L), s"original neighbors must surface: $hits")
  }
}
