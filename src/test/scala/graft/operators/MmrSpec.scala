package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // Unit vectors at known angles from the query q = x̂: v1 at 8°, v2 at
  // 26° in the SAME plane (redundant with v1: sim12 = cos 18°), v3 at
  // 28° in an ORTHOGONAL plane (sim13 = cos8°·cos28° ≈ 0.874). Plain
  // relevance ranks 1, 2, 3; MMR's redundancy term demotes v2 below v3:
  //   s(2) = 7·0.8988 − 3·0.9511 = 3.438
  //   s(3) = 7·0.8829 − 3·0.8744 = 3.558  → v3 selected second.
  private lazy val corpus = Seq(
    (10L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.99027f, 0.13917f, 0.0f)),
    (2L, Array(0.89879f, 0.43837f, 0.0f)),
    (3L, Array(0.88295f, 0.0f, 0.46947f))).toDF("vec_id", "embedding")
  private lazy val q = corpus.filter($"vec_id" === 10L)

  test("MMR demotes the redundant candidate below the diverse one") {
    val plain = SimilaritySearch
      .bruteForceTopK(corpus, q, "vec_id", "embedding", 2)
      .collect().map(_.getLong(1)).toSet
    assert(plain == Set(1L, 2L), s"plain top-2 should be the redundant pair: $plain")
    val mmr = Mmr.mmrTopK(corpus, q, "vec_id", "embedding", shortlist = 3, k = 3)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(mmr.toSeq == Seq((1L, 1), (3L, 2), (2L, 3)), mmr.toSeq)
  }

  test("negative similarities keep their sign in the redundancy term (r17 fused greedy)") {
    // q = x̂; v1 at 26° is the relevance pick. Candidate A is ORTHOGONAL
    // to q (rel 0) but strongly anti-correlated with v1 (sim ≈ −0.43);
    // candidate B has small rel (0.1) and near-zero sim to v1 (−0.02).
    //   s(A) = 7·0 − 3·(−430000) ≈ +1 290 000
    //   s(B) = 7·100000 − 3·(−20000) ≈ +760 000  → A must be second.
    // A max-to-selected that clamps negatives at 0 (the r17 fused-pass
    // bug this test pins) would zero both penalties and pick B.
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.43589f, 0.0f)),
      (2L, Array(0.0f, -0.98632f, 0.16486f)),
      (3L, Array(0.1f, -0.25229f, 0.96246f))).toDF("vec_id", "embedding")
    val q10 = corpus.filter($"vec_id" === 10L)
    val got = Mmr.mmrTopK(corpus, q10, "vec_id", "embedding", shortlist = 3, k = 3)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 1), (2L, 2), (3L, 3)), got.toSeq)
  }

  test("with wDiv = 0 MMR degenerates to relevance order") {
    val got = Mmr.mmrTopK(corpus, q, "vec_id", "embedding",
      shortlist = 3, k = 3, wRel = 1, wDiv = 0)
      .orderBy("rnk").collect().map(_.getLong(1))
    assert(got.toSeq == Seq(1L, 2L, 3L), got.toSeq)
  }
}
