package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The v34 pairwise-cosine histogram as an operator: explicit-modulus
  * sampling (the gate query's fixture contract) and the target-size
  * variant that derives the modulus from the corpus count — the 100 TB
  * knob, pinned here to keep the sample near S as the corpus grows.
  */
class SimHistogramSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong,
      Array((1 + i % 3).toFloat, (i % 7).toFloat, 1f))).toDF("vec_id", "embedding")

  test("sampled variant derives ceil(n/S) and equals the explicit modulus") {
    val df = corpus(40)
    // n=40, S=8 → modulus 5: identical sample set to the explicit call
    val derived = SimilaritySearch
      .simHistogramSampled(df, "vec_id", "embedding", targetSample = 8)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(2)))
    val explicit = SimilaritySearch
      .simHistogram(df, "vec_id", "embedding", modulus = 5)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(derived.sameElements(explicit))
    assert(derived.map(_._2).sum == 8L * 7 / 2, "1-in-5 of 40 ids → C(8,2) pairs")
  }

  test("the sample holds near S as the corpus grows (the modulus scales)") {
    val small = SimilaritySearch
      .simHistogramSampled(corpus(30), "vec_id", "embedding", targetSample = 6)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    val big = SimilaritySearch
      .simHistogramSampled(corpus(300), "vec_id", "embedding", targetSample = 6)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    // both corpora sample 6 ids → exactly C(6,2) pairs, 10× data or not
    assert(small == 15L && big == 15L, s"$small / $big")
  }

  test("a corpus smaller than S keeps every row (modulus clamps to 1)") {
    val n = SimilaritySearch
      .simHistogramSampled(corpus(4), "vec_id", "embedding", targetSample = 100)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    assert(n == 6L, s"C(4,2) pairs expected, got $n")
  }
}
