package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Binary (1-bit) quantization: packing layout, Hamming scoring and the
  * MRL prefix funnel, each against hand-computed expectations (the
  * driver gate cross-checks v19-v21 against DuckDB's recomputation).
  */
class BinaryQuantSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("packExpr layout: bit b of word w covers dim w*32+b, value = sum bit*2^b") {
    val df = Seq((0L, vec(1.0, -1.0, 1.0, -1.0))).toDF("vec_id", "embedding")
    val thr = Array(0.0, 0.0, 0.0, 0.0)
    val words = df.select(BinaryQuant.packExpr(col("embedding"), thr, dim = 4))
      .collect().head.getSeq[Long](0)
    // bits 0 and 2 set → 1 + 4 = 5; single word for dim <= 32
    assert(words == Seq(5L))
  }

  test("packExpr spills dim 32+ into the second word; >= threshold sets the bit") {
    val xs = Array.fill(33)(-1.0)
    xs(31) = 7.0 // word 0, bit 31
    xs(32) = 0.5 // word 1, bit 0 — exactly at threshold → set (>=)
    val df = Seq((0L, xs.map(_.toFloat))).toDF("vec_id", "embedding")
    val thr = Array.fill(33)(0.5)
    val words = df.select(BinaryQuant.packExpr(col("embedding"), thr, dim = 33))
      .collect().head.getSeq[Long](0)
    assert(words == Seq(1L << 31, 1L))
  }

  test("hammingExpr is the XOR popcount sum over word pairs") {
    val df = Seq((Array(5L, 1L), Array(6L, 1L))).toDF("a", "b")
    // 5^6 = 3 (2 bits), 1^1 = 0 → 2
    val h = df.select(BinaryQuant.hammingExpr(col("a"), col("b")))
      .collect().head.getLong(0)
    assert(h == 2L)
  }

  private val corpus = Seq(
    (0L, vec(1.0, 1.0, -1.0, -1.0)),
    (1L, vec(1.0, 1.0, -1.0, 1.0)),  // hamming 1 from doc 0's code
    (2L, vec(1.0, -1.0, 1.0, -1.0)), // hamming 2
    (3L, vec(-1.0, -1.0, 1.0, 1.0)), // hamming 4 (complement)
    (4L, vec(1.0, 1.0, -1.0, -1.0))) // hamming 0 (same code as doc 0)
    .toDF("vec_id", "embedding")
  private val mins = Array(-1.0, -1.0, -1.0, -1.0)
  private val maxs = Array(1.0, 1.0, 1.0, 1.0) // thresholds (mn+mx)/2 = 0

  test("hammingTopK ranks by distance asc with neighbor-id asc tie-break") {
    val q = corpus.filter(col("vec_id") === 0L)
    val top = BinaryQuant.hammingTopK(corpus, q, "vec_id", "embedding",
        mins, maxs, dim = 4, k = 4)
      .orderBy("rnk")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(top.toSeq == Seq((4L, 0L, 1), (1L, 1L, 2), (2L, 2L, 3), (3L, 4L, 4)))
  }

  test("mrlFunnelTopK with shortlist >= corpus equals exact full-dim top-k") {
    val q = corpus.filter(col("vec_id") < 2)
    val funnel = BinaryQuant.mrlFunnelTopK(corpus, q, "vec_id", "embedding",
        prefixDim = 2, shortlist = 10, k = 3)
      .orderBy("query_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = SimilaritySearch.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .orderBy("query_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(funnel.toSeq == exact.toSeq)
  }

  test("mrlFunnelTopK reranks the shortlist full-dim (prefix order != final order)") {
    // Prefix (first 2 dims) puts doc 11 ahead of doc 12 for the query,
    // but full-dim cosine reverses them — the funnel must surface the
    // full-dim winner at rnk 1 once both survive the shortlist.
    val c = Seq(
      (10L, vec(1.0, 0.0, 0.0, 0.0)),
      (11L, vec(1.0, 0.1, -1.0, 0.0)),
      (12L, vec(0.9, 0.1, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val q = Seq((99L, vec(1.0, 0.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    val top = BinaryQuant.mrlFunnelTopK(c, q, "vec_id", "embedding",
        prefixDim = 2, shortlist = 3, k = 3)
      .orderBy("rnk").collect().map(_.getLong(1))
    assert(top.head == 12L, top.toSeq.toString)
  }
}
