package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** SQ8 scalar quantization: encode bounds/fidelity and top-k behavior
  * on a controlled corpus (the driver gate cross-checks the fixtures
  * against DuckDB's recomputation).
  */
class SqIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val dim = 4
  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private val corpus = Seq(
    (0L, vec(1.0, 0.0, 0.0, 0.0)),
    (1L, vec(0.9, 0.1, 0.0, 0.0)),
    (2L, vec(0.0, 1.0, 0.0, 0.0)),
    (3L, vec(0.0, 0.0, 1.0, 1.0)),
    (4L, vec(0.5, 0.5, 0.5, 0.5)))
    .toDF("vec_id", "embedding")

  test("codes hit the [0, 255] rails at per-dim min/max and constant dims code 0") {
    val flat = Seq((0L, vec(2.0, 7.0, 5.0, 5.0)), (1L, vec(4.0, 3.0, 5.0, 5.0)))
      .toDF("vec_id", "embedding")
    val (mins, maxs) = SqIndex.trainStats(flat, "embedding", dim)
    assert(mins.toSeq == Seq(2.0, 3.0, 5.0, 5.0) && maxs.toSeq == Seq(4.0, 7.0, 5.0, 5.0))
    val codes = flat.orderBy("vec_id")
      .select(SqIndex.encode(col("embedding"), mins, maxs))
      .collect().map(_.getSeq[Long](0))
    assert(codes(0) == Seq(0L, 255L, 0L, 0L)) // min→0, max→255, constant→0
    assert(codes(1) == Seq(255L, 0L, 0L, 0L))
  }

  test("reconstruction error is within one quantization step per dim") {
    val (mins, maxs) = SqIndex.trainStats(corpus, "embedding", dim)
    val rows = corpus.select(col("embedding"),
        SqIndex.encode(col("embedding"), mins, maxs).as("codes"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val c = r.getSeq[Long](1)
      (0 until dim).foreach { d =>
        val step = (maxs(d) - mins(d)) / 255.0
        val recon = mins(d) + c(d) * (maxs(d) - mins(d)) / 255.0
        assert(math.abs(recon - v(d)) <= step + 1e-12,
          s"dim $d: recon $recon vs ${v(d)} step $step")
      }
    }
  }

  test("sqTopK ranks the true nearest neighbors on well-separated vectors") {
    val (mins, maxs) = SqIndex.trainStats(corpus, "embedding", dim)
    val q = corpus.filter(col("vec_id") === 0L)
    val top = SqIndex.sqTopK(corpus, q, "vec_id", "embedding", mins, maxs, k = 2)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    // nearest to (1,0,0,0) by dot: vec 1 (0.9), then vec 4 (0.5)
    assert(top.toSeq == Seq((1L, 1), (4L, 2)))
  }

  test("reconErrorNano matches a driver-side recompute and zeroes constant dims") {
    val (mins, maxs) = SqIndex.trainStats(corpus, "embedding", dim)
    val rows = corpus.orderBy("vec_id")
      .select(col("embedding"),
        SqIndex.reconErrorNano(col("embedding"), mins, maxs).as("err"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val e = r.getSeq[Long](1)
      (0 until dim).foreach { d =>
        val lo = mins(d); val hi = maxs(d)
        val expected =
          if (hi == lo) math.floor(math.abs(v(d).toDouble - lo) * 1e9).toLong
          else {
            val code = math.min(255L, math.max(0L,
              math.floor(((v(d).toDouble - lo) * 255.0) / (hi - lo)).toLong))
            val recon = lo + (code.toDouble * (hi - lo)) / 255.0
            math.floor(math.abs(v(d).toDouble - recon) * 1e9).toLong
          }
        assert(e(d) == expected, s"dim $d: ${e(d)} vs $expected")
        // one quantization step bounds the error wherever the dim varies
        if (hi != lo) assert(e(d) <= ((hi - lo) / 255.0 * 1e9).toLong + 1)
      }
    }
    // a constant dimension reconstructs exactly (code 0, recon == lo)
    val flat = Seq((0L, vec(2.0, 5.0, 1.0, 5.0)), (1L, vec(4.0, 5.0, 3.0, 5.0)))
      .toDF("vec_id", "embedding")
    val (fm, fx) = SqIndex.trainStats(flat, "embedding", dim)
    val errs = flat.select(SqIndex.reconErrorNano(col("embedding"), fm, fx))
      .collect().map(_.getSeq[Long](0))
    errs.foreach { e => assert(e(1) == 0L && e(3) == 0L) }
  }
}
