package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Johnson–Lindenstrauss projection: determinism, the hand-computable
  * fold, and the property the construction exists for — near neighbors
  * in the full space stay near in the projected space.
  */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("sign matrix is deterministic, ±1, and seed-sensitive") {
    val a = RandomProjection.signMatrix(8, 4)
    val b = RandomProjection.signMatrix(8, 4)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(s => s == 1 || s == -1))
    val c = RandomProjection.signMatrix(8, 4, seed = "other")
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq, "seed must matter")
    // both signs occur (a constant matrix would be a broken hash)
    assert(a.flatten.toSet == Set(1, -1))
  }

  test("projection is the signed ordered fold, quantized once") {
    val df = Seq((1L, Array(1.5f, -2.0f, 0.25f))).toDF("vec_id", "embedding")
    val signs = Array(Array(1, -1, 1), Array(-1, -1, -1))
    val got = df.select(RandomProjection.projectMicro(col("embedding"), signs))
      .collect().head.getSeq[Long](0)
    // row 0: 1.5 + 2.0 + 0.25 = 3.75 → 3,750,000
    // row 1: -1.5 + 2.0 - 0.25 = 0.25 → 250,000
    assert(got == Seq(3750000L, 250000L), got)
  }

  test("near neighbors in the full space stay near under projection (the JL property)") {
    val rnd = new scala.util.Random(7)
    // 30 well-separated base points in 64-d, each with a close twin
    val base = (0 until 30).map(_ => Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      val twin = v.map(x => x + (rnd.nextGaussian() * 0.05).toFloat)
      Seq((2L * i, v), (2L * i + 1, twin))
    }
    val df = rows.toDF("vec_id", "embedding")
    val proj = RandomProjection.project(df, "vec_id", "embedding", 64, 16)
      .select(col("vec_id"), col("proj").cast("array<float>").as("embedding"))
    // nearest neighbor by cosine in the PROJECTED space must be the
    // twin for the overwhelming majority of points
    val nn = SimilaritySearch.bruteForceTopK(proj, proj, "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val preserved = nn.count { case (q, n) => n == (q ^ 1L) }
    assert(preserved >= 54, s"twins preserved for only $preserved/60 points")
  }
}
