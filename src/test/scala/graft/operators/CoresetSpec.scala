package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.spark

class CoresetSpec extends AnyFunSuite {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("greedy k-center picks one point per cluster before densifying any") {
    // three tight direction-clusters in 3-d: ids 0-2 near +x, 10-12
    // near +y, 20-22 near +z. Farthest-point traversal must visit all
    // three directions in its first three picks (any plain top-k by
    // similarity to one anchor would stay inside a single cluster).
    val pts = Seq(
      (0L, vec(1, 0.01, 0)), (1L, vec(1, 0.02, 0)), (2L, vec(1, 0, 0.01)),
      (10L, vec(0.01, 1, 0)), (11L, vec(0, 1, 0.02)), (12L, vec(0.02, 1, 0)),
      (20L, vec(0, 0.01, 1)), (21L, vec(0.01, 0, 1)), (22L, vec(0, 0.02, 1))
    ).toDF("vec_id", "embedding")
    val got = Coreset.kcenterCoreset(pts, "vec_id", "embedding", k = 3)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.head == ((0L, 1)), s"seed must be the lowest id: ${got.toSeq}")
    val clusters = got.map { case (id, _) => id / 10 }.toSet
    assert(clusters == Set(0L, 1L, 2L),
      s"first 3 picks must cover all 3 clusters: ${got.toSeq}")
  }

  test("selection is deterministic and ranks are 1..k without repeats") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val a = Coreset.kcenterCoreset(pts, "vec_id", "embedding", k = 5)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val b = Coreset.kcenterCoreset(pts, "vec_id", "embedding", k = 5)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(a == b, "greedy traversal must be deterministic")
    assert(a.map(_._2) == (1 to 5), a.toString)
    assert(a.map(_._1).distinct.size == 5, "no point selected twice")
  }

  test("a candidate pool that covers the corpus equals the unrestricted traversal") {
    val rnd = new scala.util.Random(23)
    // every id is a multiple of 3, so poolModulus=3 keeps ALL rows:
    // the restricted traversal must be bit-identical to the default
    val pts = (0 until 40).map { i =>
      (i * 3L, Array.fill(6)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val full = Coreset.kcenterCoreset(pts, "vec_id", "embedding", k = 4)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val pooled = Coreset.kcenterCoreset(pts, "vec_id", "embedding", k = 4,
      poolModulus = 3L)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(pooled == full, s"$pooled vs $full")
  }

  test("a strict pool traverses only pool members, greedily over the pool") {
    val rnd = new scala.util.Random(31)
    val pts = (0 until 50).map { i =>
      (i.toLong, Array.fill(6)(rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "embedding")
    val pooled = Coreset.kcenterCoreset(pts, "vec_id", "embedding", k = 4,
      poolModulus = 5L)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(pooled.forall(_._1 % 5 == 0), s"picks must come from the pool: $pooled")
    // equals the traversal over the explicitly pre-filtered frame
    val manual = Coreset.kcenterCoreset(
      pts.filter($"vec_id" % 5 === 0), "vec_id", "embedding", k = 4)
      .orderBy("rnk").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(pooled == manual)
  }
}
