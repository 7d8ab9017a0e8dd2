package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // Two well-separated directions; ids 1/2/3 are near-identical copies
  // of direction A (cos ≈ 1), id 4 is a distinct A-cluster member at a
  // wide angle, ids 5/6 are near-identical copies of direction B.
  private val vecs = Seq(
    (1L, Array(1.0f, 0.02f, 0f, 0f)),
    (2L, Array(1.0f, 0.01f, 0f, 0f)),
    (3L, Array(0.99f, 0.03f, 0f, 0f)),
    (4L, Array(0.6f, 0.8f, 0f, 0f)), // cos vs (1,0) = 0.6 — kept
    (5L, Array(0f, 0f, 1.0f, 0.01f)),
    (6L, Array(0f, 0f, 0.99f, 0.02f)))
  private lazy val df = vecs.toDF("vec_id", "embedding")
  private val centroids = Array(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 0.0, 1.0, 0.0))

  test("within-cluster near-dup groups collapse to their lowest id") {
    val kept = SemDedup.keep(df, "vec_id", "embedding", centroids, minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // 2 and 3 fold into 1; 6 folds into 5; 4 survives (cos 0.6 < 0.95)
    assert(kept.keySet == Set(1L, 4L, 5L))
    assert(kept(1L) == kept(4L), "1 and 4 share the A cluster")
    assert(kept(1L) != kept(5L), "A and B clusters are distinct")
  }

  test("pairs never cross clusters even above the threshold") {
    val pairs = SemDedup.clusterPairs(df, "vec_id", "embedding", centroids, minCosine = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair stays inside {1,2,3,4} or {5,6}
    val a = Set(1L, 2L, 3L, 4L)
    pairs.foreach { case (x, y) =>
      assert(a(x) == a(y), s"pair ($x,$y) crosses clusters")
    }
    assert(pairs.contains((5L, 6L)))
  }

  test("the threshold is a real knob: near 1.0 even tight copies split") {
    // the tightest copies sit at cos ≈ 0.99995; a 0.99999 threshold
    // keeps everything
    val kept = SemDedup.keep(df, "vec_id", "embedding", centroids, minCosine = 0.99999)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 6L), kept.toString)
  }
}
