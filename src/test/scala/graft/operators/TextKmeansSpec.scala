package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Hashed tf-idf + Lloyd k-means (d69): bucket hash parity with the
  * JVM md5, zero-vector handling for token-less documents, assignment
  * totality and tie determinism, duplicate-content co-clustering.
  * Cross-engine replay of the full assignment is the driver gate's
  * oracle (artifact-dumped idf + centroids).
  */
class TextKmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def jvmBucket(token: String, dim: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % dim
  }

  test("bucket is the md5-prefix integer mod dim — parity with the JVM digest") {
    val toks = Seq("alpha", "beta", "gamma", "Δ-unicode", "x")
    val got = toks.toDF("t")
      .select(col("t"), TextKmeans.bucket(col("t"), 32).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach { t =>
      assert(got(t) == jvmBucket(t, 32), s"bucket($t)")
    }
  }

  test("token-less documents keep a zero vector and assign to the nearest-origin centroid") {
    val docs = Seq(
      (1L, "alpha alpha beta"),
      (2L, "gamma gamma gamma"),
      (3L, "")) // no tokens: zero raw vector, norm guard must not NaN
      .toDF("doc_id", "text")
    val m = TextKmeans.model(docs, "doc_id", "text",
      dir = "spec-zero", dim = 8, k = 2, iters = 2)
    val vecRow = TextKmeans.vectors(docs, "doc_id", "text", m.idf)
      .filter(col("doc_id") === 3L).select(col("vec")).head()
    assert(vecRow.getSeq[Double](0).forall(_ == 0.0), "empty doc vector")
    val asg = TextKmeans.assign(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(asg.size == 3, "every document is assigned exactly once")
    // the zero vector's distance to centroid c is ||c||²; its winner is
    // the smallest-norm centroid (ties → smaller id), micro-floored
    val wantDist = m.centroids.zipWithIndex
      .map { case (c, i) => (c.foldLeft(0.0)((a, x) => a + x * x), i) }
      .min
    assert(asg(3L)._1 == wantDist._2)
    assert(asg(3L)._2 == math.floor(wantDist._1 * 1e6).toLong)
  }

  test("duplicate content co-clusters at distance zero; k adapts when docs < k") {
    val docs = Seq(
      (1L, "spark catalyst plans"),
      (2L, "spark catalyst plans"), // exact duplicate of 1
      (3L, "wav audio decode decode"))
      .toDF("doc_id", "text")
    val m = TextKmeans.model(docs, "doc_id", "text",
      dir = "spec-dup", dim = 16, k = 8, iters = 2)
    assert(m.centroids.length <= 3, "seeds bounded by available documents")
    val asg = TextKmeans.assign(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(asg(1L) == asg(2L), "identical docs share cluster AND distance")
    assert(asg(1L)._1 != asg(3L)._1, "distinct content separates at k >= 2")
  }

  test("model is memoized per dir — gate query and artifact dump share one training") {
    val docs = Seq((1L, "a b c"), (2L, "c d e")).toDF("doc_id", "text")
    val m1 = TextKmeans.model(docs, "doc_id", "text", dir = "spec-memo", k = 2)
    val m2 = TextKmeans.model(docs, "doc_id", "text", dir = "spec-memo", k = 2)
    assert(m1 eq m2)
  }
}
