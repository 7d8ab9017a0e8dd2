package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}
import graft.queries.VectorQueries.{DIM, K_CODES, M_SUB}

class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val emb = Tables(spark, SparkFixture.sfDir).embeddings

  private lazy val codebooks =
    PqIndex.train(emb, "vec_id", "embedding", dim = DIM, m = M_SUB, k = K_CODES)

  test("codebooks have the right shape and finite centroids") {
    assert(codebooks.length == M_SUB)
    assert(codebooks.forall(_.length == K_CODES))
    assert(codebooks.forall(_.forall(_.length == DIM / M_SUB)))
    assert(codebooks.flatten.flatten.forall(v => !v.isNaN && !v.isInfinity))
  }

  test("encode emits one in-range code per subspace, deterministically") {
    val codes = emb.select(col("vec_id"),
      PqIndex.encode(col("embedding"), codebooks).as("codes"))
    val rows = codes.collect()
    assert(rows.forall(_.getSeq[Int](1).length == M_SUB))
    assert(rows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < K_CODES)))
    val again = codes.collect()
    assert(rows.map(_.getSeq[Int](1)).toSeq == again.map(_.getSeq[Int](1)).toSeq)
  }

  test("ADC equals the dot product against the reconstructed (decoded) vector") {
    // PQ's defining identity: adc(q, codes(x)) == dot(q, decode(codes(x)))
    // where decode concatenates the selected centroids. Spot-check one
    // corpus vector against one query.
    val r = emb.filter(col("vec_id") === 1)
      .select(PqIndex.encode(col("embedding"), codebooks)).head().getSeq[Int](0)
    val reconstructed = r.toArray.zipWithIndex.flatMap { case (code, j) => codebooks(j)(code) }
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val expected = q.zip(reconstructed).foldLeft(0.0) { case (acc, (x, c)) => acc + x.toDouble * c }
    val got = PqIndex.pqTopK(
      emb.filter(col("vec_id") === 1), emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", codebooks, k = 1)
      .select(col("adc")).head().getDouble(0)
    assert(math.abs(got - expected) < 1e-9, s"adc $got vs reconstructed dot $expected")
  }

  test("PQ top-k recall against exact dot ranking is usable") {
    val queries = emb.filter(col("vec_id") < 5)
    val approx = PqIndex.pqTopK(emb, queries, "vec_id", "embedding", codebooks, k = 5)
    assert(approx.groupBy("query_id").count().collect().forall(_.getLong(1) <= 5))
    val exact = SimilaritySearch.dotTopK(emb, queries, "vec_id", "embedding", k = 5)
    val recall = SimilaritySearch.recallAtK(approx, exact, 5)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(recall >= 0.2, s"PQ recall collapsed: $recall")
  }
}
