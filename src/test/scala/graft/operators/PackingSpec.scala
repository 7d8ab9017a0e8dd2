package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val docs = Seq(
    ("a", 1L, 300), ("a", 2L, 300), ("a", 3L, 300), // shard a: offsets 0,300,600
    ("b", 4L, 700), ("b", 5L, 100)) // shard b: offsets 0,700
    .toDF("source", "doc_id", "n")

  test("pack assignment is the concat-and-chunk offset division") {
    val packed = Packing.packByBudget(docs, "source", "doc_id", col("n"), budget = 512)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(packed(1L) == ((0L, 0L)))
    assert(packed(2L) == ((300L, 0L)), "doc straddling the boundary packs by its first token")
    assert(packed(3L) == ((600L, 1L)))
    assert(packed(4L) == ((0L, 0L)), "shards pack independently")
    assert(packed(5L) == ((700L, 1L)))
  }

  test("pack stats conserve docs and tokens") {
    val stats = Packing.packStats(
      Packing.packByBudget(docs, "source", "doc_id", col("n"), budget = 512), "source")
    val total = stats.agg(sum("n_docs"), sum("n_tokens")).head()
    assert(total.getLong(0) == 5 && total.getLong(1) == 1700)
    val aPacks = stats.filter(col("source") === "a").collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(aPacks == Map(0L -> ((2L, 600L)), 1L -> ((1L, 300L))))
  }

  test("assignment is deterministic across runs") {
    val a = Packing.packByBudget(docs, "source", "doc_id", col("n"), 512)
      .orderBy("doc_id").collect().toSeq
    val b = Packing.packByBudget(docs, "source", "doc_id", col("n"), 512)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("sliding-window chunks cover every token with the declared overlap") {
    val spark = graft.SparkFixture.spark
    import spark.implicits._
    val text = (1 to 50).map(i => s"t$i").mkString(" ") // 50 tokens
    val one = Seq((7L, text)).toDF("doc_id", "text")
    val chunks = Packing.chunkWithOverlap(one, "doc_id", "text",
        chunkTokens = 16, stride = 12)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4).split(" ").toSeq))
    // starts advance by the stride until the doc end
    assert(chunks.map(_._2).toSeq == Seq(0, 12, 24, 36, 48))
    // windows are full width until the doc end clamps them
    assert(chunks.map(_._3).toSeq == Seq(16, 16, 16, 14, 2))
    // consecutive chunks share their overlapping tokens exactly
    chunks.sliding(2).foreach { case Array((_, s1, n1, t1), (_, s2, _, t2)) =>
      val overlap = (s1 + n1) - s2
      assert(overlap > 0, "windows must overlap")
      assert(t1.takeRight(overlap) == t2.take(overlap), "shared tokens must match")
    }
    // every token appears in at least one chunk, in order
    assert(chunks.flatMap { case (_, s, _, t) => t.zipWithIndex.map { case (tok, i) => (s + i, tok) } }
      .distinct.sortBy(_._1).map(_._2).toSeq == (1 to 50).map(i => s"t$i"))
  }
}
