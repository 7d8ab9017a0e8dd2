package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class BudgetSelectSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // Shuffled insertion order, duplicate weights and scores — the total
  // order comes only from the (score desc, id asc) tiebreak.
  lazy val docs = scala.util.Random.shuffle(
    (1 to 500).map(i => (i.toLong, (i * 7919) % 90 + 10L, (i * 31) % 50))).toDF("id", "w", "score")

  private def naive(budget: Long) = docs
    .withColumn("cum_before", coalesce(
      sum(col("w")).over(Window.orderBy(col("score").desc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    .filter(col("cum_before") < budget)
    .select("id", "w", "cum_before")

  test("distributed prefix sum matches the single-reducer window bit-for-bit") {
    val budget = 9000L
    val got = BudgetSelect.takeUntilBudget(docs, "w",
        Seq(col("score").desc, col("id").asc), budget, numParts = 7)
      .select("id", "w", "cum_before")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val want = naive(budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.length > 50 && got.length < 500, s"budget should truncate: ${got.length}")
    assert(got.sameElements(want))
  }

  test("budget beyond the corpus keeps everything; zero budget keeps nothing") {
    val all = BudgetSelect.takeUntilBudget(docs, "w",
      Seq(col("score").desc, col("id").asc), budget = Long.MaxValue, numParts = 4)
    assert(all.count() == 500)
    val none = BudgetSelect.takeUntilBudget(docs, "w",
      Seq(col("score").desc, col("id").asc), budget = 0L, numParts = 4)
    assert(none.count() == 0)
  }

  test("both branches read ONE pinned materialization — no range resampling hazard") {
    // Range-boundary sampling is seeded per physical exchange, so two
    // independent instantiations of the ranked subtree could pick
    // different boundaries and silently corrupt cum_before. The
    // operator pins one eager localCheckpoint both branches read; the
    // downstream plan must therefore contain NO rangepartitioning
    // exchange at all (the range shuffle happened once, inside the
    // checkpointed lineage).
    val sel = BudgetSelect.takeUntilBudget(docs, "w",
      Seq(col("score").desc, col("id").asc), budget = 9000L, numParts = 7)
    sel.collect()
    val plan = sel.queryExecution.executedPlan.toString
    val ranges = "rangepartitioning".r.findAllIn(plan.toLowerCase).length
    assert(ranges == 0,
      s"ranked must be checkpointed once, not re-ranged per branch:\n$plan")
    assert(plan.toLowerCase.contains("existingrdd") ||
      plan.toLowerCase.contains("scan existing"),
      s"expected the checkpointed RDD scan in the plan:\n$plan")
  }

  test("bit-identical to the oracle even with exchange reuse disabled") {
    // The hazard case the ADVICE flagged: with exchange reuse off, a
    // reuse-dependent implementation would let the offsets branch and
    // the row branch observe different sampled boundaries. The pinned
    // checkpoint makes the result independent of the reuse conf.
    val budget = 9000L
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val got = BudgetSelect.takeUntilBudget(docs, "w",
          Seq(col("score").desc, col("id").asc), budget, numParts = 7)
        .select("id", "w", "cum_before")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val want = naive(budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got.sameElements(want))
    } finally spark.conf.unset("spark.sql.exchange.reuse")
  }

  test("shuffleShard: complete, deterministic, dense positions per shard") {
    val d = (1 to 300).map(i => i.toLong).toDF("doc_id")
    val a = Sampling.shuffleShard(d, "doc_id", numShards = 8, seed = "s1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.length == 300)
    assert(a.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions within a shard are exactly 1..|shard|
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length))
    }
    // deterministic under the same seed, different under another
    val b = Sampling.shuffleShard(d, "doc_id", numShards = 8, seed = "s1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
    val c = Sampling.shuffleShard(d, "doc_id", numShards = 8, seed = "s2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(!a.sortBy(_._1).sameElements(c.sortBy(_._1)))
  }
}
