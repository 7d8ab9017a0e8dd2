package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: walk the corpus in a caller-defined
  * rank order (quality score, curriculum stage, …) and keep documents
  * until a global weight budget (token count) is filled — "give me the
  * best 10 B tokens" of a pretraining pipeline.
  *
  * The defining computation is a GLOBAL running sum over a total
  * order. The naive Spark expression — `sum(w) over (order by …)` with
  * no partition key — degenerates to a single reducer holding the
  * whole corpus, the exact shape that dies first at 100 TB. This
  * implementation keeps the prefix sum fully distributed:
  *
  *  1. range-repartition + sort within partitions on the rank order —
  *     Spark's own distributed-sort shape, so partition i holds ranks
  *     strictly before partition i+1;
  *  2. per-partition weight totals (one tiny `groupBy` on the
  *     partition id — as many rows as partitions, never data-sized);
  *  3. exclusive prefix of those totals broadcast back as the
  *     partition's starting offset;
  *  4. within-partition running sum via a window PARTITIONED BY the
  *     partition id — every partition computes its slice in parallel.
  *
  * The result is bit-identical to the single-reducer window (integer
  * weights, total order made unique by the caller's tiebreak columns)
  * while the widest state any one task holds is one partition's slice.
  * A 1000-executor cluster fills a 10 B-token budget over 100 TB with
  * two shuffles (range exchange + the numParts-row totals agg) and no
  * driver collect beyond the numParts-row offset table.
  *
  * Invariant: the offset branch and the row branch MUST observe the
  * same range boundaries. Range-boundary sampling is seeded per
  * physical exchange (RDD id), so two independent instantiations of the same
  * logical subtree can legally pick DIFFERENT boundaries — relying on
  * Spark's exchange reuse to merge them is a silent-corruption hazard
  * (reuse can be disabled by conf, or not fire after a planner
  * change). The operator therefore pins ONE materialization itself:
  * `ranked` is eagerly `localCheckpoint()`ed, and both consumers read
  * that single computed RDD. The checkpoint stores exactly what the
  * reused exchange would have stored (the range-partitioned, sorted
  * rows — MEMORY_AND_DISK, spilled when big), blocks are freed by the
  * ContextCleaner once the plan is unreachable, and a reuse regression
  * is impossible by construction rather than guarded by assertion.
  * BudgetSelectSpec pins bit-equality with the single-window oracle
  * with `spark.sql.exchange.reuse=false` to keep this honest.
  */
object BudgetSelect {

  /** Rows (with `cum_before` = exact sum of `weightCol` over all rows
    * strictly earlier in `order`) whose prefix sum is still under
    * `budget`. A row straddling the boundary is kept — the standard
    * greedy fill. `order` must be a total order (include a unique
    * tiebreak column); `weightCol` must be integral.
    */
  def takeUntilBudget(df: DataFrame, weightCol: String, order: Seq[Column],
      budget: Long, numParts: Int = 32): DataFrame = {
    // Eager local checkpoint = the one materialization both branches
    // read; see the exchange-reuse invariant note above.
    val ranked = df
      .repartitionByRange(numParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // numParts-row aggregate: the only thing that ever leaves the
    // executors. Range partitioning puts earlier ranks in lower pids,
    // so the exclusive prefix over pid order is each partition's
    // global starting offset.
    val offsets = ranked.groupBy(col("__pid"))
      .agg(sum(col(weightCol).cast("long")).as("__ptotal"))
      .withColumn("__offset",
        coalesce(sum(col("__ptotal")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val within = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranked
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum_before",
        col("__offset") +
          coalesce(sum(col(weightCol).cast("long")).over(within), lit(0L)))
      .filter(col("cum_before") < budget)
      .drop("__pid", "__offset")
  }
}
