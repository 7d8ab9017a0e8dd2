package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table ONCE at write time
  * so every subsequent equi-join/aggregation on the bucket key runs
  * with no exchange — the standard way to amortize the dominant shuffle
  * of a 100 TB pipeline across all downstream queries. Both join sides
  * must share the bucket count and key.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: with matching
    * bucket specs Spark plans a sort-merge join directly over the
    * bucket files — zero Exchange operators (assert with
    * [[shuffleCount]]).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Number of shuffle exchanges in a DataFrame's executed plan
    * (AQE-aware: unwraps the adaptive root and counts both pending
    * exchanges and materialized shuffle query stages).
    */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    var n = 0
    plan.foreach {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => n += 1
      case _: ShuffleQueryStageExec => n += 1
      case _ =>
    }
    n
  }
}
