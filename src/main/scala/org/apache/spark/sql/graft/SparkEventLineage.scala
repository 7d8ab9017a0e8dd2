package org.apache.spark.sql.graft

import org.apache.spark.scheduler.SparkListenerEvent
import org.apache.spark.sql.SparkSession

/** Column lineage as a Spark listener-bus event — the shape the
  * reference's SparkEventDispatcher posts
  * (kyuubi-spark-lineage/.../dispatcher/SparkEventDispatcher.scala:
  * an OperationLineageEvent on sparkContext.listenerBus, consumable
  * by any registered SparkListener or the JSON event log).
  *
  * `columns` maps each output column to its source columns
  * (`table.column`), same payload as the graft Events-bus rendering.
  */
case class GraftLineageSparkEvent(
    execId: Long,
    columns: Map[String, Seq[String]],
    error: Option[String],
    ts: Long) extends SparkListenerEvent

/** Posting requires `sparkContext.listenerBus`, which is
  * `private[spark]` — hence this shim living under the spark package
  * (same pattern as [[ArrowHelper]]/[[Bridge]]).
  */
object SparkEventLineage {
  def post(spark: SparkSession, execId: Long,
      columns: Map[String, Set[String]], error: Option[String]): Unit =
    spark.sparkContext.listenerBus.post(GraftLineageSparkEvent(
      execId, columns.map { case (k, v) => k -> v.toSeq.sorted },
      error, System.currentTimeMillis()))
}
