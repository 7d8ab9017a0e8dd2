package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Scan watchdog: a side-effect-only planner strategy that rejects
  * queries whose file scans exceed configured byte / partition budgets
  * BEFORE any task runs — the guardrail that makes a shared 100 TB lake
  * multi-tenant-safe (one unpartition-pruned `SELECT *` cannot occupy
  * the cluster). Matches the reference's MaxScanStrategy.scala:41-120
  * shape: contributes no physical plan (returns Nil), throws on
  * violation using pruned-partition estimates, so partition-pruned
  * queries pass while full scans of the same table fail.
  *
  * Confs (unset = unlimited):
  *   spark.graft.watchdog.maxScanBytes
  *   spark.graft.watchdog.maxPartitions  (hive-style partition count)
  */
class MaxScanStrategy(session: SparkSession) extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = {
    val conf = session.sessionState.conf
    val maxBytes = conf.getConfString("spark.graft.watchdog.maxScanBytes", "-1").toLong
    val maxParts = conf.getConfString("spark.graft.watchdog.maxPartitions", "-1").toLong
    if (maxBytes < 0 && maxParts < 0) return Nil

    plan.foreach {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        // partition-pruned size when the catalog gives us file-index
        // pruning; falls back to relation size
        val bytes = fs.location.sizeInBytes
        if (maxBytes >= 0 && bytes > maxBytes) {
          throw new MaxScanExceededException(
            s"scan of ${lr.relation} reads $bytes bytes > watchdog limit $maxBytes")
        }
        val nParts = fs.partitionSchema.fields.length match {
          case 0 => 1L
          case _ => scala.util.Try(fs.location.listFiles(Nil, Nil).length.toLong).getOrElse(1L)
        }
        if (maxParts >= 0 && nParts > maxParts) {
          throw new MaxScanExceededException(
            s"scan of ${lr.relation} touches $nParts partitions > watchdog limit $maxParts")
        }
      case ds: DataSourceV2ScanRelation =>
        val bytes = ds.computeStats().sizeInBytes
        if (maxBytes >= 0 && bytes > maxBytes) {
          throw new MaxScanExceededException(
            s"scan of ${ds.scan.description()} reads $bytes bytes > watchdog limit $maxBytes")
        }
      case _ =>
    }
    Nil
  }
}

class MaxScanExceededException(msg: String) extends RuntimeException(msg)
