package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** AQE stage-preparation rules, the last two rows of the reference's
  * extension suite (KyuubiSparkSQLExtension.scala:33-62).
  *
  * [[DynamicShufflePartitions]] — re-derives the shuffle partition
  * count from the query's actual scan volume
  * (DynamicShufflePartitions.scala:33): a fixed
  * `spark.sql.shuffle.partitions` is wrong in both directions on a
  * shared cluster — 32 partitions on a 10 TB scan makes 300 GB
  * reducers, 2000 on a 1 GB scan makes scheduler confetti. Sets the
  * AQE initial partition number to scanBytes / advisorySize (clamped),
  * letting AQE coalesce down from an informed ceiling.
  *
  * [[FinalStageConfigIsolation]] — applies `spark.sql.finalStage.*`
  * conf overrides when the LAST stage (no pending exchanges below the
  * root) is being prepared (KyuubiQueryStagePreparation.scala:50-171):
  * the final stage is usually the write, which wants bigger output
  * partitions than the intermediate joins.
  */
class DynamicShufflePartitions(session: SparkSession) extends Rule[SparkPlan] {

  override def apply(plan: SparkPlan): SparkPlan = {
    val conf = session.sessionState.conf
    if (!conf.getConfString("spark.graft.dynamicShufflePartitions", "false").toBoolean) return plan

    val scanBytes = plan.collect {
      case f: FileSourceScanExec => f.relation.location.sizeInBytes
      case b: BatchScanExec =>
        b.scan match {
          case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
            s.estimateStatistics().sizeInBytes().orElse(0L)
          case _ => 0L
        }
    }.sum
    if (scanBytes <= 0) return plan

    val advisory = conf.getConfString(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "67108864")
    val advisoryBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(advisory)
    val maxParts = conf.getConfString("spark.graft.dynamicShufflePartitions.max", "4096").toInt
    val parts = math.min(maxParts.toLong,
      math.max(conf.numShufflePartitions.toLong, scanBytes / math.max(1L, advisoryBytes))).toInt
    conf.setConfString("spark.sql.adaptive.coalescePartitions.initialPartitionNum", parts.toString)
    plan
  }
}

class FinalStageConfigIsolation(session: SparkSession) extends Rule[SparkPlan] {

  private val Prefix = "spark.sql.finalStage."

  override def apply(plan: SparkPlan): SparkPlan = {
    val conf = session.sessionState.conf
    val overrides = conf.getAllConfs.filter(_._1.startsWith(Prefix))
    if (overrides.isEmpty) return plan
    // final stage: every exchange below the root is already materialized
    // (pending ones appear as ShuffleExchangeExec, materialized ones as
    // query stages)
    val pending = plan.exists {
      case _: ShuffleExchangeExec => true
      case _ => false
    }
    if (!pending) {
      overrides.foreach { case (k, v) =>
        conf.setConfString("spark.sql." + k.stripPrefix(Prefix), v)
      }
    }
    plan
  }
}
