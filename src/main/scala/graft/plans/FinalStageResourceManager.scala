package graft.plans

import scala.annotation.tailrec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec
import org.apache.spark.sql.execution.command.DataWritingCommandExec
import org.apache.spark.sql.execution.datasources.WriteFilesExec
import org.apache.spark.sql.execution.datasources.v2.V2TableWriteExec
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}

/** Cluster-resource hook for the final write stage (the reference's
  * FinalStageResourceManager.scala:46 + InjectCustomResourceProfile):
  * when everything upstream of the terminal rebalance has materialized
  * and the write stage needs far fewer cores than the shuffle-heavy
  * stages did, the redundant executors can be released *eagerly* —
  * before the (often long) write runs — instead of idling until
  * dynamic allocation's timeout. On a 1000-executor job whose final
  * coalesced write has 40 partitions, that is ~950 executors returned
  * to the cluster for the duration of the write.
  *
  * The rule computes WHAT the reference computes — the target executor
  * count from the materialized shuffle's coalesced partition estimate,
  * and the victim list (executors holding no shuffle blocks first,
  * newest registration first, then smallest shuffle payload so
  * reducers lose the least locality). The actual kill goes through the
  * [[ExecutorAllocator]] seam: on a real cluster that is the
  * ExecutorAllocationClient; in local mode (no separate executors
  * exist) the default allocator records the decision and kills
  * nothing.
  */
trait ExecutorAllocator {
  /** (executorId, registrationTimestamp) of live executors. */
  def activeExecutors(): Seq[(String, Long)]
  /** Total shuffle bytes each executor holds for `shuffleId` across
    * `numReduce` reduce partitions (executors absent from the map hold
    * no blocks for this shuffle).
    */
  def shuffleBytesByExecutor(shuffleId: Int, numReduce: Int): Map[String, Long]
  /** Release `ids`, adjusting the allocation target to `newTarget` so
    * the cluster manager does not immediately re-request them.
    */
  def killExecutors(ids: Seq[String], newTarget: Int): Unit
}

/** Local-mode default: no separate executors exist, so there is
  * nothing to kill — but the rule's decisions are recorded so plans
  * (and tests) can observe what a cluster deployment would have done.
  */
class RecordingExecutorAllocator extends ExecutorAllocator {
  @volatile var lastKillRequest: Option[(Seq[String], Int)] = None
  override def activeExecutors(): Seq[(String, Long)] = Nil
  override def shuffleBytesByExecutor(shuffleId: Int, numReduce: Int): Map[String, Long] =
    Map.empty
  override def killExecutors(ids: Seq[String], newTarget: Int): Unit =
    lastKillRequest = Some((ids, newTarget))
}

object FinalStageResourceManager {
  /** Test seam: when set, every rule instance consults this allocator
    * instead of its own (the extension-injected instance is otherwise
    * unreachable from a test).
    */
  @volatile var allocatorOverride: Option[ExecutorAllocator] = None

  /** Victim selection, pure (reference findExecutorToKill policy):
    * first executors holding NO blocks of the final shuffle (they
    * outlived earlier stages), newest registration first; then
    * block-holders by ascending payload, so the surviving reducers
    * keep the most local shuffle data.
    */
  def selectVictims(active: Seq[(String, Long)],
      shuffleBytes: Map[String, Long], targetExecutors: Int): Seq[String] = {
    val toKill = active.size - targetExecutors
    if (toKill < 1) return Nil
    val (without, withBlocks) = active.partition(e => !shuffleBytes.contains(e._1))
    val noBlockFirst = without.sortBy(-_._2).map(_._1)
    val smallestPayload = withBlocks.sortBy(e => shuffleBytes(e._1)).map(_._1)
    (noBlockFirst ++ smallestPayload).take(toKill)
  }

  /** Target executor count for `targetCores` final-stage cores: enough
    * executors for the coalesced partitions, padded by `factor` (≥ 1)
    * as re-request headroom.
    */
  def targetExecutors(targetCores: Int, coresPerExecutor: Int, factor: Double): Int =
    math.max(1, (math.ceil(targetCores.toDouble / math.max(1, coresPerExecutor)) * factor).toInt)

  /** True when the plan's root is a write (v1 command, v2 write, or
    * the WriteFiles node file writes plan through).
    */
  private[plans] def isWrite(plan: SparkPlan): Boolean = plan match {
    case _: DataWritingCommandExec | _: V2TableWriteExec | _: WriteFilesExec => true
    case _ => false
  }

  /** The terminal rebalance stage feeding the write, if it has
    * materialized (reference FinalRebalanceStageHelper): walk through
    * the write node and partition-local operators to a materialized
    * user/rebalance shuffle (ENSURE_REQUIREMENTS exchanges are
    * planner-internal, not the write's rebalance).
    */
  @tailrec
  private[plans] def findFinalRebalanceStage(plan: SparkPlan): Option[ShuffleQueryStageExec] =
    plan match {
      case w: DataWritingCommandExec => findFinalRebalanceStage(w.child)
      case w: V2TableWriteExec => findFinalRebalanceStage(w.child)
      case w: WriteFilesExec => findFinalRebalanceStage(w.child)
      case p: ProjectExec => findFinalRebalanceStage(p.child)
      case f: FilterExec => findFinalRebalanceStage(f.child)
      case s: SortExec if !s.global => findFinalRebalanceStage(s.child)
      case stage: ShuffleQueryStageExec
          if stage.isMaterialized && stage.mapStats.isDefined &&
            stage.plan.isInstanceOf[ShuffleExchangeExec] &&
            stage.plan.asInstanceOf[ShuffleExchangeExec].shuffleOrigin != ENSURE_REQUIREMENTS =>
        Some(stage)
      case _ => None
    }
}

class FinalStageResourceManager(session: SparkSession,
    defaultAllocator: ExecutorAllocator = new RecordingExecutorAllocator)
  extends Rule[SparkPlan] {

  import FinalStageResourceManager._

  private def allocator: ExecutorAllocator =
    allocatorOverride.getOrElse(defaultAllocator)

  override def apply(plan: SparkPlan): SparkPlan = {
    val conf = session.sessionState.conf
    if (!conf.getConfString(
        "spark.graft.finalWriteStage.eagerlyKillExecutors", "false").toBoolean) {
      return plan
    }
    if (!isWrite(plan)) return plan
    findFinalRebalanceStage(plan) match {
      case None => plan
      case Some(stage) =>
        val exchange = stage.plan.asInstanceOf[ShuffleExchangeExec]
        // Coalesced-partition estimate = what AQE's shuffle read will
        // schedule: total shuffle bytes / advisory size, clamped to
        // [1, numPartitions]. mapStats exist (the stage materialized).
        val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          conf.getConfString("spark.sql.adaptive.advisoryPartitionSizeInBytes", "67108864"))
        val totalBytes = stage.mapStats.map(_.bytesByPartitionId.sum).getOrElse(0L)
        val targetCores = math.min(exchange.numPartitions.toLong,
          math.max(1L, totalBytes / math.max(1L, advisory))).toInt
        val coresPerExecutor =
          session.sparkContext.getConf.getInt("spark.executor.cores", 1)
        val factor = conf.getConfString(
          "spark.graft.finalWriteStage.retainExecutorsFactor", "1.2").toDouble
        val target = targetExecutors(targetCores, coresPerExecutor, factor)
        val active = allocator.activeExecutors()
        val minExecutors = session.sparkContext.getConf
          .getInt("spark.dynamicAllocation.minExecutors", 0)
        // only act when the release is material (reference hasBenefits)
        if (target < active.size && active.size - target > minExecutors) {
          val victims = selectVictims(active,
            allocator.shuffleBytesByExecutor(
              exchange.shuffleDependency.shuffleId, exchange.numPartitions), target)
          if (victims.nonEmpty) allocator.killExecutors(victims, target)
        }
        plan
    }
  }

}
