package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.resource.{ExecutorResourceRequests, ResourceProfile, ResourceProfileBuilder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec

/** Final-write-stage executor RESOURCE isolation — the reference's
  * InjectCustomResourceProfile + CustomResourceProfileExec
  * (kyuubi-extension-spark-4-2/.../org/apache/spark/sql/
  * InjectCustomResourceProfile.scala:30-58,
  * execution/CustomResourceProfileExec.scala:43-120): the shuffle-heavy
  * stages of a big write want many small executors; the final
  * coalesced write stage often wants FEWER but BIGGER ones (wide rows
  * being buffered into columnar files). Wrapping the final rebalance
  * stage's RDD with a custom Spark ResourceProfile makes the scheduler
  * run the ResultStage on executors with the configured cores/memory —
  * resource isolation per stage, complementing
  * [[FinalStageResourceManager]]'s eager count reduction.
  *
  * Confs (all under the write-stage namespace):
  *   spark.graft.finalWriteStage.resourceIsolation.enabled (false)
  *   spark.graft.finalWriteStage.executorCores     (cluster default)
  *   spark.graft.finalWriteStage.executorMemory    (e.g. "8g")
  *   spark.graft.finalWriteStage.executorMemoryOverhead
  *
  * ResourceProfiles require dynamic allocation on a real cluster
  * manager; in local mode (and when dynamic allocation is off) the
  * wrapper still lands in the plan — observable by tests and EXPLAIN —
  * but passes the RDD through untouched, the reference's
  * `Utils.isTesting` escape.
  */
case class CustomResourceProfileExec(child: SparkPlan,
    executorCores: Int, executorMemoryMiB: Long,
    executorMemoryOverheadMiB: Long) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def supportsColumnar: Boolean = child.supportsColumnar
  override protected def doCanonicalize(): SparkPlan = child.canonicalized

  private def profileSupported: Boolean = {
    val sc = session.sparkContext
    !sc.isLocal && sc.getConf.getBoolean("spark.dynamicAllocation.enabled", false)
  }

  /** The profile this stage would request — built unconditionally so
    * tests can assert the resource arithmetic without a cluster.
    */
  def buildProfile(): ResourceProfile = {
    val reqs = new ExecutorResourceRequests()
      .cores(executorCores)
      .memory(s"${executorMemoryMiB}m")
      .memoryOverhead(s"${executorMemoryOverheadMiB}m")
    new ResourceProfileBuilder().require(reqs).build()
  }

  private def wrap[T](rdd: RDD[T]): RDD[T] =
    if (profileSupported) rdd.withResources(buildProfile()) else rdd

  override protected def doExecute(): RDD[InternalRow] = wrap(child.execute())

  override protected def doExecuteColumnar(): RDD[org.apache.spark.sql.vectorized.ColumnarBatch] =
    wrap(child.executeColumnar())

  override protected def withNewChildInternal(newChild: SparkPlan): CustomResourceProfileExec =
    copy(child = newChild)
}

object InjectCustomResourceProfile {
  /** Test observability: the last (stageId, cores, memMiB, ovhMiB)
    * this rule wrapped — the injection happens inside AQE's stage
    * preparation, unreachable from a test otherwise.
    */
  @volatile var lastInjected: Option[(Int, Int, Long, Long)] = None
}

class InjectCustomResourceProfile(session: SparkSession) extends Rule[SparkPlan] {

  import FinalStageResourceManager.{findFinalRebalanceStage, isWrite}

  override def apply(plan: SparkPlan): SparkPlan = {
    val conf = session.sessionState.conf
    if (!conf.getConfString(
        "spark.graft.finalWriteStage.resourceIsolation.enabled", "false").toBoolean) {
      return plan
    }
    if (!isWrite(plan)) return plan
    findFinalRebalanceStage(plan) match {
      case None => plan
      case Some(stage) =>
        val scConf = session.sparkContext.getConf
        val cores = conf.getConfString("spark.graft.finalWriteStage.executorCores",
          scConf.get("spark.executor.cores", "1")).toInt
        val memMiB = org.apache.spark.network.util.JavaUtils.byteStringAsMb(
          conf.getConfString("spark.graft.finalWriteStage.executorMemory",
            scConf.get("spark.executor.memory", "2g")))
        val ovhMiB = org.apache.spark.network.util.JavaUtils.byteStringAsMb(
          conf.getConfString("spark.graft.finalWriteStage.executorMemoryOverhead",
            scConf.get("spark.executor.memoryOverhead", "1g")))
        inject(plan, stage.id, cores, memMiB, ovhMiB)
    }
  }

  private def inject(plan: SparkPlan, stageId: Int,
      cores: Int, memMiB: Long, ovhMiB: Long): SparkPlan = plan match {
    // idempotence across AQE re-planning: never double-wrap
    case c: CustomResourceProfileExec => c
    case stage: ShuffleQueryStageExec if stage.id == stageId =>
      InjectCustomResourceProfile.lastInjected = Some((stageId, cores, memMiB, ovhMiB))
      CustomResourceProfileExec(stage, cores, memMiB, ovhMiB)
    case other => other.mapChildren(inject(_, stageId, cores, memMiB, ovhMiB))
  }
}
