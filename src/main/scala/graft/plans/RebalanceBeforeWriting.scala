package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, RebalancePartitions, Repartition, RepartitionByExpression, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.DataWritingCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand

/** Small-file prevention: interpose `RebalancePartitions` between an
  * insert and its query so AQE sizes the write's output partitions to
  * the advisory partition size instead of whatever parallelism the
  * query ended with (reference: RebalanceBeforeWriting.scala:31 — every
  * production insert path hits this; without it a 2000-task query
  * writing a small table produces 2000 tiny files, the classic
  * 100 TB-lake operational failure).
  *
  * Partitioned writes rebalance ON the partition columns so each
  * dynamic partition's rows co-locate (one file per partition value
  * instead of tasks × partitions). Disabled with
  * `spark.graft.rebalanceBeforeWrite=false`; plans that already end in
  * a rebalance/sort are left alone (a user-requested layout wins).
  */
object RebalanceBeforeWriting extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rebalanceBeforeWrite", "true").toBoolean

  // Any explicit user layout wins — including repartition(n)/coalesce
  // and repartition(cols)/repartitionByRange. Injecting a rebalance on
  // top of those isn't merely redundant: the optimizer's
  // CollapseRepartition keeps the OUTER node, so the injected rebalance
  // would silently delete the layout the user asked for. The layout
  // survives per-row operators, so look through Project/Filter too —
  // `repartition(8).withColumn(...)` is still an explicit layout.
  private def needsRebalance(query: LogicalPlan): Boolean = query match {
    case _: RebalancePartitions => false
    case _: Repartition => false
    case _: RepartitionByExpression => false
    case _: Sort => false
    case p: org.apache.spark.sql.catalyst.plans.logical.Project => needsRebalance(p.child)
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter => needsRebalance(f.child)
    case _ => true
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan match {
      case i: InsertIntoHadoopFsRelationCommand if needsRebalance(i.query) =>
        val partitionAttrs = i.partitionColumns.flatMap(pc =>
          i.query.output.find(_.name == pc.name))
        // Advisory larger than the session's (64m default): the final
        // write stage wants bigger output files than intermediate
        // shuffles. Carrying it on the node also lets
        // [[RemoveRebalanceShuffle]] distinguish this injected insurance
        // shuffle from a user-requested fine-grained rebalance.
        val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          conf.getConfString("spark.graft.rebalanceBeforeWrite.advisorySize", "256m"))
        i.copy(query = RebalancePartitions(partitionAttrs, i.query, None, Some(advisory)))
      case other => other
    }
  }
}

/** `DROP TABLE/VIEW x` → `... IF EXISTS x`: multi-tenant gateways see
  * constant speculative DROPs from ETL clients; failing them poisons
  * shared session state for nothing (reference DropIgnoreNonexistent.scala:27).
  * Opt-in: `spark.graft.dropIgnoreNonexistent=true`.
  */
object DropIgnoreNonexistent extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{DropTable, DropView, NoopCommand}
  import org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView

  private def enabled: Boolean =
    conf.getConfString("spark.graft.dropIgnoreNonexistent", "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan match {
      case d @ DropTable(_, false, _) => d.copy(ifExists = true)
      case d @ DropView(_, false) => d.copy(ifExists = true)
      case other => other
    }
  }
}
