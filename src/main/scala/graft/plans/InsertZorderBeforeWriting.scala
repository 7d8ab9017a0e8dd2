package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, RebalancePartitions, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
import org.apache.spark.sql.graft.ZorderExpr

/** Auto-z-order on insert: when a write target has configured z-order
  * columns (`spark.graft.zorder.cols.<table>=c1,c2`), the insert's
  * query is wrapped with a sort by the interleaved key — every write to
  * the table maintains the clustered layout without anyone running
  * OPTIMIZE (reference InsertZorderBeforeWriting.scala:30,141,161 with
  * conf zorderGlobalSort / rebalanceBeforeZorder).
  *
  * `spark.graft.zorder.globalSort=true` (default) produces a global
  * range layout; false does rebalance + in-partition sort (cheaper, no
  * cross-file ordering).
  */
object InsertZorderBeforeWriting extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case i: InsertIntoHadoopFsRelationCommand if i.catalogTable.isDefined =>
      val table = i.catalogTable.get.identifier.table
      conf.getConfString(s"spark.graft.zorder.cols.$table", "") match {
        case "" => i
        case colsSpec if !alreadyZordered(i.query) =>
          val names = colsSpec.split(",").map(_.trim).filter(_.nonEmpty)
          val attrs = names.flatMap(n => i.query.output.find(_.name == n))
          if (attrs.length != names.length) i // column mismatch: leave untouched
          else {
            val key = SortOrder(ZorderExpr(attrs.toIndexedSeq), Ascending)
            val global = conf.getConfString("spark.graft.zorder.globalSort", "true").toBoolean
            val sorted =
              if (global) Sort(Seq(key), global = true, i.query)
              else Sort(Seq(key), global = false, RebalancePartitions(Nil, i.query))
            i.copy(query = sorted)
          }
        case _ => i
      }
    case other => other
  }

  private def alreadyZordered(query: LogicalPlan): Boolean = query match {
    case s: Sort => s.order.exists(_.child.isInstanceOf[ZorderExpr])
    case _ => false
  }
}

/** Guardrail check rule: bans operations a multi-tenant gateway must
  * not run (reference KyuubiUnsupportedOperationsCheck.scala:25 bans
  * script transformation — arbitrary shell on executors).
  */
object UnsupportedOperationsCheck extends (LogicalPlan => Unit) {
  override def apply(plan: LogicalPlan): Unit =
    plan.foreach {
      case st if st.nodeName == "ScriptTransformation" =>
        throw new UnsupportedOperationException(
          "script transformation is disabled on this gateway")
      case _ =>
    }
}
