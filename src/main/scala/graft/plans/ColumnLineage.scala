package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Column-level lineage: maps each output column of a plan to the set
  * of source `table.column`s it derives from, by a bottom-up walk that
  * resolves attribute references through projections, aggregates,
  * windows, generators, unions and pass-through operators (reference:
  * kyuubi-spark-lineage/.../SparkSQLLineageParseHelper.scala:56,203 —
  * same outcome, independent walk).
  */
object ColumnLineage {

  /** output column name → source columns ("table.column"). */
  def of(plan: LogicalPlan): Map[String, Set[String]] = {
    val sources = attrSources(plan)
    plan.output.map(a => a.name -> sources.getOrElse(a.exprId, Set.empty[String])).toMap
  }

  private def leafName(plan: LogicalPlan): String = plan match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.unquotedString)
        .getOrElse(lr.relation.toString.takeWhile(_ != '('))
    case ds: DataSourceV2ScanRelation => ds.relation.table.name()
    case lv: LocalRelation => "localtable"
    case other => other.nodeName.toLowerCase
  }

  private def fromExpr(
      ne: NamedExpression, childMap: Map[ExprId, Set[String]]): (ExprId, Set[String]) =
    ne.exprId -> ne.references.toSeq
      .flatMap(r => childMap.getOrElse(r.exprId, Set.empty[String])).toSet

  private def attrSources(plan: LogicalPlan): Map[ExprId, Set[String]] = plan match {
    case leaf: LeafNode =>
      val name = leafName(leaf)
      leaf.output.map(a => a.exprId -> Set(s"$name.${a.name}")).toMap

    case p: Project =>
      val child = attrSources(p.child)
      child ++ p.projectList.map(fromExpr(_, child)).toMap

    case a: Aggregate =>
      val child = attrSources(a.child)
      child ++ a.aggregateExpressions.map(fromExpr(_, child)).toMap

    case w: Window =>
      val child = attrSources(w.child)
      child ++ w.windowExpressions.map(fromExpr(_, child)).toMap

    case g: Generate =>
      val child = attrSources(g.child)
      val genSources = g.generator.references.toSeq
        .flatMap(r => child.getOrElse(r.exprId, Set.empty[String])).toSet
      child ++ g.generatorOutput.map(a => a.exprId -> genSources).toMap

    case u: Union =>
      val childMaps = u.children.map(attrSources)
      val positional = u.children.map(_.output)
      u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> positional.zip(childMaps).flatMap { case (cols, m) =>
          if (i < cols.length) m.getOrElse(cols(i).exprId, Set.empty[String]) else Set.empty[String]
        }.toSet
      }.toMap ++ childMaps.fold(Map.empty)(_ ++ _)

    case s: SubqueryAlias =>
      attrSources(s.child)

    case other =>
      // Filter / Join / Sort / Limit / Distinct / RepartitionOperation...
      // outputs are child attributes, pass through by exprId
      other.children.map(attrSources).fold(Map.empty)(_ ++ _)
  }
}
