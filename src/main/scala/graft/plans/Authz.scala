package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Policy-driven row filtering and column masking, the reference's
  * Ranger authz surface re-expressed as plain Catalyst resolution rules
  * (RangerSparkExtension.scala:44-71, RuleApplyRowFilter,
  * RuleApplyDataMaskingStage0): relations matching a policy get wrapped
  * with a Filter (row-level) and a Project of masked output columns
  * (column-level). Masked aliases keep the original exprIds so every
  * upstream reference — joins, aggregates, ORDER BY — resolves
  * unchanged; the query author cannot tell masking happened except by
  * the values.
  *
  * Policies live in [[AuthzPolicies]] (programmatic store standing in
  * for the Ranger REST sync); the acting user comes from the session
  * conf `spark.graft.authz.user` (set by Engine.openSession).
  */
object AuthzPolicies {

  /** @param rowFilters table name → SQL predicate kept rows must satisfy
    * @param masks (table, column) → SQL expression replacing the column
    */
  final case class Policy(
      rowFilters: Map[String, String] = Map.empty,
      masks: Map[(String, String), String] = Map.empty)

  @volatile private var byUser: Map[String, Policy] = Map.empty

  def setPolicy(user: String, policy: Policy): Unit = synchronized {
    byUser = byUser + (user -> policy)
  }
  def clear(): Unit = synchronized { byUser = Map.empty }
  def policyFor(user: String): Option[Policy] = byUser.get(user)
}

class ApplyAuthzPolicies(session: SparkSession) extends Rule[LogicalPlan] {

  private val APPLIED = TreeNodeTag[Boolean]("graft.authz.applied")
  private val MASK_PROJECT = TreeNodeTag[Boolean]("graft.authz.maskProject")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val user = session.conf.getOption("spark.graft.authz.user")
    val policy = user.flatMap(AuthzPolicies.policyFor)
    if (policy.isEmpty) return plan
    val p = policy.get

    // masked columns get FRESH exprIds (reusing the relation's id makes
    // the projection look like a no-op to the optimizer, which deletes
    // it); references already resolved to the old ids are rewritten
    // below, references still unresolved bind to the new project.
    val mapping = scala.collection.mutable.Map.empty[org.apache.spark.sql.catalyst.expressions.ExprId,
      org.apache.spark.sql.catalyst.expressions.AttributeReference]

    val withPolicies = plan.transformUp {
      case rel: LogicalRelation if rel.getTagValue(APPLIED).isEmpty &&
          tableName(rel).exists(t => p.rowFilters.contains(t) ||
            p.masks.keys.exists(_._1 == t)) =>
        rel.setTagValue(APPLIED, true)
        val table = tableName(rel).get
        val parser = session.sessionState.sqlParser

        val masked: LogicalPlan = {
          val maskedCols: Seq[NamedExpression] = rel.output.map { a =>
            p.masks.get((table, a.name)) match {
              case Some(maskSql) =>
                // cast pins the masked value to the column's type so the
                // relation's schema is stable under any policy expression
                val alias = Alias(org.apache.spark.sql.catalyst.expressions.Cast(
                  parser.parseExpression(maskSql), a.dataType,
                  Some(session.sessionState.conf.sessionLocalTimeZone)), a.name)()
                mapping(a.exprId) = org.apache.spark.sql.catalyst.expressions.AttributeReference(
                  a.name, a.dataType, nullable = true)(alias.exprId, a.qualifier)
                alias
              case None => a
            }
          }
          if (maskedCols.exists(_.isInstanceOf[Alias])) {
            val proj = Project(maskedCols, rel)
            proj.setTagValue(MASK_PROJECT, true)
            proj
          } else rel
        }

        p.rowFilters.get(table) match {
          // filter evaluates on the UNMASKED relation (reference stage-0
          // ordering: row policy sees true values, output sees masks)
          case Some(pred) => masked match {
            case proj @ Project(cols, child) =>
              val wrapped = Project(cols, Filter(parser.parseExpression(pred), child))
              wrapped.setTagValue(MASK_PROJECT, true)
              wrapped
            case other => Filter(parser.parseExpression(pred), other)
          }
          case None => masked
        }
    }

    if (mapping.isEmpty) withPolicies else rewriteAbove(withPolicies, mapping.toMap)
  }

  /** Replace references to masked columns' old ids everywhere ABOVE the
    * injected mask projects (their subtrees keep the relation's ids).
    */
  private def rewriteAbove(
      node: LogicalPlan,
      mapping: Map[org.apache.spark.sql.catalyst.expressions.ExprId,
        org.apache.spark.sql.catalyst.expressions.AttributeReference]): LogicalPlan = {
    if (node.getTagValue(MASK_PROJECT).isDefined) node
    else {
      val newNode = node.withNewChildren(node.children.map(rewriteAbove(_, mapping)))
      newNode.transformExpressions {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
            if mapping.contains(a.exprId) => mapping(a.exprId)
      }
    }
  }

  private def tableName(rel: LogicalRelation): Option[String] =
    rel.catalogTable.map(_.identifier.table)
}
