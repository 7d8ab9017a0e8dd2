package graft.plans

import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, UnresolvedIdentifier}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.DataWritingCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Column-level lineage: maps each output column of a plan to the set
  * of source `table.column`s it derives from, by a bottom-up walk that
  * resolves attribute references through projections, aggregates,
  * windows, generators, unions and pass-through operators (reference:
  * kyuubi-spark-lineage/.../SparkSQLLineageParseHelper.scala:56,203 —
  * same outcome, independent walk).
  *
  * Write commands (CTAS, INSERT INTO — v1 `DataWritingCommand`s and
  * v2 `V2WriteCommand`/`CreateTableAsSelect`, reference
  * SparkSQLLineageParseHelper.scala:257-311) map each TARGET column
  * (`target_table.column`) to the sources feeding it, so a LineageEvent
  * for `INSERT INTO t2 SELECT a FROM t1` names `t2.a ← {t1.a}`.
  */
object ColumnLineage {

  /** output column name → source columns ("table.column"). For write
    * commands the keys are the target's `table.column` names.
    */
  def of(plan: LogicalPlan): Map[String, Set[String]] =
    writeLineage(plan).getOrElse {
      val sources = attrSources(plan)
      plan.output.map(a => a.name -> sources.getOrElse(a.exprId, Set.empty[String])).toMap
    }

  /** Target-column lineage for write commands; None for reads. */
  private def writeLineage(plan: LogicalPlan): Option[Map[String, Set[String]]] = {
    def bind(target: String, query: LogicalPlan,
        outNames: Seq[String]): Map[String, Set[String]] = {
      val sources = attrSources(query)
      outNames.zip(query.output).map { case (n, a) =>
        s"$target.$n" -> sources.getOrElse(a.exprId, Set.empty[String])
      }.toMap
    }
    plan match {
      // v1 writes: InsertIntoHadoopFsRelationCommand, CTAS commands,
      // InsertIntoHiveTable… — all DataWritingCommands carrying their
      // CatalogTable (or output path) somewhere in the product
      case cmd: DataWritingCommand =>
        val target = cmd.productIterator.flatMap {
          case ct: CatalogTable => Iterator(ct.identifier.unquotedString)
          case Some(ct: CatalogTable) => Iterator(ct.identifier.unquotedString)
          case _ => Iterator.empty
        }.nextOption().orElse(cmd.productIterator.collectFirst {
          case p: org.apache.hadoop.fs.Path => p.toString
        }).getOrElse("unknown_target")
        Some(bind(target, cmd.query, cmd.outputColumnNames))

      // v2 writes: AppendData / OverwriteByExpression /
      // OverwritePartitionsDynamic against a resolved NamedRelation
      case w: V2WriteCommand =>
        val names =
          if (!w.isByName && w.table.output.nonEmpty) w.table.output.map(_.name)
          else w.query.output.map(_.name)
        Some(bind(w.table.name, w.query, names))

      // v2 CTAS/RTAS: the target table does not exist yet — its
      // columns ARE the query's output columns
      case c: CreateTableAsSelect =>
        Some(bind(identifierName(c.name), c.query, c.query.output.map(_.name)))
      case r: ReplaceTableAsSelect =>
        Some(bind(identifierName(r.name), r.query, r.query.output.map(_.name)))

      // a not-yet-resolved INSERT INTO (parsed plans handed to `of`
      // directly, e.g. in tests) — resolve the target leaf's name
      case i: InsertIntoStatement =>
        val names =
          if (i.userSpecifiedCols.nonEmpty) i.userSpecifiedCols
          else if (i.table.output.nonEmpty) i.table.output.map(_.name)
          else i.query.output.map(_.name)
        Some(bind(leafName(i.table), i.query, names))

      // CREATE VIEW v AS SELECT … / ALTER VIEW v AS SELECT …: the view
      // IS a write target — its columns map to the defining query's
      // sources (reference SparkSQLLineageParseHelper.scala:213,226)
      case v: org.apache.spark.sql.execution.command.CreateViewCommand =>
        val names =
          if (v.userSpecifiedColumns.nonEmpty) v.userSpecifiedColumns.map(_._1)
          else v.plan.output.map(_.name)
        Some(bind(v.name.unquotedString, v.plan, names))
      case a: org.apache.spark.sql.execution.command.AlterViewAsCommand =>
        Some(bind(a.name.unquotedString, a.query, a.query.output.map(_.name)))

      // MERGE INTO: every assignment in every branch (matched, not
      // matched, not matched by source) maps its target column to the
      // assigned expression's sources — which may live in the SOURCE
      // relation (UPDATE SET t.c = s.x), the TARGET (SET t.c = t.c+1),
      // or both; star actions map positionally (reference
      // SparkSQLLineageParseHelper.scala:368)
      case m: MergeIntoTable =>
        val target = leafName(m.targetTable)
        val sources = attrSources(m.sourceTable) ++ attrSources(m.targetTable)
        def ofAssignments(as: Seq[Assignment]): Seq[(String, Set[String])] =
          as.map { asg =>
            val col = asg.key match {
              case ne: NamedExpression => ne.name
              case other => other.sql
            }
            s"$target.$col" -> asg.value.references.toSeq
              .flatMap(r => sources.getOrElse(r.exprId, Set.empty[String])).toSet
          }
        def star: Seq[(String, Set[String])] =
          m.targetTable.output.zip(m.sourceTable.output).map { case (t, s) =>
            s"$target.${t.name}" -> sources.getOrElse(s.exprId, Set.empty[String])
          }
        val pairs = (m.matchedActions ++ m.notMatchedActions ++
          m.notMatchedBySourceActions).flatMap {
          case u: UpdateAction => ofAssignments(u.assignments)
          case i: InsertAction => ofAssignments(i.assignments)
          case _: UpdateStarAction => star
          case _: InsertStarAction => star
          case _ => Nil // DeleteAction writes no column
        }
        // a column assigned in several branches derives from the UNION
        // of the branches' sources
        Some(pairs.groupBy(_._1).map { case (k, vs) =>
          k -> vs.iterator.flatMap(_._2).toSet
        })

      case _ => None
    }
  }

  private def identifierName(name: LogicalPlan): String = name match {
    case r: ResolvedIdentifier => r.identifier.toString
    case u: UnresolvedIdentifier => u.nameParts.mkString(".")
    case other => other.nodeName.toLowerCase
  }

  private def leafName(plan: LogicalPlan): String = plan match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.unquotedString)
        .getOrElse(lr.relation.toString.takeWhile(_ != '('))
    case ds: DataSourceV2ScanRelation => ds.relation.table.name()
    case dr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      dr.table.name()
    case lv: LocalRelation => "localtable"
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
      u.multipartIdentifier.mkString(".")
    case s: SubqueryAlias => leafName(s.child)
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
