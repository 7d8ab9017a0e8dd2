package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, expr, not}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.operators.ZorderOptimize

/** Delegating parser adding one statement on top of Spark SQL:
  *
  *   OPTIMIZE <table-or-'path'> [WHERE <predicate>] ZORDER BY c1, c2, ...
  *
  * Everything else goes to the session's default parser — the
  * delegate-parser pattern of the reference's ANTLR grammar
  * (KyuubiSparkSQL.g4:53, KyuubiSparkSQLAstBuilder.scala:35-187),
  * re-expressed as a thin recognizer since one statement does not need
  * a grammar.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.Optimize.findFirstMatchIn(sqlText) match {
      case Some(m) =>
        val target = m.group(1).trim
        val where = Option(m.group(2)).map(_.trim).filter(_.nonEmpty)
        val cols = m.group(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        OptimizeZorderCommand(target, where, cols)
      case None => delegate.parsePlan(sqlText)
    }

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  private[plans] val Optimize =
    """(?is)^\s*OPTIMIZE\s+(.+?)(?:\s+WHERE\s+(.+?))?\s+ZORDER\s+BY\s+(.+?)\s*;?\s*$""".r
}

/** The `OPTIMIZE ... ZORDER BY` command: rewrites the target in
  * z-order. A `'path'` target rewrites the parquet directory (write to
  * a sibling temp dir, then atomic-ish swap); a table target rewrites
  * via localCheckpoint + insert-overwrite. With WHERE, matching rows
  * are clustered first and the rest appended after — every row is
  * preserved, the hot subset gets the layout (reference restricts
  * WHERE to partition predicates: OptimizeZorderCommand.scala:32-60).
  */
case class OptimizeZorderCommand(target: String, where: Option[String], cols: Seq[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val isPath = (target.startsWith("'") && target.endsWith("'")) ||
      (target.startsWith("\"") && target.endsWith("\""))
    val zcols = cols.map(col)

    def clusteredOf(df: org.apache.spark.sql.DataFrame) = where match {
      case None => ZorderOptimize.cluster(df, zcols)
      case Some(p) =>
        ZorderOptimize.cluster(df.filter(expr(p)), zcols)
          .unionAll(df.filter(not(expr(p))))
    }

    if (isPath) {
      val path = target.substring(1, target.length - 1)
      val tmp = path.stripSuffix("/") + "_zorder_tmp"
      clusteredOf(spark.read.parquet(path)).write.mode("overwrite").parquet(tmp)
      val hconf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
    } else {
      val materialized = clusteredOf(spark.table(target)).localCheckpoint()
      try materialized.write.mode("overwrite").insertInto(target)
      finally graft.operators.SketchRegistry.freeLocalCheckpoint(materialized)
    }
    Seq.empty
  }
}
