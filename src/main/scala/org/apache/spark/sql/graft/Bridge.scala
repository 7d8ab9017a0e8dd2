package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge for graft's custom expressions.
  *
  * Spark 4 hides the Column(expr) constructor behind the classic
  * ExpressionUtils (private[sql]); this shim re-exports it for graft
  * code, the same way the reference keeps its Spark-internal helpers in
  * an org.apache.spark.sql.* package (reference:
  * externals/kyuubi-spark-sql-engine/src/main/scala/org/apache/spark/sql/kyuubi/SparkDatasetHelper.scala:36).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column → catalyst Expression via the classic converter: unlike
    * [[expression]] (which can leave an opaque, Unevaluable
    * ColumnNodeExpression wrapper when the Column was built from
    * `functions._` nodes), this converts the whole node tree to plain
    * catalyst expressions — any UnresolvedFunction/lambda inside
    * becomes a standard unresolved expression the SQL analyzer then
    * resolves. Needed for SparkSessionExtensions.injectFunction
    * builders that compose `functions._` helpers.
    */
  def analyzableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** InternalRow RDD → DataFrame without a Row round-trip (the
    * executor-side path custom operators need).
    */
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
