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
}
