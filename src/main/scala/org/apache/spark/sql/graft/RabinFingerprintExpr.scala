package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Rabin-Karp polynomial fold over a pre-hashed token array:
  * `fp = ((0*31 + h_0)*31 + h_1)*31 + ... + h_{n-1}` in wrapping
  * 64-bit arithmetic (mod 2^64) — the order-sensitive document
  * fingerprint.
  *
  * Why an expression and not `aggregate(...)`: ANSI mode (the Spark 4
  * default) raises ARITHMETIC_OVERFLOW on the wrapping multiply the
  * polynomial relies on, and a higher-order-function fold runs
  * interpreted per element. This kernel is one tight codegen'd loop
  * with Java's natural mod-2^64 semantics — at 100 TB the fingerprint
  * step is pure map-side CPU.
  *
  * Oracle-checkable: DuckDB re-folds the same chain from the dumped
  * per-token hash arrays using HUGEINT modular arithmetic (d11).
  *
  * Reference for the custom-expression pattern (eval + doGenCode):
  * extensions/spark/kyuubi-extension-spark-3-5/src/main/scala/org/apache/spark/sql/catalyst/expressions/Zorder.scala:29-64.
  */
case class RabinFingerprintExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rabin_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = acc * 31L + arr.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |final int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = $acc * 31L + $c.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RabinFingerprintExpr =
    copy(child = newChild)
}

object RabinFingerprintExpr {
  /** Column API: fingerprint of a pre-hashed (array<long>) token column. */
  def ofHashes(hashes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Bridge.column(RabinFingerprintExpr(Bridge.expression(hashes)))
}
