package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Single-pass MinHash signature over a pre-hashed shingle array.
  *
  * Input: array<long> of (distinct) shingle hashes. Output: array<long>
  * of `k` signature slots, where slot i holds min over the shingles of
  * the i-th derived hash `h_i(x) = A_i * x + B_i` (wrapping 64-bit
  * arithmetic; A_i odd, both derived from splitmix64(i) so the family
  * is deterministic across executors and rounds).
  *
  * Why an expression and not k `array_min(transform(...))` columns: the
  * composed form re-walks the array k times and re-hashes the shingle
  * strings each walk — O(k·n) string hashes per document. This kernel
  * hashes each shingle string once (caller does xxhash64 map-side) and
  * then does k multiply-adds per element in one tight loop, inside
  * whole-stage codegen. At 100 TB the signature step is pure map-side
  * CPU; this is the difference between hours and minutes.
  *
  * Reference for the custom-expression pattern (eval + doGenCode):
  * extensions/spark/kyuubi-extension-spark-3-5/src/main/scala/org/apache/spark/sql/catalyst/expressions/Zorder.scala:29-64.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k > 0 && k <= 4096, s"k must be in (0, 4096], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_signature"

  // Derived-hash coefficients: splitmix64 stream, A forced odd so that
  // x -> A*x is a bijection on Z/2^64 (no entropy loss from the multiply).
  @transient private lazy val (coefA: Array[Long], coefB: Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = MinHashSignatureExpr.splitmix64(2L * i + 1) | 1L
      b(i) = MinHashSignatureExpr.splitmix64(2L * i + 2)
      i += 1
    }
    (a, b)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = coefA(i) * h + coefB(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", coefA, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", coefB, "long[]")
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |final int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $h = $c.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    final long $v = $aRef[$i] * $h + $bRef[$i];
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

object MinHashSignatureExpr {

  /** splitmix64 finalizer — the standard 64-bit mixer (public domain,
    * Steele et al., "Fast Splittable Pseudorandom Number Generators").
    */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column API: signature of a pre-hashed (array<long>) shingle column. */
  def ofHashes(hashes: Column, k: Int): Column =
    Bridge.column(MinHashSignatureExpr(Bridge.expression(hashes), k))
}
