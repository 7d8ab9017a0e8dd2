package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Winnowing selection kernel (Schleimer et al., SIGMOD 2003): over an
  * array of k-gram hashes, emit each `window`-wide window's minimum —
  * rightmost occurrence on ties — encoded as `pos · 2^32 + fp`
  * (fingerprints are 32-bit hash prefixes, so the pack is lossless for
  * any document under 2^31 grams; callers unpack with
  * shiftright/mask). 32 fingerprint bits matter downstream: a 16-bit
  * fp space (65,536 keys) makes the candidate-pair join's posting
  * lists grow linearly with corpus size — quadratic pair blowup at
  * corpus scale — while 32 bits keep random collisions negligible
  * until ~2^16 docs share a gram hash. Consecutive windows usually
  * re-pick the same (pos, fp); those duplicates are dropped inline — a
  * given position appears only in `window` contiguous windows, so
  * adjacent-dedup equals global distinct.
  *
  * Why a kernel: the composed higher-order-function form re-evaluated
  * the window slice per use interpreted, and a plain column reference
  * to the hash array got INLINED into every use by the optimizer —
  * re-hashing all grams per window, O(n²·md5) per document (703 s at
  * sf0.1). This is one tight O(n·w) codegen'd loop (7 s composed with
  * lambda-binding; sub-second as a kernel), identical in eval and
  * codegen.
  */
case class WinnowExpr(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(window > 0, "window must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    new GenericArrayData(WinnowExpr.winnow(
      Array.tabulate(n)(arr.getLong), window))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val hs = ctx.freshName("hs")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $c.numElements();
         |final long[] $hs = new long[$n];
         |for (int $i = 0; $i < $n; $i++) { $hs[$i] = $c.getLong($i); }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  org.apache.spark.sql.graft.WinnowExpr.winnow($hs, $window));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {
  /** Shared by eval and codegen: window minima, rightmost on ties,
    * adjacent-deduped, encoded pos·2^32 + fp (fp must be < 2^32).
    */
  def winnow(hs: Array[Long], window: Int): Array[Long] = {
    val n = hs.length
    if (n == 0) return Array.emptyLongArray
    val nWindows = math.max(n - window, 0) + 1
    val out = new Array[Long](nWindows)
    var m = 0
    var lastEnc = -1L
    var i = 0
    while (i < nWindows) {
      val end = math.min(i + window, n)
      var best = hs(i)
      var bestPos = i
      var j = i + 1
      while (j < end) {
        if (hs(j) <= best) { best = hs(j); bestPos = j } // <= → rightmost
        j += 1
      }
      val enc = (bestPos.toLong << 32) | best
      if (enc != lastEnc) { out(m) = enc; m += 1; lastEnc = enc }
      i += 1
    }
    java.util.Arrays.copyOf(out, m)
  }

  def of(hashes: Column, window: Int): Column =
    Bridge.column(WinnowExpr(Bridge.expression(hashes), window))
}
