package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass every
  * multilingual corpus pipeline runs before hashing/dedup: the same
  * text can arrive as composed (`é`) or decomposed (`e` + U+0301)
  * codepoints, and every fingerprint/minhash/exact-dedup key built on
  * the raw bytes silently treats them as different documents.
  *
  * Spark ships no normalization function, so this is a native kernel:
  * interpreted eval and codegen both call the one static helper (the
  * JDK's `java.text.Normalizer`, Unicode-standard NFC), so the two
  * paths cannot diverge. Fast path: `Normalizer.isNormalized` skips
  * the rebuild for already-NFC text (virtually all ASCII corpora) —
  * at 100 TB this is pure map-side CPU with a near-free common case.
  *
  * Oracle: DuckDB's `nfc_normalize` implements the same Unicode
  * algorithm, so normalized bytes (and everything derived — lengths,
  * md5s, dedup keys) compare exactly (d40).
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NfcNormalizeExpr.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Shared by eval and codegen. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column = Bridge.column(NfcNormalizeExpr(Bridge.expression(c)))
}
