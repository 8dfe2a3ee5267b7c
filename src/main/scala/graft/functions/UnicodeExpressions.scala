package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** X53 — Unicode text normalization as native Catalyst expressions: the
  * first cleaning step of any multilingual corpus pipeline (mixed NFC/NFD
  * sources hash and dedup differently until canonicalized; accent
  * stripping feeds search keys and crude transliteration). Spark has no
  * built-in for either; a UDF would box every row. Both expressions
  * generate a single static kernel call inside whole-stage codegen.
  *
  * Semantics pinned cross-engine: `NfcNormalize` ≡ DuckDB
  * `nfc_normalize` (both implement Unicode NFC — java.text.Normalizer
  * here, utf8proc there); `StripAccents` ≡ DuckDB `strip_accents` for
  * combining-mark diacritics (NFD, drop category Mn) — the x53 oracle
  * hash-checks both on decomposed inputs.
  */
abstract class UnicodeUnaryExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
}

/** Canonical composition (Unicode NFC). */
case class NfcNormalize(child: Expression) extends UnicodeUnaryExpression {
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      UnicodeKernels.nfc(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.UnicodeKernels.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Diacritic removal: NFD, drop combining marks (category Mn). */
case class StripAccents(child: Expression) extends UnicodeUnaryExpression {
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      UnicodeKernels.stripAccents(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.UnicodeKernels.stripAccents($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeKernels {
  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  private val marks = "\\p{Mn}+".r

  def stripAccents(s: String): String = {
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    var i = 0; var hasMark = false
    while (i < d.length && !hasMark) {
      if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    // no combining marks anywhere: return the INPUT untouched (not the
    // NFD form — Hangul etc. decompose without marks and must pass through)
    if (!hasMark) s else marks.replaceAllIn(d, "")
  }
}
