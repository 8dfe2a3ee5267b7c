package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** X81 — mojibake repair as a native expression: undo the single most
  * common text corruption in web crawls — UTF-8 bytes mis-decoded as
  * Latin-1/Windows-1252 somewhere upstream ("é" shipped as "Ã©",
  * "'" as "â€™"), then re-encoded and stored as "valid" UTF-8. The
  * corpus-scale consequence is silent: corrupted and clean copies of the
  * same document no longer hash together (breaking X1/X2 dedup), tokens
  * fragment, and language-ID misfires. ftfy is the standard offline
  * fixer; this is its core double-encoding heuristic as a codegen'd
  * kernel that runs at scan speed inside whole-stage codegen.
  *
  * Algorithm (deterministic, conservative): map each char back to a byte
  * through ftfy's "sloppy windows-1252" inversion — cp1252's 0x80–0x9F
  * printables first (that charset is what browser-era mis-decoders used;
  * it is why "â€™" contains '€' and '™'), low-byte identity for every
  * other char ≤ 0xFF (a latin1 mis-decoder surfaces C1 controls, which
  * strict cp1252 would refuse — and with them every 'ß'); if every char
  * maps, at least one byte is ≥ 0x80, and the byte sequence
  * STRICT-decodes as UTF-8 to a different string, that decode IS the
  * repair — iterate (≤ 3 rounds) for double-mojibake. Any failure at any step returns the input untouched:
  * genuine Latin-1-looking text ("café", "für") never forms valid
  * multi-byte UTF-8 (a lone 0xE9/0xFC is an invalid lead byte), so it
  * passes through. The documented residual risk is genuine text that IS
  * byte-identical to mojibake (a standalone "Ã¼" meant literally) —
  * indistinguishable in principle, and the repair direction is the
  * overwhelmingly more frequent reading in crawl data.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def prettyName: String = "fix_mojibake"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      MojibakeKernel.fix(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.MojibakeKernel.fix($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MojibakeKernel {

  private val cp1252 = Charset.forName("windows-1252")
  private val utf8 = Charset.forName("UTF-8")

  /** ftfy's "sloppy windows-1252" inverse: the 0x80–0x9F PRINTABLES map
    * through cp1252 (a mis-decoder shows '€' for byte 0x80), while any
    * other char ≤ 0xFF maps to its own low byte (a latin1 mis-decoder
    * shows the C1 CONTROL U+009F for byte 0x9F — strict cp1252 would
    * refuse it and miss every 'ß'). Built from the JRE's own cp1252
    * table so the two decoders' views agree byte for byte. */
  private val cp1252Inverse: Map[Char, Byte] =
    (0x80 to 0x9f).flatMap { b =>
      val ch = new String(Array(b.toByte), cp1252).charAt(0)
      if (ch != '�' && ch > 0xff) Some(ch -> b.toByte) else None
    }.toMap

  /** Sloppy char→byte inversion of a latin1/cp1252 mis-decode; null when
    * any char fits neither rule (CJK, emoji, U+FFFD from a lossy decode
    * — such text is never the reversible mis-decode of anything). */
  private def toSloppyBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c <= 0xff) out(i) = c.toByte
      else cp1252Inverse.get(c) match {
        case Some(b) => out(i) = b
        case None => return null
      }
      i += 1
    }
    out
  }

  /** Strict UTF-8 decode; null on any malformed/unmappable sequence. */
  private def strictUtf8(bytes: Array[Byte]): String = {
    val dec = utf8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try dec.decode(ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => null }
  }

  /** One repair round; returns the input reference itself when no safe
    * repair applies (reference equality is the loop's stop signal). */
  private def fixOnce(s: String): String = {
    // cheap gate: pure ASCII can't be mojibake (and is the common case —
    // never pay the encoder for it)
    var i = 0
    var hasHigh = false
    while (i < s.length && !hasHigh) {
      if (s.charAt(i) > 0x7f) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s
    val bytes = toSloppyBytes(s)
    if (bytes == null) return s
    val decoded = strictUtf8(bytes)
    // a strict decode of all-single-byte sequences returns the same
    // string — the != check also rejects that no-op
    if (decoded == null || decoded == s) s else decoded
  }

  /** ≤ 3 rounds: repairs double-mojibake (text corrupted twice through
    * the same pipeline), stops at the first round that changes nothing. */
  def fix(s: String): String = {
    var cur = s
    var round = 0
    while (round < 3) {
      val next = fixOnce(cur)
      if (next eq cur) return cur
      cur = next
      round += 1
    }
    cur
  }
}
