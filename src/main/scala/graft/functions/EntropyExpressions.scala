package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** X63 — character-entropy quality signal as a native expression: the
  * standard screen for binary junk, base64 blobs, minified code and
  * key-mash in a crawl. Calibration IN NATS (this kernel's unit):
  * English prose sits near ~2.8–3.0 nats of raw char entropy (≈ 4.1
  * bits); base64 approaches ln 64 ≈ 4.16 nats with a FLAT histogram and
  * no whitespace structure — a ≳1-nat gap the spec's discrimination test
  * exercises; repeated boilerplate collapses toward 0.
  * Complements the X4 family's token-level signals with a sub-token one.
  *
  * Why a native expression (§2.8 preference (b)): the exact computation
  * needs a per-row character histogram. A HOF formulation
  * (`array_distinct` × `filter` counting) is O(distinct·length) per row
  * and allocates the char array twice; this kernel is one O(length) pass
  * per row, generated as a single static call inside whole-stage codegen.
  *
  * Contract: entropy in NATS over Unicode CODE POINTS (surrogate pairs
  * count once), computed as ln N − (Σ c·ln c)/N with the sum taken in
  * ascending code-point order (deterministic summation); empty string →
  * 0. The x63 oracle pins the arithmetic against DuckDB's independent
  * char-histogram SQL.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def prettyName: String = "char_entropy"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    EntropyKernel.charEntropy(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.EntropyKernel.charEntropy($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EntropyKernel {
  /** One pass + sorted-histogram sum; see [[CharEntropy]] for the pinned
    * contract. */
  def charEntropy(s: String): Double = {
    if (s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    var acc = 0.0
    counts.values.forEach(c => acc += c * math.log(c.toDouble))
    math.log(n.toDouble) - acc / n
  }
}

object EntropyFunctions {
  /** Column face: char_entropy(text) in nats. */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      CharEntropy(org.apache.spark.sql.GraftBridge.expression(text)))
}
