package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** X44 — Jaro-Winkler string similarity as a native Catalyst expression.
  *
  * The record-linkage workhorse Spark lacks (`levenshtein` is built in,
  * Jaro-Winkler is not): fuzzy entity matching across catalogs, near-dup
  * name detection, noisy-key joins. Implemented as a codegen'd
  * `BinaryExpression` whose generated code is a single static call into
  * [[JaroWinklerImpl]] — it stays inside whole-stage codegen (no UDF
  * boxing, no Scala closure dispatch), and the kernel allocates only two
  * small boolean arrays per comparison.
  *
  * Semantics pinned to the de-facto standard (and to DuckDB's
  * `jaro_winkler_similarity`, the cross-engine oracle face):
  *   - equal strings → 1.0; either side empty → 0.0;
  *   - match window = max(len)/2 − 1 (min 0), half-transpositions;
  *   - Winkler boost only when jaro ≥ 0.7, prefix capped at 4,
  *     scale 0.1: jw = j + min(prefix,4)·0.1·(1−j).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler_sim"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerImpl.similarity(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.similarity(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared kernel for interpreted eval and generated code. Operates on
  * Java chars — correct for the BMP; the synthetic corpus is ASCII. */
object JaroWinklerImpl {

  /** Classic Jaro similarity. */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window + 1, l2)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: matched chars out of relative order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
  }

  /** Jaro-Winkler with boost threshold 0.7, prefix scale 0.1, max prefix 4. */
  def similarity(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j < 0.7) return j
    var prefix = 0
    val n = math.min(math.min(s1.length, s2.length), 4)
    while (prefix < n && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }
}
