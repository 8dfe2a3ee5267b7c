package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** double_sort_bits(v) → bigint whose SIGNED order equals the double's
  * value order (the radix-sort total-order transform): positive doubles
  * keep their IEEE-754 bit pattern (already value-ordered), negative ones
  * flip the 63 magnitude bits so a more negative value maps to a smaller
  * long, and every negative stays below every non-negative.
  *
  * Why: a prefix of these bits is a MONOTONE bucket id that needs no
  * min/max statistics pass — the basis of the single-extra-pass
  * distributed selection in [[graft.ext.Quantiles]]. Any bucketing scheme
  * derived from data statistics costs one more sequential scan; the bit
  * pattern is a property of the value itself. NaN canonicalizes (via
  * doubleToLongBits) above +Infinity, matching Spark's NaN-largest sort
  * order; -0.0 maps one below +0.0, consistent with both being equal
  * under Spark's value comparison (a bucket boundary between them is
  * harmless — bucketing only requires monotonicity, not injectivity).
  */
case class DoubleSortBits(child: Expression) extends UnaryExpression {

  override def prettyName: String = "double_sort_bits"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    if (bits >= 0L) bits else bits ^ 0x7fffffffffffffffL
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("bits")
      s"""long $b = Double.doubleToLongBits($v);
         |${ev.value} = $b >= 0L ? $b : ($b ^ 0x7fffffffffffffffL);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleSortBits =
    copy(child = newChild)
}
