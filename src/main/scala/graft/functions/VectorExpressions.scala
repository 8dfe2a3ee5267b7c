package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** X3 — native Catalyst expressions over `ArrayType(FloatType)` embedding
  * columns (SURVEY §2.8/§4: "custom Catalyst work: a codegen'd
  * CosineSimilarity... avoids UDF boxing").
  *
  * Both expressions generate a tight primitive-float Java loop via
  * `doGenCode`, so they run inside whole-stage codegen with zero boxing and
  * no Scala closure dispatch — the difference between a UDF and this is the
  * difference between ~1 GB/s and memory-bandwidth-bound scoring when
  * ranking 100 TB of embeddings.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** cosine(a, b) = dot(a,b) / (|a| |b|); 0.0 when either norm is zero.
  * Arrays of unequal length are scored over the common prefix. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // widen BEFORE the multiply: float*float rounds each product to
      // float, which drifts from any double-path implementation (e.g. a
      // SQL oracle computing over DOUBLE[]) by ~1e-6 over typical dims
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) over the common prefix. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** top_centroids(vec, centroids, n): indices of the `n` centroids most
  * cosine-similar to `vec`, best first — the coarse-quantizer kernel for IVF
  * indexing ([[graft.ext.Ivf]]). One fused primitive-float loop over the
  * whole k×dim centroid matrix per row (codegen'd): assigning 100 TB of
  * embeddings to inverted lists is a single scan with zero boxing, no UDF,
  * no per-centroid expression re-evaluation. */
case class TopCentroids(vec: Expression, centroids: Expression, n: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = centroids
  override def third: Expression = n
  override def prettyName: String = "top_centroids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }
    val centsOk = centroids.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true; case _ => false
    }
    if (!vecOk || !centsOk || n.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<array<float>>, int), got " +
          s"(${vec.dataType.catalogString}, ${centroids.dataType.catalogString}, " +
          s"${n.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(v: Any, cs: Any, nn: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val k = cents.numElements()
    val top = math.min(nn.asInstanceOf[Int], k)
    if (top <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyIntArray)
    val bs = Array.fill(top)(Double.NegativeInfinity)
    val bi = Array.fill(top)(-1)
    var j = 0
    while (j < k) {
      val c = cents.getArray(j)
      val len = math.min(a.numElements(), c.numElements())
      var dot = 0.0; var na = 0.0; var nc = 0.0; var i = 0
      while (i < len) {
        val x = a.getFloat(i); val y = c.getFloat(i)
        dot += x * y; na += x * x; nc += y * y
        i += 1
      }
      val sim = if (na == 0.0 || nc == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nc))
      if (sim > bs(top - 1)) {
        var p = top - 1
        while (p > 0 && bs(p - 1) < sim) { bs(p) = bs(p - 1); bi(p) = bi(p - 1); p -= 1 }
        bs(p) = sim; bi(p) = j
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      bi.filter(_ >= 0))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, cs, nn) => {
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val top = ctx.freshName("top"); val bs = ctx.freshName("bs")
      val bi = ctx.freshName("bi"); val c = ctx.freshName("c")
      val len = ctx.freshName("len"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nc = ctx.freshName("nc")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val sim = ctx.freshName("sim")
      val p = ctx.freshName("p"); val valid = ctx.freshName("valid")
      val out = ctx.freshName("out")
      s"""
         |int $k = $cs.numElements();
         |int $top = Math.min($nn, $k);
         |if ($top < 0) $top = 0;
         |double[] $bs = new double[$top];
         |int[] $bi = new int[$top];
         |java.util.Arrays.fill($bs, Double.NEGATIVE_INFINITY);
         |java.util.Arrays.fill($bi, -1);
         |for (int $j = 0; $top > 0 && $j < $k; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $cs.getArray($j);
         |  int $len = Math.min($a.numElements(), $c.numElements());
         |  double $dot = 0.0, $na = 0.0, $nc = 0.0;
         |  for (int $i = 0; $i < $len; $i++) {
         |    float $x = $a.getFloat($i);
         |    float $y = $c.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nc += $y * $y;
         |  }
         |  double $sim = ($na == 0.0 || $nc == 0.0)
         |    ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nc));
         |  if ($sim > $bs[$top - 1]) {
         |    int $p = $top - 1;
         |    while ($p > 0 && $bs[$p - 1] < $sim) {
         |      $bs[$p] = $bs[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |    }
         |    $bs[$p] = $sim; $bi[$p] = $j;
         |  }
         |}
         |int $valid = 0;
         |while ($valid < $top && $bi[$valid] >= 0) $valid++;
         |int[] $out = java.util.Arrays.copyOf($bi, $valid);
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, centroids = newSecond, n = newThird)
}

/** Column-level entry points + SQL registration. */
object VectorFunctions {

  private def toCol(e: Expression): Column =
    org.apache.spark.sql.GraftBridge.column(e)
  private def toExpr(c: Column): Expression =
    org.apache.spark.sql.GraftBridge.expression(c)

  def cosineSim(a: Column, b: Column): Column =
    toCol(CosineSimilarity(toExpr(a), toExpr(b)))

  def dotProduct(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  def topCentroids(vec: Column, centroids: Column, n: Column): Column =
    toCol(TopCentroids(toExpr(vec), toExpr(centroids), toExpr(n)))

  /** Register `cosine_sim` / `dot_product` for `spark.sql` use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", es => DotProduct(es.head, es(1)), "built-in")
  }
}
