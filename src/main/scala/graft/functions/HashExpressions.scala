package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sketch kernels as native codegen'd expressions (SURVEY §2.8 X2).
  *
  * The DataFrame-level MinHash/SimHash operators hash each shingle/token to
  * 64 bits ONCE with the builtin `xxhash64`, then hand the long-array to
  * these expressions, which run the per-permutation / per-bit inner loops as
  * tight primitive Java — the loops are O(numPerm·|shingles|) and
  * O(64·|tokens|) respectively, exactly the part where interpreted
  * higher-order-function evaluation (±1 µs per element) would dominate a
  * 100 TB scan.
  *
  * Permutations use the splitmix64 finalizer over seed-offset inputs —
  * a public-domain mixing function with full 64-bit avalanche.
  */
object HashKernels {
  final val Golden = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer (public domain, Stafford variant 13). */
  @inline def mix(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Java source of [[mix]] for codegen. */
  def mixJava(v: String): String =
    s"""{ long z = $v;
       |  z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L;
       |  z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL;
       |  z = z ^ (z >>> 31); $v = z; }""".stripMargin
}

/** minhash_signature(hashes) → array<long> of length `numPerm`:
  * element k = min over input hashes h of mix(h + (k+1)·golden). Empty
  * input → array of Long.MaxValue (never collides with a real signature). */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < numPerm) {
        val v = HashKernels.mix(h + (k + 1) * HashKernels.Golden)
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$numPerm];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $k = 0; $k < $numPerm; $k++) {
         |    long $v = $h + ($k + 1) * ${HashKernels.Golden}L;
         |    ${HashKernels.mixJava(v)}
         |    if ($v < $out[$k]) $out[$k] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash64(hashes) → 64-bit Charikar fingerprint of a token-hash array:
  * bit b of the result is 1 iff Σ over tokens of (bit b of hash ? +1 : -1)
  * is positive. Empty input → 0. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val w = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) w(b) += 1 else w(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (w(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val n = ctx.freshName("n"); val w = ctx.freshName("w")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $w = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $w[$b]++; else $w[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($w[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** jaccard_sorted(a, b) → |A∩B| / |A∪B| of two SORTED array<long> sets
  * (distinct elements, ascending). Single merge pass — O(|a|+|b|) with no
  * per-element allocation, vs the O(n·m)-ish generic array_intersect /
  * array_union path over strings. Empty∪empty → 0.0. */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "jaccard_sorted"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val inter = ctx.freshName("inter"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val u = ctx.freshName("u")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) $i++; else $j++;
         |}
         |int $u = $n + $m - $inter;
         |${ev.value} = ($u == 0) ? 0.0 : (double) $inter / $u;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points. */
object HashFunctions {
  import org.apache.spark.sql.GraftBridge

  def minhashSignature(hashes: Column, numPerm: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(hashes), numPerm))

  def simhash64(hashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(hashes)))

  def jaccardSorted(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSorted(GraftBridge.expression(a), GraftBridge.expression(b)))
}
