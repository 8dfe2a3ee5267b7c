package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** X98 — KMV (k-minimum-values) theta sketches: mergeable bounded-state
  * distinct sketches that, unlike HLL, support SET ALGEBRA — intersection
  * and difference cardinality estimates between independently-built
  * sketches (Beyer et al. 2007; the DataSketches theta family). The
  * 100 TB use: corpus-overlap measurement (how much of corpus B is
  * already in corpus A, per slice) as a join of two KB-sized sketch
  * tables instead of a corpus×corpus content join.
  *
  * Representation: the k smallest DISTINCT 64-bit key hashes, kept in
  * SIGN-FLIPPED form (`h ^ Long.MinValue`) so signed order == unsigned
  * order over the full hash space. Serialized sketch = int k, int n,
  * then n flipped hashes ascending (little-endian).
  *
  * Estimation: with n < k the sketch saw every distinct hash — counts
  * and intersections are EXACT (the provable regime the x98 oracle face
  * pins). At saturation, theta = the k-th minimum as a fraction u of the
  * hash space and distinct ≈ (k−1)/u; for two sketches the common
  * elements below min(thetaA, thetaB) scale the same way — each sketch
  * is a uniform sample of the hash space below its own theta.
  *
  * Like [[BloomBuildAgg]], input is a PRE-HASHED bigint key
  * (`xxhash64(...)` upstream stays codegen'd); partial aggregation keeps
  * at most k longs per group per map task on the shuffle.
  */
object KmvSketch {
  /** Buffer: bounded sorted set of flipped hashes, capacity k. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()
    def insert(flipped: Long): Unit = {
      if (set.size < k) { set.add(flipped); () }
      else if (flipped < set.last()) {
        if (set.add(flipped)) { set.pollLast(); () }
      }
    }
  }

  def flip(h: Long): Long = h ^ Long.MinValue

  /** Fraction of the 64-bit hash space at or below flipped value `f`,
    * in (0, 1]. */
  def frac(f: Long): Double =
    (f.toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)

  def toBytes(k: Int, mins: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + mins.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(k); bb.putInt(mins.length)
    mins.foreach(bb.putLong)
    bb.array()
  }

  /** (k, flipped minima ascending) */
  def fromBytes(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val k = bb.getInt(); val n = bb.getInt()
    (k, Array.fill(n)(bb.getLong()))
  }

  /** Distinct estimate; exact (as a whole double) when unsaturated. */
  def estimate(bytes: Array[Byte]): Double = {
    val (k, mins) = fromBytes(bytes)
    if (mins.length < k) mins.length.toDouble
    else (k - 1).toDouble / frac(mins.last)
  }

  /** Merge two sketches: union of minima, k = min(kA, kB), keep k
    * smallest — the union sketch (exactly what building over A ∪ B
    * would keep, so unions never lose exactness they both have). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ka, ma) = fromBytes(a); val (kb, mb) = fromBytes(b)
    val k = math.min(ka, kb)
    val merged = (ma ++ mb).distinct.sorted
    toBytes(k, merged.take(k))
  }

  /** |A ∩ B| estimate: common elements below theta = min(thetaA,
    * thetaB), scaled by 1/frac(theta). Exact when BOTH are unsaturated. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double =
    scaledCount(a, b, diff = false)

  /** |A \ B| estimate: A-only elements below theta, scaled. Exact when
    * both are unsaturated. */
  def differenceEstimate(a: Array[Byte], b: Array[Byte]): Double =
    scaledCount(a, b, diff = true)

  private def scaledCount(a: Array[Byte], b: Array[Byte], diff: Boolean): Double = {
    val (ka, ma) = fromBytes(a); val (kb, mb) = fromBytes(b)
    val satA = ma.length >= ka; val satB = mb.length >= kb
    // theta = the smaller sketch horizon; an unsaturated sketch's horizon
    // is the whole space
    val thetaOpt: Option[Long] = (satA, satB) match {
      case (false, false) => None
      case (true, false) => Some(ma.last)
      case (false, true) => Some(mb.last)
      case (true, true) => Some(math.min(ma.last, mb.last))
    }
    val bs = mb.toSet
    // STRICTLY below theta: the k-th minimum itself is the horizon, not
    // part of the uniform sample — matching [[estimate]]'s (k−1)/frac(theta)
    // estimator. Including it (r15's `<=`) over-counted saturated
    // intersect/difference by ~1/k systematically.
    val inA = thetaOpt.fold(ma)(t => ma.filter(_ < t))
    val n = inA.count(h => if (diff) !bs.contains(h) else bs.contains(h))
    thetaOpt.fold(n.toDouble)(t => n.toDouble / frac(t))
  }
}

/** kmv_sketch(hash64, k) → binary sketch of the k minimum hash values. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.Buffer] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint (a pre-hashed key), got ${t.catalogString}")
  }

  override def createAggregationBuffer(): KmvSketch.Buffer =
    new KmvSketch.Buffer(k)

  override def update(buffer: KmvSketch.Buffer, input: InternalRow): KmvSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(KmvSketch.flip(v.asInstanceOf[Long]))
    buffer
  }

  override def merge(buffer: KmvSketch.Buffer, other: KmvSketch.Buffer): KmvSketch.Buffer = {
    other.set.forEach(h => buffer.insert(h))
    buffer
  }

  override def eval(buffer: KmvSketch.Buffer): Any = serialize(buffer)

  override def serialize(buffer: KmvSketch.Buffer): Array[Byte] = {
    val mins = new Array[Long](buffer.set.size)
    var i = 0
    buffer.set.forEach { h => mins(i) = h; i += 1 }
    KmvSketch.toBytes(buffer.k, mins)
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = {
    val (kk, mins) = KmvSketch.fromBytes(bytes)
    val b = new KmvSketch.Buffer(kk)
    mins.foreach(b.insert)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** kmv_estimate(sketch) → double distinct estimate (exact when the
  * sketch never saturated). Interpreted eval only — runs once per GROUP,
  * never in a row-sized hot path. */
case class KmvEstimate(child: Expression) extends UnaryExpression {
  override def prettyName: String = "kmv_estimate"
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    KmvSketch.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.KmvSketch.estimate($b);")
  override protected def withNewChildInternal(c: Expression): KmvEstimate =
    copy(child = c)
}

/** kmv_union(a, b) → merged sketch. */
case class KmvUnion(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "kmv_union"
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.KmvSketch.union($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvUnion = copy(left = l, right = r)
}

/** kmv_intersect_estimate(a, b) → double |A ∩ B| estimate. */
case class KmvIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "kmv_intersect_estimate"
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.intersectEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.KmvSketch.intersectEstimate($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvIntersectEstimate =
    copy(left = l, right = r)
}

/** kmv_difference_estimate(a, b) → double |A \ B| estimate. */
case class KmvDifferenceEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "kmv_difference_estimate"
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.differenceEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.KmvSketch.differenceEstimate($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvDifferenceEstimate =
    copy(left = l, right = r)
}

object KmvFunctions {
  /** Aggregate a pre-hashed (bigint) key column into a KMV sketch. */
  def kmvSketch(hashed: Column, k: Int): Column =
    column(KmvSketchAgg(expression(hashed), k).toAggregateExpression())

  def kmvEstimate(sketch: Column): Column =
    column(KmvEstimate(expression(sketch)))

  def kmvUnion(a: Column, b: Column): Column =
    column(KmvUnion(expression(a), expression(b)))

  def kmvIntersectEstimate(a: Column, b: Column): Column =
    column(KmvIntersectEstimate(expression(a), expression(b)))

  def kmvDifferenceEstimate(a: Column, b: Column): Column =
    column(KmvDifferenceEstimate(expression(a), expression(b)))
}
