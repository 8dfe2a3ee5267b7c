package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** vector_moments(vec): first and second moments of an `array<float|double>`
  * column in ONE aggregation pass — count, per-dimension sums, and the
  * upper-triangular sums of pairwise products — i.e. everything a
  * covariance matrix (and therefore PCA) needs, accumulated
  * map-side and merged associatively, so a 100 TB corpus ships exactly
  * d + d(d+1)/2 + 1 doubles per partition to the reducer regardless of
  * row count. The naive alternatives either explode d² terms per row
  * through a groupBy (row-count-sized shuffle) or build d(d+1)/2 separate
  * aggregate expressions (Catalyst chokes at dim ≥ 64); this is the same
  * TypedImperativeAggregate shape as [[TopKByScore]].
  *
  * Dimension is discovered from the first non-null row; rows whose length
  * differs are rejected (a corrupt-embedding guard, same contract as the
  * vector kernels in [[CosineSimilarity]] which min-length instead —
  * moments must not silently mix dimensionalities or the covariance is
  * garbage).
  *
  * Result: struct<n: bigint, sums: array<double>, prods: array<double>>
  * with prods in row-major upper-triangular order ((0,0), (0,1) … (0,d-1),
  * (1,1) …).
  */
case class VectorMoments(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentsBuffer] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_moments"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false)),
    StructField("prods", ArrayType(DoubleType, containsNull = false))))

  private lazy val elementIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): MomentsBuffer = new MomentsBuffer()

  override def update(buffer: MomentsBuffer, input: InternalRow): MomentsBuffer = {
    val a = vec.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      val d = arr.numElements()
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        x(i) = if (elementIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buffer.add(x)
    }
    buffer
  }

  override def merge(buffer: MomentsBuffer, other: MomentsBuffer): MomentsBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MomentsBuffer): Any =
    InternalRow(buffer.n,
      new GenericArrayData(if (buffer.sums == null) Array.empty[Double] else buffer.sums),
      new GenericArrayData(if (buffer.prods == null) Array.empty[Double] else buffer.prods))

  override def serialize(buffer: MomentsBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): MomentsBuffer =
    MomentsBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

/** Mutable moments accumulator; dim fixed by the first vector seen. */
final class MomentsBuffer(
    var n: Long = 0L,
    var sums: Array[Double] = null,
    var prods: Array[Double] = null) {

  def dim: Int = if (sums == null) 0 else sums.length

  def add(x: Array[Double]): Unit = {
    if (sums == null) {
      sums = new Array[Double](x.length)
      prods = new Array[Double](x.length * (x.length + 1) / 2)
    }
    require(x.length == sums.length,
      s"vector_moments: dimension ${x.length} != ${sums.length} seen earlier")
    n += 1
    var i = 0
    var t = 0
    while (i < x.length) {
      sums(i) += x(i)
      var j = i
      while (j < x.length) {
        prods(t) += x(i) * x(j)
        t += 1
        j += 1
      }
      i += 1
    }
  }

  def mergeFrom(other: MomentsBuffer): Unit = {
    if (other.n == 0) return
    if (n == 0) {
      n = other.n
      sums = other.sums.clone()
      prods = other.prods.clone()
      return
    }
    require(other.dim == dim,
      s"vector_moments: merging dimension ${other.dim} != $dim")
    n += other.n
    var i = 0
    while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
    var t = 0
    while (t < prods.length) { prods(t) += other.prods(t); t += 1 }
  }

  def toBytes: Array[Byte] = {
    val d = dim
    val bb = ByteBuffer.allocate(8 + 4 + 8 * d + 8 * (if (d == 0) 0 else prods.length))
    bb.putLong(n)
    bb.putInt(d)
    if (d > 0) {
      sums.foreach(bb.putDouble)
      prods.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object MomentsBuffer {
  def fromBytes(bytes: Array[Byte]): MomentsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val d = bb.getInt
    if (d == 0) new MomentsBuffer(n)
    else {
      val sums = Array.fill(d)(bb.getDouble)
      val prods = Array.fill(d * (d + 1) / 2)(bb.getDouble)
      new MomentsBuffer(n, sums, prods)
    }
  }
}

object MomentsFunctions {
  /** Aggregate Column: one-pass vector moments of `vec`. */
  def vectorMoments(vec: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      VectorMoments(org.apache.spark.sql.GraftBridge.expression(vec))
        .toAggregateExpression())
}
