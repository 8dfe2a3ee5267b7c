package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** top_k_by(score, id, k): exact per-group top-k as a single-pass aggregate
  * (the TypedImperativeAggregate SURVEY §4 calls out for similarity
  * accumulation).
  *
  * Each partition keeps a bounded k-element min-heap per group
  * (partial aggregation), merge combines heaps — so the shuffle carries at
  * most k (score, id) pairs per group per map task instead of every scored
  * row. Against the window top-k plan (WindowGroupLimit) this removes the
  * per-partition sort and shrinks the exchange payload to the heap
  * serialization; at |corpus| × |queries| scoring scale that is the
  * difference between shuffling the scored matrix and shuffling k rows.
  *
  * Result: array<struct<id, score>> ordered best-first (score desc, id asc
  * for determinism).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val kVal: Int = k.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(score, id, k)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType || id.dataType != LongType || k.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint, int literal), got " +
          s"(${score.dataType.catalogString}, ${id.dataType.catalogString}, ${k.dataType.catalogString})")
    else if (!k.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a literal")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(kVal)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val sorted = buffer.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(i, s)
    })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), k = newChildren(2))
}

/** Bounded min-heap of (score, id) keeping the k largest by
  * (score, then smaller id wins ties — deterministic). */
final class TopKBuffer(val k: Int) {
  // binary min-heap ordered by (score asc, id desc) so the root is the
  // weakest element currently kept
  private var scores = new Array[Double](math.max(k, 1))
  private var ids = new Array[Long](math.max(k, 1))
  private var size = 0

  /** true if (s1, i1) is weaker than (s2, i2) under keep-order. */
  private def weaker(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def add(s: Double, i: Long): Unit = {
    if (size < k) {
      scores(size) = s; ids(size) = i
      size += 1
      var c = size - 1
      while (c > 0 && weaker(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (k > 0 && weaker(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(start: Int): Unit = {
    var p = start
    var done = false
    while (!done) {
      val l = 2 * p + 1; val r = 2 * p + 2
      var m = p
      if (l < size && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == p) done = true
      else { swap(p, m); p = m }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs, best first. */
  def sortedDesc: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
    out.sortBy { case (s, i) => (-s, i) }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + size * 16)
    bb.putInt(k); bb.putInt(size)
    var i = 0
    while (i < size) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt; val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble; val id = bb.getLong
      buf.add(s, id)
      i += 1
    }
    buf
  }
}

/** Column entry point. */
object TopKFunctions {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Aggregate: exact top-k (id, score) pairs per group, best first. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(id),
      expression(org.apache.spark.sql.functions.lit(k))).toAggregateExpression())
}
