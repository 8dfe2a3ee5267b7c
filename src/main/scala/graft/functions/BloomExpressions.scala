package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter kernels for join pruning (SURVEY §2.8 X9 extension).
  *
  * The build side is a TypedImperativeAggregate over PRE-HASHED keys
  * (`xxhash64` upstream, like the dedup operators) whose partial buffers
  * OR together — the shuffle carries one numBits/8-byte bitset per map
  * task, never the keys. The probe side is a codegen'd scalar expression
  * against the serialized bitset literal.
  *
  * Double hashing (Kirsch–Mitzenmacher): bit_i = h1 + i·h2 over a
  * power-of-two bit count, with the splitmix64 finalizer supplying both
  * streams — the standard construction public Bloom implementations use.
  */
object BloomProbe {
  @inline private def h2(key: Long): Long =
    HashKernels.mix(key ^ HashKernels.Golden) | 1L

  def set(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val mask = words.length * 64 - 1
    val a = HashKernels.mix(key)
    val b = h2(key)
    var i = 0
    while (i < numHashes) {
      val pos = (a + i * b).toInt & mask
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Bytes are the little-endian serialization of the word array, so bit
    * `pos` lives at byte pos>>>3, bit pos&7 — must stay in sync with
    * [[toBytes]]. */
  def mightContain(bytes: Array[Byte], key: Long, numHashes: Int): Boolean = {
    val mask = bytes.length * 8 - 1
    val a = HashKernels.mix(key)
    val b = h2(key)
    var i = 0
    while (i < numHashes) {
      val pos = (a + i * b).toInt & mask
      if (((bytes(pos >>> 3) >> (pos & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    words.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}

/** bloom_build(hash64) → binary bitset of `numBits` bits (power of two). */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1, "numHashes must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint (a pre-hashed key), got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomProbe.set(buffer, v.asInstanceOf[Long], numHashes)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomProbe.toBytes(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = BloomProbe.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomProbe.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** bloom_might_contain(bitset, hash64) — true if possibly present; never a
  * false negative. Codegen'd: probes bits straight off the binary. */
case class BloomMightContain(
    left: Expression,
    right: Expression,
    numHashes: Int)
    extends BinaryExpression {
  require(numHashes >= 1, "numHashes must be positive")

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(bloom: Any, key: Any): Any =
    BloomProbe.mightContain(
      bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, key) =>
      s"${ev.value} = graft.functions.BloomProbe.mightContain($bloom, $key, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomFunctions {
  /** Aggregate a pre-hashed (bigint) key column into a Bloom bitset. */
  def bloomBuild(hashed: Column, numBits: Int, numHashes: Int): Column =
    column(BloomBuildAgg(expression(hashed), numBits, numHashes)
      .toAggregateExpression())

  /** Probe a Bloom bitset with a pre-hashed (bigint) key. */
  def bloomMightContain(bloom: Column, hashed: Column, numHashes: Int): Column =
    column(BloomMightContain(expression(bloom), expression(hashed), numHashes))
}
