package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic Bloom filter over a (hashed) long column: `m` bits,
  * `k` probes per value through the [[StableHash]] minhash permutation
  * family (`bit_i = perm_i(h) mod m`) — the classic membership sketch
  * (Bloom 1970, CACM 13(7)): no false negatives ever, false-positive
  * rate `(1 - e^(-kn/m))^k` tunable by sizing.
  *
  * This is the bounded-state PRE-FILTER primitive for the incremental
  * ("...Against") operators: probing a 10B-row persisted index with a
  * small batch still pays the index-side bucketed join; a Bloom filter
  * of the index's keys is a few KB per group that BROADCASTS into the
  * batch scan and discards definite-misses before any join runs. Like
  * [[CountMin]]/[[MinKDistinct]] (and unlike Spark's Murmur-based
  * `bloom_filter_agg`), the hash family is engine-independent, so the
  * sketch is bit-identical in any engine and oracle-checkable.
  *
  * Layout: one long per BIT (0/1), `merge` = elementwise max — the
  * unpacked form keeps the membership probe a pure built-in
  * (`element_at(sketch, bit + 1) = 1`, no shifts, no sign-bit edge at
  * bit 63) and the oracle a DISTINCT-bits set. 8 bytes/bit caps
  * practical `m` around 64k bits per group; a packed word variant is a
  * micro-optimization the probe semantics don't need.
  *
  * Scale shape: `TypedImperativeAggregate` under ObjectHashAggregate —
  * map-side partials ship one `m x 8`-byte array per group, never keys.
  */
case class BloomBits(
    child: Expression,
    k: Int,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(k >= 1 && k <= 16, s"bloom probes k ($k) must be in [1, 16]")
  require(m >= 2 && m <= (1 << 20),
    s"bloom bits m ($m) must be in [2, 2^20]")

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(LongType)

  private val params = StableHash.minhashParams(k)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // floorMod like CountMin.update: SQL callers may pass any BIGINT
      val hm = java.lang.Math.floorMod(h, StableHash.MinhashPrime)
      var i = 0
      while (i < k) {
        val (a, b) = params(i)
        val bit = java.lang.Math.floorMod(
          (a * hm + b) % StableHash.MinhashPrime, m.toLong).toInt
        buffer(bit) = 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) != 0L) buffer(i) = 1L
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](m)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : BloomBits = copy(child = newChild)
}

object BloomBits {
  /** `array<long>` of m 0/1 bits — the Bloom filter of a hashed long
    * column per group.
    */
  def sketch(value: Column, k: Int, m: Int): Column =
    ColumnBridge.column(
      BloomBits(ColumnBridge.expression(value), k, m)
        .toAggregateExpression())
}
