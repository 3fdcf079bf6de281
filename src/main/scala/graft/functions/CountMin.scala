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

/** Deterministic count-min sketch over a (hashed) long column: `d`
  * pairwise-independent rows of `w` counters; every value increments one
  * counter per row (`perm_i(h) mod w` with the [[StableHash]] minhash
  * permutation family), and `estimate(x) = min_i counter_i[bucket_i(x)]`
  * upper-bounds the true frequency (Cormode & Muthukrishnan 2005,
  * J. Algorithms 55(1) — the classic CM sketch).
  *
  * This is the bounded-state HEAVY-HITTER / frequency primitive: exact
  * per-key counts of a skewed column shuffle every distinct key, while
  * the sketch is a fixed `d x w` long array per group regardless of
  * cardinality — the skew detector that sizes [[graft.operators.Skew]]
  * salting and flags crawl-dominant n-grams without a second full
  * aggregation. Like [[MinKDistinct]] (vs HLL) and unlike Spark's
  * built-in `count_min_sketch` (Murmur-based, seed-dependent), the hash
  * family is the engine-independent [[StableHash]] one, so sketches are
  * bit-identical in any engine and oracle-checkable.
  *
  * Scale shape: `TypedImperativeAggregate` under ObjectHashAggregate —
  * map-side partials mean each task ships one `d x w x 8`-byte array
  * per group (merge = elementwise add), never the keys.
  *
  * Emits the raw `array<long>` of length `d*w` (row-major);
  * [[graft.operators.Sketches.cmsEstimate]] turns it into per-key
  * estimates with pure built-in expressions.
  */
case class CountMin(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(d >= 1 && d <= 16, s"cms depth d ($d) must be in [1, 16]")
  require(w >= 2, s"cms width w ($w) must be >= 2")

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(LongType)

  private val params = StableHash.minhashParams(d)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // floorMod throughout: StableHash values are non-negative, but
      // the SQL surface (graft_count_min) accepts any BIGINT and a
      // signed % would produce a negative bucket -> AIOOBE. Matches
      // Sketches.cmsEstimate's pmod spelling.
      val hm = java.lang.Math.floorMod(h, StableHash.MinhashPrime)
      var i = 0
      while (i < d) {
        val (a, b) = params(i)
        val bucket = java.lang.Math.floorMod(
          (a * hm + b) % StableHash.MinhashPrime, w.toLong).toInt
        buffer(i * w + bucket) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
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
    val buf = new Array[Long](d * w)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : CountMin = copy(child = newChild)
}

object CountMin {
  /** Row-major `array<long>` count-min sketch (d rows x w counters) of a
    * hashed long column per group.
    */
  def sketch(value: Column, d: Int, w: Int): Column =
    ColumnBridge.column(
      CountMin(ColumnBridge.expression(value), d, w)
        .toAggregateExpression())
}
