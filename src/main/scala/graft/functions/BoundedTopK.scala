package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Mutable bounded top-k buffer: the k best (score, id) pairs ordered by
  * (score desc, id asc), kept in sorted parallel arrays. k is small (~10),
  * so insertion is a short shift; rows below the current k-th score exit
  * after one comparison.
  */
final class TopKBuffer(val k: Int) extends Serializable {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** (s1, i1) ranks strictly before (s2, i2) under (score desc, id asc).
    * Uses java.lang.Double.compare so NaN ordering matches Spark's SQL
    * ordering (NaN largest), keeping parity with the window formulation.
    */
  @inline private def before(s1: Double, i1: Long, s2: Double, i2: Long)
      : Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(score: Double, id: Long): Unit = {
    if (size == k && !before(score, id, scores(k - 1), ids(k - 1))) return
    var pos = if (size < k) size else k - 1
    while (pos > 0 && before(score, id, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1)
      ids(pos) = ids(pos - 1)
      pos -= 1
    }
    scores(pos) = score
    ids(pos) = id
    if (size < k) size += 1
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) {
      insert(other.scores(i), other.ids(i))
      i += 1
    }
  }
}

/** Aggregate function keeping the top-k ids by (score desc, id asc) per
  * group, as a `TypedImperativeAggregate` so Spark's ObjectHashAggregate
  * runs it with a map-side partial: each map task emits at most k
  * candidates per group, and the shuffle keyed on the group column carries
  * only those buffers — never the full scored input. This is the two-phase
  * top-k that replaces `Window.partitionBy(group).orderBy(score desc)` +
  * `row_number <= k`, which at 100 TB funnels the whole corpus through one
  * reducer per group.
  *
  * Result: `array<long>` of ids, best first — `posexplode` it to recover
  * (rank, id). Row-level semantics identical to the window formulation
  * (same total order, same tie-break), so oracle SQL can keep using
  * `row_number() OVER (ORDER BY score DESC, id)` — with ONE divergence:
  * rows with a null score or id are DROPPED here, whereas `ORDER BY score
  * DESC` ranks nulls last and a window formulation would emit them when a
  * group has fewer than k non-null candidates. Filter nulls upstream if
  * the input can contain them and parity matters.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression]
  with ExpectsInputTypes {

  // analysis-time typing: a float/decimal score or int id fails (or is
  // implicitly cast) at analysis instead of ClassCastException in update()
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(DoubleType, LongType)

  require(k > 0, s"topK k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buffer.ids, buffer.size))

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    // entries arrive already sorted; direct fill avoids re-inserting
    var i = 0
    while (i < n) {
      buf.scores(i) = bb.getDouble()
      buf.ids(i) = bb.getLong()
      i += 1
    }
    buf.size = n
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(score = newLeft, id = newRight)
}

object BoundedTopK {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `array<long>` of the top-k `id`s per group by (score desc, id asc). */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopK(ColumnBridge.expression(score),
        ColumnBridge.expression(id), k).toAggregateExpression())
}
