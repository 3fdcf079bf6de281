package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Exact integer second-moment aggregate over quantized vectors: one pass
  * over an `array<int>` column accumulating `[n, Σq_i (d), Σq_i·q_j
  * (upper triangle, row-major)]` as a single `array<long>` of length
  * `1 + d + d(d+1)/2`.
  *
  * This is the distributed half of PCA / covariance over an embedding
  * corpus: with GLOBALLY-scaled int8 codes (see
  * [[graft.operators.Pca]]), every entry is an exact BIGINT — hash-exact
  * in any partition order and in any engine — and the float covariance is
  * recovered on the driver by the single rescale
  * `scale² · (G/n − s·sᵀ/n²)` AFTER aggregation, so no IEEE summation
  * order ever crosses an executor boundary.
  *
  * Scale shape: `TypedImperativeAggregate` under ObjectHashAggregate —
  * map-side partials mean each task ships ONE `(1+d+d(d+1)/2) × 8`-byte
  * array (d=64 → ~17 KB) regardless of row count; merge is elementwise
  * add. The 100 TB plan is scan → partial → one-row combine, no shuffle
  * of vector data.
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(dim >= 1 && dim <= 512,
    s"gram dim ($dim) must be in [1, 512] — the d² buffer is a per-task " +
      "model artifact, not a data structure")

  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(IntegerType))

  private val triLen = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + triLen

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gram input has ${arr.numElements()} elements, expected $dim")
      // O(d) pre-scan (the SQL surface accepts arbitrary arrays): a null
      // element must fail loudly, not read as an undefined value, and a
      // magnitude past 2^20 must fail loudly, not wrap the BIGINT
      // accumulators Spark-side while the oracle's checked sum aborts —
      // the exactness claim only holds inside this bound (|q| ≤ 2^20 →
      // per-row product ≤ 2^40, ≥ 2^22 rows of headroom worst-case;
      // int8 codes, the intended input, leave 2^49 rows)
      var p = 0
      while (p < dim) {
        require(!arr.isNullAt(p), s"gram input has a null at position $p")
        val q = arr.getInt(p)
        require(q >= -GramAgg.MaxMagnitude && q <= GramAgg.MaxMagnitude,
          s"gram input value $q at position $p exceeds " +
            s"|${GramAgg.MaxMagnitude}|")
        p += 1
      }
      // checked accumulation: |q| ≤ 2^20 bounds each per-row product at
      // 2^40, but the SUM across rows has no such bound — ~2^22 rows of
      // worst-case magnitude wrap a raw Long silently while the result
      // is advertised as exact. addExact (JIT-intrinsic add + overflow
      // branch) makes a wrap fail loudly instead; the oracle's checked
      // BIGINT sum aborts the same way, so both engines agree
      buffer(0) = Math.addExact(buffer(0), 1L)
      var i = 0
      while (i < dim) {
        val qi = arr.getInt(i).toLong
        buffer(1 + i) = Math.addExact(buffer(1 + i), qi)
        val base = 1 + dim + (i * (2 * dim - i + 1)) / 2 - i
        var j = i
        while (j < dim) {
          buffer(base + j) = Math.addExact(buffer(base + j),
            qi * arr.getInt(j))
          j += 1
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) {
      buffer(i) = Math.addExact(buffer(i), other(i)); i += 1
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
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
}

object GramAgg {
  /** Accumulator-overflow guard: values must satisfy `|q| ≤ 2^20`. */
  val MaxMagnitude: Int = 1 << 20

  /** `array<long>` of `[n, sums(d), gram upper triangle (d(d+1)/2)]` over
    * an `array<int>` column.
    */
  def gram(codes: Column, dim: Int): Column =
    ColumnBridge.column(
      GramAgg(ColumnBridge.expression(codes), dim).toAggregateExpression())
}
