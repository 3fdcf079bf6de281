package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual average-hash (aHash) over a raw-byte payload.
  *
  * The classic aHash recipe (public knowledge: downscale, mean-threshold,
  * one bit per cell) applied to an opaque byte stream standing in for
  * decoded grayscale pixels — the container has no codec jars, so the
  * "decode to pixels" step is the identity on the payload bytes, while
  * the hash arithmetic itself is the real thing and is exactly
  * reproducible in any engine (pure integer ops, no floats):
  *
  *   - the payload's `n` bytes are cut into 64 equal blocks
  *     (block k = bytes `[k*n/64, (k+1)*n/64)`, integer division)
  *   - bit k is set iff block k's mean exceeds the global byte mean,
  *     compared EXACTLY by cross-multiplication:
  *     `sum_k * n > total * len_k` — no rounding, no division
  *   - empty payloads (and empty blocks when n < 64) hash to unset bits
  *
  * Block means make the hash robust to the small local edits near-dup
  * detection cares about (a changed word shifts bytes inside one block;
  * point-sampling like dHash would see every later sample shift), which
  * keeps Hamming distances between near-dup payloads small enough for
  * byte-band LSH ([[graft.operators.Dedup.bandedHammingPairs]]).
  *
  * Cross-multiplication bounds: `sum_k * n <= 255 * n^2` must fit a
  * signed 64-bit long, so payloads are capped at ~190 MB — far above any
  * single image/frame payload; a real >190 MB blob should be chunked
  * upstream.
  */
case class AHash64(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(BinaryType)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    if (n == 0) return 0L
    require(n <= AHash64.MaxPayloadBytes,
      s"aHash payload too large ($n bytes): cross-multiplied means " +
        s"overflow past ${AHash64.MaxPayloadBytes} bytes — chunk upstream")
    var total = 0L
    var i = 0
    while (i < n) { total += (bytes(i) & 0xff); i += 1 }
    var hash = 0L
    var k = 0
    while (k < 64) {
      val lo = ((k.toLong * n) / 64).toInt
      val hi = (((k + 1).toLong * n) / 64).toInt
      var sum = 0L
      var j = lo
      while (j < hi) { sum += (bytes(j) & 0xff); j += 1 }
      if (sum * n > total * (hi - lo)) hash |= (1L << k)
      k += 1
    }
    hash
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object AHash64 {
  /** 255 * n^2 <= Long.MaxValue  =>  n <= sqrt(2^63 / 255) ~ 1.9e8 */
  val MaxPayloadBytes: Int = 190000000

  def aHash(payload: Column): Column =
    ColumnBridge.column(AHash64(ColumnBridge.expression(payload)))
}
