package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Field spec for [[ProtoDecode]]: column name, proto field number, and
  * proto kind. Scalar kinds: varint, zigzag, bool, double, float,
  * string, bytes. A `repeated_` prefix collects every occurrence into an
  * array column — both packed payloads (wire type 2) and interleaved
  * singular occurrences append, per the proto3 rule that decoders must
  * accept either encoding.
  */
final case class ProtoField(name: String, number: Int, kind: String) {
  val isRepeated: Boolean = kind.startsWith("repeated_")
  val elemKind: String =
    if (isRepeated) kind.stripPrefix("repeated_") else kind

  private def scalarType(k: String): DataType = k match {
    case "varint" | "zigzag" => LongType
    case "bool"              => BooleanType
    case "double"            => DoubleType
    case "float"             => FloatType
    case "string"            => StringType
    case "bytes"             => BinaryType
    case other => throw new IllegalArgumentException(
      s"unsupported proto kind $other")
  }

  def dataType: DataType =
    if (isRepeated) ArrayType(scalarType(elemKind))
    else scalarType(elemKind)
}

/** Engine-native protobuf scalar decoder — the Kafka protobuf tap's
  * deserializer (tap-kafka/tap_kafka/serialization/protobuf.py) without
  * compiled message classes, which don't exist offline (spark-protobuf's
  * `from_protobuf` is the production path when its jar is present).
  *
  * Decodes the protobuf wire format directly: one pass over the buffer,
  * tag = varint (fieldNo << 3 | wireType), wire types 0 (varint),
  * 1 (fixed64), 2 (length-delimited), 5 (fixed32); unknown fields are
  * skipped by their wire type, later occurrences of a scalar win
  * (proto3 last-wins semantics). Nested messages/packed repeats are out
  * of scope — they land as `bytes` for a second decode pass.
  *
  * `CodegenFallback` (not `doGenCode`): the decode is a per-row byte
  * scan with data-dependent control flow; the JIT'd eval is the loop,
  * and falling out of whole-stage codegen costs one virtual call per
  * row here, not per field.
  */
case class ProtoDecode(child: Expression, fields: Seq[ProtoField])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    StructType(fields.map(f => StructField(f.name, f.dataType)))

  private lazy val slotByNumber: Map[Int, Int] =
    fields.zipWithIndex.map { case (f, i) => f.number -> i }.toMap

  override def nullSafeEval(input: Any): Any = {
    val buf = input.asInstanceOf[Array[Byte]]
    val out = new Array[Any](fields.length)
    var pos = 0

    def readVarint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more && pos < buf.length && shift < 64) {
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }

    while (pos < buf.length) {
      val tag = readVarint()
      val fieldNo = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val slot = slotByNumber.get(fieldNo)
      wire match {
        case 0 =>
          val raw = readVarint()
          slot.foreach { i =>
            out(i) = fields(i).kind match {
              case "zigzag" => (raw >>> 1) ^ -(raw & 1)
              case "bool"   => raw != 0
              case _        => raw
            }
          }
        case 1 =>
          if (pos + 8 <= buf.length) {
            slot.foreach { i =>
              val bits = java.nio.ByteBuffer.wrap(buf, pos, 8)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
              out(i) = fields(i).kind match {
                case "double" => java.lang.Double.longBitsToDouble(bits)
                case _        => bits
              }
            }
          }
          pos += 8
        case 2 =>
          // bounds check in Long arithmetic: a huge declared length must
          // not wrap `pos + len` negative and sneak past the guard
          val lenL = readVarint()
          if (lenL >= 0 && pos.toLong + lenL <= buf.length) {
            val len = lenL.toInt
            slot.foreach { i =>
              val bytes = java.util.Arrays.copyOfRange(buf, pos, pos + len)
              out(i) = fields(i).kind match {
                case "string" => UTF8String.fromBytes(bytes)
                case _        => bytes
              }
            }
            pos += len
          } else pos = buf.length // malformed length: stop
        case 5 =>
          if (pos + 4 <= buf.length) {
            slot.foreach { i =>
              val bits = java.nio.ByteBuffer.wrap(buf, pos, 4)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
              out(i) = fields(i).kind match {
                case "float" => java.lang.Float.intBitsToFloat(bits)
                case _       => bits.toLong
              }
            }
          }
          pos += 4
        case _ =>
          pos = buf.length // unknown wire type: unrecoverable, stop
      }
    }
    InternalRow.fromSeq(out.toIndexedSeq)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object ProtoLite {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Decode a binary protobuf column into a struct per `fields`. */
  def decode(c: Column, fields: Seq[ProtoField]): Column =
    ColumnBridge.column(ProtoDecode(ColumnBridge.expression(c), fields))
}
