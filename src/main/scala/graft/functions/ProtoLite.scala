package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Field spec for [[ProtoDecode]]: column name, proto field number, and
  * proto kind. Scalar kinds: varint, zigzag, bool, double, float,
  * string, bytes; `message` decodes a nested message into a struct via
  * `children`. A `repeated_` prefix collects every occurrence into an
  * array column — numeric kinds accept both packed payloads (wire type
  * 2) and interleaved singular occurrences, per the proto3 rule that
  * decoders must accept either encoding.
  */
final case class ProtoField(name: String, number: Int, kind: String,
                            children: Seq[ProtoField] = Nil) {
  val isRepeated: Boolean = kind.startsWith("repeated_")
  val elemKind: String =
    if (isRepeated) kind.stripPrefix("repeated_") else kind
  require(elemKind != "message" || children.nonEmpty,
    s"message field $name needs children")

  private def scalarType(k: String): DataType = k match {
    case "varint" | "zigzag" => LongType
    case "bool"              => BooleanType
    case "double"            => DoubleType
    case "float"             => FloatType
    case "string"            => StringType
    case "bytes"             => BinaryType
    case "message" =>
      StructType(children.map(f => StructField(f.name, f.dataType)))
    case other => throw new IllegalArgumentException(
      s"unsupported proto kind $other")
  }

  def dataType: DataType =
    if (isRepeated) ArrayType(scalarType(elemKind))
    else scalarType(elemKind)

  /** field-number → slot lookup for `children`, built once per spec —
    * the per-row decode loop must not rebuild maps (hot path). */
  lazy val childSlots: Map[Int, Int] =
    children.zipWithIndex.map { case (f, i) => f.number -> i }.toMap
}

/** Engine-native protobuf decoder — the Kafka protobuf tap's
  * deserializer (tap-kafka/tap_kafka/serialization/protobuf.py) without
  * compiled message classes, which don't exist offline (spark-protobuf's
  * `from_protobuf` is the production path when its jar is present).
  *
  * Decodes the protobuf wire format directly: one pass over the buffer,
  * tag = varint (fieldNo << 3 | wireType), wire types 0 (varint),
  * 1 (fixed64), 2 (length-delimited), 5 (fixed32); unknown fields are
  * skipped by their wire type; later occurrences of a scalar win
  * (proto3 last-wins), repeated fields append in wire order (packed or
  * interleaved), nested messages recurse with their own field specs
  * (later occurrences win whole, like scalars — no submessage merging).
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

  private lazy val rootSlots: Map[Int, Int] =
    fields.zipWithIndex.map { case (f, i) => f.number -> i }.toMap

  override def nullSafeEval(input: Any): Any = {
    val buf = input.asInstanceOf[Array[Byte]]
    decodeMessage(buf, 0, buf.length, fields, rootSlots)
  }

  private def readVarintAt(buf: Array[Byte], pos0: Int, end: Int)
      : (Long, Int) = {
    var pos = pos0
    var shift = 0; var v = 0L
    var more = true
    while (more && pos < end && shift < 64) {
      val b = buf(pos); pos += 1
      v |= (b & 0x7fL) << shift
      shift += 7
      more = (b & 0x80) != 0
    }
    (v, pos)
  }

  private def scalarOfVarint(kind: String, raw: Long): Any = kind match {
    case "zigzag" => (raw >>> 1) ^ -(raw & 1)
    case "bool"   => raw != 0
    case _        => raw
  }

  private def decodeMessage(buf: Array[Byte], from: Int, end: Int,
                            flds: Seq[ProtoField],
                            slotByNumber: Map[Int, Int]): InternalRow = {
    val out = new Array[Any](flds.length)
    val rep = new Array[scala.collection.mutable.ArrayBuffer[Any]](
      flds.length)
    def appendOrSet(i: Int, v: Any): Unit =
      if (flds(i).isRepeated) {
        if (rep(i) == null)
          rep(i) = new scala.collection.mutable.ArrayBuffer[Any]()
        rep(i) += v
      } else out(i) = v

    var pos = from
    while (pos < end) {
      val (tag, p1) = readVarintAt(buf, pos, end); pos = p1
      val fieldNo = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val slot = slotByNumber.get(fieldNo)
      wire match {
        case 0 =>
          val (raw, p2) = readVarintAt(buf, pos, end); pos = p2
          slot.foreach { i =>
            appendOrSet(i, scalarOfVarint(flds(i).elemKind, raw))
          }
        case 1 =>
          if (pos + 8 <= end) {
            slot.foreach { i =>
              val bits = java.nio.ByteBuffer.wrap(buf, pos, 8)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
              appendOrSet(i, flds(i).elemKind match {
                case "double" => java.lang.Double.longBitsToDouble(bits)
                case _        => bits
              })
            }
          }
          pos += 8
        case 2 =>
          // bounds check in Long arithmetic: a huge declared length must
          // not wrap `pos + len` negative and sneak past the guard
          val (lenL, p2) = readVarintAt(buf, pos, end); pos = p2
          if (lenL >= 0 && pos.toLong + lenL <= end) {
            val len = lenL.toInt
            val stop = pos + len
            slot.foreach { i =>
              flds(i).elemKind match {
                case "string" =>
                  appendOrSet(i, UTF8String.fromBytes(
                    java.util.Arrays.copyOfRange(buf, pos, stop)))
                case "bytes" =>
                  appendOrSet(i,
                    java.util.Arrays.copyOfRange(buf, pos, stop))
                case "message" =>
                  appendOrSet(i, decodeMessage(buf, pos, stop,
                    flds(i).children, flds(i).childSlots))
                case "double" if flds(i).isRepeated =>
                  var q = pos
                  while (q + 8 <= stop) {
                    val bits = java.nio.ByteBuffer.wrap(buf, q, 8)
                      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
                    appendOrSet(i, java.lang.Double.longBitsToDouble(bits))
                    q += 8
                  }
                case "float" if flds(i).isRepeated =>
                  var q = pos
                  while (q + 4 <= stop) {
                    val bits = java.nio.ByteBuffer.wrap(buf, q, 4)
                      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
                    appendOrSet(i, java.lang.Float.intBitsToFloat(bits))
                    q += 4
                  }
                case k if flds(i).isRepeated =>
                  // packed varint family (varint/zigzag/bool)
                  var q = pos
                  while (q < stop) {
                    val (raw, qn) = readVarintAt(buf, q, stop); q = qn
                    appendOrSet(i, scalarOfVarint(k, raw))
                  }
                case _ => // singular numeric declared but wire 2: skip
              }
            }
            pos = stop
          } else pos = end // malformed length: stop
        case 5 =>
          if (pos + 4 <= end) {
            slot.foreach { i =>
              val bits = java.nio.ByteBuffer.wrap(buf, pos, 4)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
              appendOrSet(i, flds(i).elemKind match {
                case "float" => java.lang.Float.intBitsToFloat(bits)
                case _       => bits.toLong
              })
            }
          }
          pos += 4
        case _ =>
          pos = end // unknown wire type: unrecoverable, stop
      }
    }
    var i = 0
    while (i < flds.length) {
      if (flds(i).isRepeated && rep(i) != null)
        out(i) = new GenericArrayData(rep(i).toArray)
      i += 1
    }
    new GenericInternalRow(out)
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
