package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.sources.Sources

/** ProtoLite: protobuf wire-format decode against hand-encoded buffers
  * (the encoder below is the wire spec, written forwards).
  */
class ProtoLiteSpec extends SparkSpecBase {
  import spark.implicits._

  // --- minimal wire-format encoder (test-side oracle) -----------------
  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def tag(out: ByteArrayOutputStream, no: Int, wire: Int): Unit =
    varint(out, (no.toLong << 3) | wire)
  private def vint(out: ByteArrayOutputStream, no: Int, v: Long): Unit = {
    tag(out, no, 0); varint(out, v)
  }
  private def zig(out: ByteArrayOutputStream, no: Int, v: Long): Unit =
    vint(out, no, (v << 1) ^ (v >> 63))
  private def dbl(out: ByteArrayOutputStream, no: Int, v: Double): Unit = {
    tag(out, no, 1)
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putDouble(v).array()
    out.write(b)
  }
  private def flt(out: ByteArrayOutputStream, no: Int, v: Float): Unit = {
    tag(out, no, 5)
    val b = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putFloat(v).array()
    out.write(b)
  }
  private def str(out: ByteArrayOutputStream, no: Int, s: String): Unit = {
    tag(out, no, 2)
    val b = s.getBytes("UTF-8"); varint(out, b.length.toLong); out.write(b)
  }

  private val fields = Seq(
    ProtoField("id", 1, "varint"), ProtoField("name", 2, "string"),
    ProtoField("score", 3, "double"), ProtoField("delta", 4, "zigzag"),
    ProtoField("ratio", 5, "float"), ProtoField("ok", 6, "bool"))

  private def msg(build: ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new ByteArrayOutputStream(); build(out); out.toByteArray
  }

  test("all scalar kinds decode; unknown fields are skipped") {
    val bytes = msg { o =>
      vint(o, 1, 42L)
      str(o, 2, "héllo wörld")
      dbl(o, 3, 2.75)
      zig(o, 4, -17L)
      flt(o, 5, 1.5f)
      vint(o, 6, 1L)
      str(o, 99, "unknown length-delimited field")   // skipped by wire type
      vint(o, 98, 123456789L)                        // skipped varint
    }
    val row = Seq(bytes).toDF("value")
      .select(ProtoLite.decode(col("value"), fields).as("m"))
      .select("m.*").head()
    assert(row.getLong(0) == 42L)
    assert(row.getString(1) == "héllo wörld")
    assert(row.getDouble(2) == 2.75)
    assert(row.getLong(3) == -17L)
    assert(row.getFloat(4) == 1.5f)
    assert(row.getBoolean(5))
  }

  test("absent fields are null; later scalar occurrences win (proto3)") {
    val bytes = msg { o => vint(o, 1, 1L); vint(o, 1, 2L) }
    val row = Seq(bytes).toDF("value")
      .select(ProtoLite.decode(col("value"), fields).as("m"))
      .select("m.*").head()
    assert(row.getLong(0) == 2L)
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("truncated buffers decode what they can, never throw") {
    val full = msg { o => vint(o, 1, 42L); str(o, 2, "abcdef") }
    (0 until full.length).foreach { cut =>
      val row = Seq(full.take(cut)).toDF("value")
        .select(ProtoLite.decode(col("value"), fields).as("m"))
        .select("m.*").head()
      if (cut >= 2) assert(row.getLong(0) == 42L)
    }
  }

  test("property: random scalar messages round-trip exactly") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      val id = rnd.nextLong()
      val name = rnd.alphanumeric.take(rnd.nextInt(20)).mkString +
        (if (rnd.nextBoolean()) "é✓" else "")
      val score = rnd.nextDouble() * 1e6 - 5e5
      val delta = rnd.nextLong()
      val ratio = rnd.nextFloat()
      val ok = rnd.nextBoolean()
      val bytes = msg { o =>
        vint(o, 1, id); str(o, 2, name); dbl(o, 3, score)
        zig(o, 4, delta); flt(o, 5, ratio); vint(o, 6, if (ok) 1L else 0L)
      }
      (bytes, id, name, score, delta, ratio, ok)
    }
    val decoded = rows.map(_._1).toDF("value")
      .select(ProtoLite.decode(col("value"), fields).as("m"))
      .select("m.*").collect()
    rows.zip(decoded).foreach { case ((_, id, name, score, delta, ratio, ok), r) =>
      assert(r.getLong(0) == id)
      assert(r.getString(1) == name)
      assert(r.getDouble(2) == score)
      assert(r.getLong(3) == delta)
      assert(r.getFloat(4) == ratio)
      assert(r.getBoolean(5) == ok)
    }
  }

  test("huge declared length cannot wrap the bounds check (Int overflow)") {
    // field 2 (string) declaring length Int.MaxValue: in Int arithmetic
    // `pos + len` wraps negative and sneaks past `<= buf.length`, then
    // copyOfRange(from > to) kills the task. The guard must use Longs.
    val evil = msg { o =>
      vint(o, 1, 7L)
      tag(o, 2, 2); varint(o, Int.MaxValue.toLong)
      o.write('x')
    }
    val row = Seq(evil).toDF("value")
      .select(ProtoLite.decode(col("value"), fields).as("m"))
      .select("m.*").head()
    assert(row.getLong(0) == 7L, "fields before the corruption survive")
    assert(row.isNullAt(1), "malformed field decodes to null, no throw")

    // length just past 2^31: Long-varint whose .toInt is a small positive
    // number — must still be rejected against the REAL declared length
    val evil2 = msg { o => tag(o, 2, 2); varint(o, (1L << 31) + 5) }
    val row2 = Seq(evil2).toDF("value")
      .select(ProtoLite.decode(col("value"), fields).as("m"))
      .select("m.*").head()
    assert(row2.isNullAt(1))
  }

  test("repeated fields collect packed and interleaved occurrences") {
    val rfields = Seq(
      ProtoField("ids", 1, "repeated_varint"),
      ProtoField("tags", 2, "repeated_string"),
      ProtoField("xs", 3, "repeated_double"))
    val bytes = msg { o =>
      vint(o, 1, 10L)                      // interleaved varint
      str(o, 2, "a")
      // packed payload for field 1: varints 20, 30
      tag(o, 1, 2)
      val packed = new ByteArrayOutputStream()
      varint(packed, 20L); varint(packed, 30L)
      varint(o, packed.size().toLong); packed.writeTo(o)
      str(o, 2, "b")
      vint(o, 1, 40L)                      // interleaved again
      // packed doubles for field 3
      tag(o, 3, 2)
      val pd = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putDouble(1.5).putDouble(-2.5).array()
      varint(o, 16L); o.write(pd)
    }
    val r = Seq(bytes).toDF("value")
      .select(ProtoLite.decode(col("value"), rfields).as("m"))
      .select("m.*").head()
    assert(r.getAs[scala.collection.Seq[Long]]("ids") ==
      Seq(10L, 20L, 30L, 40L), "wire order, packed + interleaved")
    assert(r.getAs[scala.collection.Seq[String]]("tags") == Seq("a", "b"))
    assert(r.getAs[scala.collection.Seq[Double]]("xs") == Seq(1.5, -2.5))
  }

  test("nested messages decode recursively; repeated messages append") {
    val point = Seq(ProtoField("x", 1, "zigzag"),
      ProtoField("y", 2, "zigzag"))
    val nfields = Seq(
      ProtoField("id", 1, "varint"),
      ProtoField("origin", 2, "message", point),
      ProtoField("path", 3, "repeated_message", point))
    def pointMsg(x: Long, y: Long): Array[Byte] =
      msg { o => zig(o, 1, x); zig(o, 2, y) }
    def sub(o: ByteArrayOutputStream, no: Int, b: Array[Byte]): Unit = {
      tag(o, no, 2); varint(o, b.length.toLong); o.write(b)
    }
    val bytes = msg { o =>
      vint(o, 1, 5L)
      sub(o, 2, pointMsg(-1L, 2L))
      sub(o, 3, pointMsg(10L, 20L))
      sub(o, 3, pointMsg(-30L, 40L))
    }
    val r = Seq(bytes).toDF("value")
      .select(ProtoLite.decode(col("value"), nfields).as("m"))
      .select("m.*").head()
    assert(r.getLong(0) == 5L)
    val origin = r.getStruct(1)
    assert(origin.getLong(0) == -1L && origin.getLong(1) == 2L)
    val path = r.getAs[scala.collection.Seq[
      org.apache.spark.sql.Row]]("path")
    assert(path.map(p => (p.getLong(0), p.getLong(1))) ==
      Seq((10L, 20L), (-30L, 40L)))
    // truncated nested message: malformed length stops cleanly, earlier
    // fields survive
    val evil = msg { o =>
      vint(o, 1, 9L)
      tag(o, 2, 2); varint(o, 100L); o.write(1) // declares 100, has 1
    }
    val r2 = Seq(evil).toDF("value")
      .select(ProtoLite.decode(col("value"), nfields).as("m"))
      .select("m.*").head()
    assert(r2.getLong(0) == 9L && r2.isNullAt(1))
  }

  test("kafka protobuf record shape decodes value + provenance columns") {
    val bytes = msg { o => vint(o, 1, 7L); str(o, 2, "k7"); dbl(o, 3, 0.5) }
    val kafka = Seq((bytes, 0, 11L, java.sql.Timestamp.valueOf(
      "2024-01-01 00:00:00"))).toDF("value", "partition", "offset",
      "timestamp")
    val out = Sources.kafkaProtobufShape(kafka, fields.take(3))
    assert(out.columns.toSeq == Seq("id", "name", "score",
      "message_partition", "message_offset", "message_timestamp"))
    val r = out.head()
    assert(r.getLong(0) == 7L && r.getString(1) == "k7" &&
      r.getDouble(2) == 0.5 && r.getLong(4) == 11L)
  }
}
