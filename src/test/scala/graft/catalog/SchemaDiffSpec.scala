package graft.catalog

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaDiffSpec extends AnyFunSuite {

  private val t = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  test("added column detected and appended; removed kept") {
    val in = StructType(Seq(
      StructField("id", LongType), StructField("extra", StringType)))
    val delta = SchemaDiff.diff(t, in)
    assert(delta.added.map(_.name) == Seq("extra"))
    assert(delta.removed.map(_.name) == Seq("v"))
    val evolved = SchemaDiff.evolve(t, in, "20240101_0000")
    // dropped source column is never dropped from the target
    assert(evolved.fieldNames.toSeq == Seq("id", "v", "extra"))
  }

  test("type change versions the old column") {
    val in = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val evolved = SchemaDiff.evolve(t, in, "20240101_0000")
    assert(evolved.fieldNames.toSeq == Seq("id", "v_20240101_0000", "v"))
    assert(evolved("v_20240101_0000").dataType == DoubleType)
    assert(evolved("v").dataType == StringType)
  }

  test("no-op when schemas agree") {
    assert(SchemaDiff.diff(t, t).isNoop)
    assert(SchemaDiff.evolve(t, t, "x") == t)
  }

  test("json-schema-ish type mapping (int sizing, decimal, temporal)") {
    import TypeMappings._
    assert(toSpark(JsonSchemaType(Set("integer"),
      maximum = Some(BigDecimal(100)))) == ShortType)
    assert(toSpark(JsonSchemaType(Set("integer"))) == LongType)
    assert(toSpark(JsonSchemaType(Set("number"),
      multipleOf = Some(BigDecimal("0.01")))) == DecimalType(38, 2))
    assert(toSpark(JsonSchemaType(Set("string", "null"),
      format = Some("date-time"))) == TimestampType)
    assert(toSpark(JsonSchemaType(Set("string"),
      format = Some("binary"))) == BinaryType)
    assert(nullable(JsonSchemaType(Set("string", "null"))))
  }
}
