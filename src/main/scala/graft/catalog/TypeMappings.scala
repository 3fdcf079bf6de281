package graft.catalog

import org.apache.spark.sql.types._

/** Source-type -> Spark-type mapping, the engine's version of the
  * three-way type table in SURVEY.md §1.3 (tap JSON Schema ->
  * Snowflake/Postgres DDL; e.g. target_snowflake/db_sync.py:76-120,
  * target_postgres/db_sync.py:40-110).
  *
  * JSON-Schema-ish descriptors arrive from discovery; we map to the
  * narrowest faithful Spark type. Improvements over the reference noted
  * inline (decimal instead of lossy float; typed arrays).
  */
object TypeMappings {

  final case class JsonSchemaType(
      types: Set[String],            // {"integer"}, {"string","null"}, ...
      format: Option[String] = None, // date-time | time | binary | spatial
      maximum: Option[BigDecimal] = None,
      multipleOf: Option[BigDecimal] = None)

  def toSpark(j: JsonSchemaType): DataType = {
    val t = j.types - "null"
    if (t.contains("integer")) {
      // int sizing by JSON-Schema `maximum` (target_postgres/db_sync.py:61-70)
      j.maximum match {
        case Some(m) if m <= BigDecimal(32767)      => ShortType
        case Some(m) if m <= BigDecimal(2147483647) => IntegerType
        case _                                      => LongType
      }
    } else if (t.contains("number")) {
      // reference maps decimals to lossy float (db_sync.py:92-93); we keep
      // exact decimals when multipleOf gives a scale
      j.multipleOf match {
        case Some(m) if m.scale > 0 => DecimalType(38, math.min(m.scale, 18))
        case _                      => DoubleType
      }
    } else if (t.contains("boolean")) BooleanType
    else if (t.contains("object")) StringType // JSON text (variant analogue)
    else if (t.contains("array")) ArrayType(StringType)
    else j.format match {
      case Some("date-time") => TimestampType
      case Some("date")      => DateType
      case Some("time")      => StringType
      case Some("binary")    => BinaryType
      case _                 => StringType
    }
  }

  /** Nullability: Singer schemas mark nullable via type union with "null". */
  def nullable(j: JsonSchemaType): Boolean = j.types.contains("null")
}
