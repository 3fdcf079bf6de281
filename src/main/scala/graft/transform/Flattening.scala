package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-record flattening: structs become `parent__child` columns up to
  * `maxLevel`; anything deeper is JSON-stringified.
  *
  * Reproduces target_snowflake/flattening.py:45-161 (schema + record
  * flattening with `__` separator and max-level cutoff) as a single
  * generated `select` — Catalyst prunes unreferenced leaves at the scan.
  */
object Flattening {

  /** Keys longer than 255 chars are compressed by camel-casing the middle
    * (flattening.py:22-41). Rarely hit; kept for parity.
    */
  def compressKey(k: String, max: Int = 255): String =
    if (k.length <= max) k
    else {
      val words = k.split("__")
      val head = words.head
      val tail = words.last
      val mid = words.drop(1).dropRight(1)
        .map(w => if (w.isEmpty) w else w.head.toUpper.toString).mkString
      s"${head}__${mid}__$tail".take(max)
    }

  def flattenColumns(schema: StructType, maxLevel: Int): Seq[Column] = {
    def go(field: StructField, path: Seq[String], level: Int): Seq[Column] = {
      val name = compressKey(path.mkString("__"))
      val ref = col(path.map(p => s"`$p`").mkString("."))
      field.dataType match {
        case st: StructType if level < maxLevel =>
          st.fields.toSeq.flatMap(f => go(f, path :+ f.name, level + 1))
        case _: StructType => Seq(to_json(ref).as(name))
        case _ => Seq(ref.as(name))
      }
    }
    schema.fields.toSeq.flatMap(f => go(f, Seq(f.name), 0))
  }

  def apply(df: DataFrame, maxLevel: Int): DataFrame =
    if (maxLevel <= 0) df
    else df.select(flattenColumns(df.schema, maxLevel): _*)
}
