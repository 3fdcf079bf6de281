package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record validation with dead-letter routing.
  *
  * The reference validates every RECORD against the stream's JSON Schema
  * (Draft7) before loading (target_snowflake/__init__.py:239,
  * transform_field/__init__.py:104-120) and aborts on violation. The
  * Spark-native equivalent: schema conformance is enforced by the typed
  * DataFrame itself; the remaining value-level constraints (non-null PKs,
  * ranges, patterns) compile to one boolean Column, and invalid rows are
  * split off to a rejects ("dead letter") frame instead of failing the
  * load — both frames from a single scan.
  */
object Validation {

  sealed trait Constraint { def check: Column; def name: String }
  final case class NotNull(column: String) extends Constraint {
    val check: Column = col(column).isNotNull
    val name = s"not_null($column)"
  }
  final case class InRange(column: String, min: Double, max: Double)
      extends Constraint {
    val check: Column = col(column).between(min, max)
    val name = s"in_range($column,$min,$max)"
  }
  final case class Matches(column: String, pattern: String)
      extends Constraint {
    val check: Column = col(column).rlike(pattern)
    val name = s"matches($column)"
  }

  final case class Validated(valid: DataFrame, rejects: DataFrame)

  /** Split a batch into valid rows and rejects; rejects carry a
    * `_violations` array naming every failed constraint.
    */
  def validate(df: DataFrame, constraints: Seq[Constraint]): Validated = {
    require(constraints.nonEmpty, "no constraints given")
    val violations = array(constraints.map(c =>
      when(!coalesce(c.check, lit(false)), lit(c.name))): _*)
    val tagged = df.withColumn("_violations",
      filter(violations, v => v.isNotNull))
    Validated(
      valid = tagged.filter(size(col("_violations")) === 0)
        .drop("_violations"),
      rejects = tagged.filter(size(col("_violations")) > 0))
  }
}
