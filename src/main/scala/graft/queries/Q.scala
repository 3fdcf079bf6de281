package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the verified query registry.
  *
  * Oracle-parity conventions (driver hashes Spark output vs DuckDB output
  * of `oracle`):
  *  - doubles are aggregated via exact DECIMAL(18,2) casts (the synthetic
  *    data carries 2-decimal doubles, so the casts are lossless) and only
  *    the final aggregate is cast back to double -> bit-identical across
  *    engines regardless of partition/summation order;
  *  - temporal outputs are DATE or formatted strings, never raw
  *    timestamps (parquet tz-adjustment flags differ across writers);
  *  - every hash is [[graft.functions.StableHash]] (md5-derived, identical
  *    in both engines).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table with its TIMESTAMP(NANOS) column (unsupported by
    * Spark's parquet reader) converted to a microsecond timestamp. The
    * session must set spark.sql.legacy.parquet.nanosAsLong=true (done in
    * Verify/Bench/tests); the ns->us truncation is lossless for the
    * synthetic data (microsecond resolution) and matches the oracle.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Exact decimal view of a 2-decimal double column. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-insensitive exact sum of a 2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Same for an already-decimal expression. */
  def dsumExpr(c: Column): Column = sum(c).cast("double")
}
