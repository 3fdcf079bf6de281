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

  /** The events table normalized to a session-zone TIMESTAMP `ts`,
    * accepting either fixture encoding the driver has shipped:
    *  - parquet TIMESTAMP(NANOS): Spark reads it as BIGINT under
    *    spark.sql.legacy.parquet.nanosAsLong=true (set in Verify/Bench/
    *    tests); ns->us truncation is lossless for the synthetic data;
    *  - parquet timestamp[us] (isAdjustedToUTC=false): Spark reads it as
    *    TIMESTAMP_NTZ; the session zone is pinned to UTC everywhere, so
    *    the NTZ->TIMESTAMP cast is value-identity and matches the DuckDB
    *    oracle's epoch_us(ts).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Exact decimal view of a 2-decimal double column. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-insensitive exact sum of a 2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Same for an already-decimal expression. */
  def dsumExpr(c: Column): Column = sum(c).cast("double")
}
