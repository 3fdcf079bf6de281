package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `_sdc_*` system columns and temporal sanitation.
  *
  * Every replicated row carries `_sdc_extracted_at`, `_sdc_batched_at`,
  * `_sdc_deleted_at` (target_snowflake/__init__.py:41-54,
  * fastsync/commons/utils.py:13-15). Out-of-range timestamps are clamped
  * to the 9999-12-31 sentinel (target_snowflake/stream_utils.py:16-90).
  */
object Metadata {

  val ExtractedAt = "_sdc_extracted_at"
  val BatchedAt = "_sdc_batched_at"
  val DeletedAt = "_sdc_deleted_at"

  /** Max-timestamp sentinel used when a temporal value is unparseable or
    * beyond range (stream_utils.py:16-19).
    */
  val MaxTimestamp = "9999-12-31 23:59:59.999999"

  def withSystemColumns(df: DataFrame): DataFrame =
    df.withColumn(ExtractedAt, current_timestamp())
      .withColumn(BatchedAt, current_timestamp())
      .withColumn(DeletedAt, lit(null).cast("timestamp"))

  /** Clamp a *string* temporal column: parse; on failure or overflow use
    * the sentinel. Uses try_to_timestamp so ANSI mode never throws on bad
    * source data — the streaming-safe behavior the reference implements
    * with try/except.
    */
  def clampTimestampString(c: Column): Column = {
    val parsed = try_to_timestamp(c)
    val sentinel = to_timestamp(lit(MaxTimestamp))
    when(c.isNull, lit(null).cast("timestamp"))
      .when(parsed.isNull, sentinel)
      .when(parsed > sentinel, sentinel)
      .otherwise(parsed)
  }

  /** Clamp an already-typed timestamp column to the sentinel ceiling. */
  def clampTimestamp(c: Column): Column = {
    val sentinel = to_timestamp(lit(MaxTimestamp))
    when(c > sentinel, sentinel).otherwise(c)
  }
}
