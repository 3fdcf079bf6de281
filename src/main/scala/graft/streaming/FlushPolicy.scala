package graft.streaming

import org.apache.spark.sql.streaming.Trigger

/** Flush-trigger policy — the reference's batch buffering knobs
  * (`batch_size_rows` default 100000, `batch_wait_limit_seconds`,
  * `parallelism`/`max_parallelism`: target_snowflake/__init__.py:36-38,
  * :193-226) mapped onto Structured Streaming's trigger + rate-limit
  * options. Row-count flushing becomes a per-trigger cap (maxFilesPerTrigger
  * / maxOffsetsPerTrigger depending on source); wall-clock flushing becomes
  * the processing-time trigger; stream-flush parallelism is the Spark
  * scheduler's job (fair pools if configured).
  */
final case class FlushPolicy(
    batchSizeRows: Long = 100000L,
    batchWaitLimitSeconds: Option[Long] = None,
    maxParallelism: Int = 16) {

  /** Trigger for the streaming query: wait-limit -> processing time;
    * otherwise drain whatever is available (AvailableNow), the batch-ish
    * default matching the reference's flush-on-threshold loop.
    */
  def trigger: Trigger = batchWaitLimitSeconds match {
    case Some(s) => Trigger.ProcessingTime(s * 1000L)
    case None    => Trigger.AvailableNow()
  }

  /** Reader options bounding rows per micro-batch for rate-limited
    * sources (kafka: maxOffsetsPerTrigger; files: maxFilesPerTrigger).
    */
  def kafkaOptions: Map[String, String] =
    Map("maxOffsetsPerTrigger" -> batchSizeRows.toString)

  def fileOptions(avgRowsPerFile: Long): Map[String, String] =
    Map("maxFilesPerTrigger" ->
      math.max(1L, batchSizeRows / math.max(1L, avgRowsPerFile)).toString)
}
