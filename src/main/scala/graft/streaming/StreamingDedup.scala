package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Streaming document deduplication — exact dedup as a continuous
  * operation over an unbounded corpus (the training-data ingestion
  * shape: drop re-crawled / re-ingested duplicates before they land).
  *
  * Spark-native: `dropDuplicatesWithinWatermark` keyed on the stable
  * 60-bit content hash. The watermark BOUNDS THE STATE — dedup state at
  * 100 TB cannot be infinite, so the contract is "exact within the
  * watermark horizon" (e.g. a re-crawl cycle), with the batch dedup
  * operators ([[graft.operators.Dedup]]) handling full-corpus passes.
  * State lives in the checkpoint's state store, partitioned by the hash
  * key — size is (docs per horizon) x ~24 bytes, not corpus-sized.
  */
object StreamingDedup {

  /** Keep the first arrival of each distinct text within the watermark
    * horizon. Input must carry an event-time column `tsCol`.
    */
  def dropDupTexts(docs: DataFrame, textCol: String, tsCol: String,
                   watermark: String): DataFrame =
    docs
      .withColumn("__text_hash", StableHash.hash60(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")
}
