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

  /** Continuous incremental dedup against the PERSISTED corpus index —
    * the streaming spelling of [[graft.operators.Dedup.exactAgainst]]:
    * arrivals whose content hash already exists in the (static) keep-id
    * index are dropped; survivors pass through unchanged, ready for
    * [[dropDupTexts]] to also catch within-stream repeats.
    *
    * Spark-native shape: a stream-static LEFT ANTI join. The static side
    * is the [[graft.operators.Dedup.exact]] output table. NOTE on
    * refresh: a parquet-backed static frame snapshots its FILE LISTING
    * at creation — later batches keep reading the original files, so an
    * atomically swapped index refresh is NOT picked up by this join (and
    * the retired copy's deletion would eventually fail the query). To
    * follow a refreshing index, re-create the static frame per
    * micro-batch inside `foreachBatch` (the [[StreamingMerge]] pattern)
    * or restart the query on publish. Broadcast the index when it fits
    * (hash+id pairs are ~16 bytes/doc); at full 100 TB-corpus scale the
    * index is bucketed on `text_hash` and only the micro-batch shuffles.
    */
  def dropIndexedTexts(docs: DataFrame, textCol: String,
                       corpusIndex: DataFrame): DataFrame =
    docs
      .withColumn("__text_hash", StableHash.hash60(col(textCol)))
      .join(corpusIndex.select(col("text_hash").as("__text_hash")),
        Seq("__text_hash"), "left_anti")
      .drop("__text_hash")
}
