package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Streaming corpus drift — the continuous spelling of
  * [[graft.operators.CorpusDiff.snapshotDiff]]: classify each arriving
  * document against the STATIC previous snapshot as it lands, instead of
  * waiting for the next full diff pass.
  *
  * Spark-native shape: a stream-static LEFT OUTER join on the primary
  * key, with the snapshot slimmed to (key, content hash) — stateless,
  * text never rides the join, and the static side follows the same
  * bucketed-index / broadcast guidance as
  * [[StreamingDedup.dropIndexedTexts]] (including its file-listing
  * snapshot caveat on refreshed static tables).
  *
  * Contract: a stream can only observe what ARRIVES, so statuses are
  * `added` / `changed` / `unchanged` — 'removed' is the absence of an
  * arrival and cannot be emitted here. Closing the diff (removals, and
  * the authoritative per-source rollup) is the batch
  * `snapshotDiff`/`diffSummary` pass, exactly how `dropDupTexts`
  * (watermark-bounded) pairs with the batch `Dedup.exact` (full corpus).
  */
object StreamingDiff {

  /** Append a `status` column ('added' | 'changed' | 'unchanged') to a
    * stream of documents by comparing content hashes against the old
    * snapshot.
    */
  def classifyArrivals(docs: DataFrame, oldSnapshot: DataFrame,
                       key: String, textCol: String): DataFrame = {
    // same null discipline as the batch twin (spec-asserted parity): a
    // presence flag decides 'added' (a snapshot row with NULL text is
    // present — its hash is null, which must read as 'changed'), and
    // the hash comparison is null-safe
    val old = oldSnapshot.select(col(key),
      lit(true).as("__old_present"),
      StableHash.hash60(col(textCol)).as("__old_hash"))
    docs
      .withColumn("__new_hash", StableHash.hash60(col(textCol)))
      .join(old, Seq(key), "left_outer")
      .withColumn("status",
        when(!coalesce(col("__old_present"), lit(false)), "added")
          .when(!(col("__old_hash") <=> col("__new_hash")), "changed")
          .otherwise("unchanged"))
      .drop("__old_present", "__old_hash", "__new_hash")
  }
}
