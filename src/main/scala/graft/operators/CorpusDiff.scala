package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Corpus snapshot diffing: row-level drift between two versions of a
  * document corpus (ingest audit, retraining trigger, resync scoping).
  *
  * The reference decides drift at TABLE granularity when scoping a resync
  * (`pipelinewise/cli/commands.py` sync_tables / partial-sync range); a
  * training-data pipeline needs the same decision per DOCUMENT: which docs
  * a new crawl added, removed, or edited — and how much text moved — before
  * paying for re-tokenization or re-embedding downstream.
  *
  * Scale: each side is reduced to (key, 60-bit content hash, length,
  * carry columns) BEFORE the full-outer join, so document text never rides
  * the shuffle — the join moves ~40 bytes/doc regardless of doc size. The
  * join itself is one co-partitioned hash exchange per side on the primary
  * key; the status column is a pure projection over the joined row.
  */
object CorpusDiff {

  /** Per-document diff of two snapshots keyed by `key`.
    *
    * Output: key, status ('added'|'removed'|'changed'|'unchanged'),
    * old_len, new_len (null on the missing side), and each `carry` column
    * coalesced new-over-old (removed rows keep their old-side value).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
      textCol: String, carry: Seq[String] = Nil): DataFrame = {
    // presence flags (not key-null checks) decide added/removed: a
    // null-KEY row never joins, so it must read as present-on-its-side,
    // not as the other side's absence; hash comparison is null-SAFE so
    // a null text on one side classifies as 'changed', not 'unchanged'
    def slim(df: DataFrame, side: String) =
      df.select(
        col(key).as(s"${side}_key") +:
          lit(true).as(s"${side}_present") +:
          StableHash.hash60(col(textCol)).as(s"${side}_hash") +:
          length(col(textCol)).cast("long").as(s"${side}_len") +:
          carry.map(c => col(c).as(s"${side}_$c")): _*)
    val o = slim(oldDf, "old")
    val n = slim(newDf, "new")
    val status = when(!coalesce(col("old_present"), lit(false)), "added")
      .when(!coalesce(col("new_present"), lit(false)), "removed")
      .when(!(col("old_hash") <=> col("new_hash")), "changed")
      .otherwise("unchanged")
    o.join(n, col("old_key") === col("new_key"), "full_outer")
      .select(
        coalesce(col("new_key"), col("old_key")).as(key) +:
          status.as("status") +:
          col("old_len") +: col("new_len") +:
          carry.map(c =>
            coalesce(col(s"new_$c"), col(s"old_$c")).as(c)): _*)
  }

  /** Rollup of [[snapshotDiff]]: per (status, group) doc counts and the
    * net character delta (added text counts positive, removed negative).
    */
  def diffSummary(diff: DataFrame, groupCol: String): DataFrame =
    diff.groupBy(col("status"), col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("new_len"), lit(0L)) -
          coalesce(col("old_len"), lit(0L))).as("delta_chars"))
}
