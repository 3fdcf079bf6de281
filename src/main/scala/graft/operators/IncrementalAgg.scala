package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a warehouse rollup current
  * under CDC batches WITHOUT re-scanning the fact table.
  *
  * The reference replicates facts and delegates aggregation to the
  * destination warehouse (SURVEY §2.5); every reporting table downstream
  * of a CDC stream then faces the same choice: recompute the rollup per
  * sync (fact-table scan per batch) or maintain it incrementally. For
  * sum/count algebra the delta is exact: `agg' = agg + Σ(inserted) −
  * Σ(deleted)` per group, with an update modeled as delete(old) +
  * insert(new) — the same convention the merge path's tombstones use.
  *
  * Scale shape: the batch aggregates map-side down to |touched groups|
  * delta rows, and the only join is delta ⌐⌐ base on the group keys —
  * O(batch + touched groups), never O(fact table). Persist the base
  * bucketed on the keys and the join co-locates like the bucketed merge.
  * Exactness: sums stay DECIMAL through the merge arithmetic, so the
  * maintained result is bit-identical to a from-scratch recompute (the
  * registry query verifies exactly that equivalence against the oracle).
  * Groups whose row count reaches zero are dropped, matching what a
  * recompute would produce; a negative count means the delete stream
  * disagrees with the base and fails loudly rather than silently
  * persisting an impossible rollup.
  *
  * Scope: sum/count (and anything derivable from them — avg, share,
  * revenue-style products folded before the sum) ONLY. min/max are
  * deliberately excluded: they are not group-invertible — deleting the
  * current minimum requires the group's remaining values (a per-group
  * value buffer or a rescan), which is different machinery with a
  * different state contract, not a variant of this delta algebra.
  */
object IncrementalAgg {

  /** Maintained (keys..., n_rows, sum_val) rollup.
    *
    * `base` must carry `n_rows` (long) and `sum_val` (decimal) for the
    * same `keys` — i.e. a prior output of this function or of
    * [[sumCountRollup]]. `inserted` / `deleted` are raw rows.
    */
  def maintainSumCount(base: DataFrame, inserted: DataFrame,
                       deleted: DataFrame, keys: Seq[String],
                       value: Column): DataFrame = {
    require(keys.nonEmpty, "at least one group key required")
    val kc = keys.map(col)
    val ins = inserted.groupBy(kc: _*)
      .agg(count(lit(1)).as("__dn"),
        sum(value.cast("decimal(18,2)")).as("__ds"))
    val del = deleted.groupBy(kc: _*)
      .agg((-count(lit(1))).as("__dn"),
        (-sum(value.cast("decimal(18,2)"))).as("__ds"))
    val delta = ins.unionByName(del)
      .groupBy(kc: _*)
      .agg(sum(col("__dn")).as("__dn"), sum(col("__ds")).as("__ds"))
    val nRows = coalesce(col("n_rows"), lit(0L)) +
      coalesce(col("__dn"), lit(0L))
    base.join(delta, keys, "full_outer")
      .select(kc :+
        nRows.as("n_rows") :+
        (coalesce(col("sum_val").cast("decimal(28,2)"),
          lit(0).cast("decimal(28,2)")) +
          coalesce(col("__ds").cast("decimal(28,2)"),
            lit(0).cast("decimal(28,2)"))).as("sum_val"): _*)
      // the guard lives IN the filter predicate: a projection-side
      // raise_error would be pruned away when Catalyst pushes the
      // n_rows > 0 filter below it, silently dropping impossible rows
      .filter(when(col("n_rows") < 0, raise_error(concat(
        lit("negative maintained count: delete stream disagrees with " +
          "the base rollup ("), col("n_rows").cast("string"), lit(")"))))
        .otherwise(col("n_rows") > 0))
  }

  /** The from-scratch rollup in the same shape `maintainSumCount`
    * consumes and emits: one row per key group, exact-decimal sum.
    */
  def sumCountRollup(facts: DataFrame, keys: Seq[String],
                     value: Column): DataFrame =
    facts.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(value.cast("decimal(18,2)")).cast("decimal(28,2)")
          .as("sum_val"))
}
