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
  * recompute would produce. A batch that deletes MORE rows from a group
  * than the base rollup holds fails loudly rather than silently
  * persisting an impossible rollup — insert and delete counts are
  * compared against the base separately, so co-arriving inserts cannot
  * mask an over-delete. (What count algebra cannot detect: a delete
  * whose VALUE never existed in the group while its count does —
  * catching that needs per-row state, i.e. the merge path, not a
  * rollup.)
  *
  * Scope: sum/count (and anything derivable from them — avg, share,
  * revenue-style products folded before the sum) ONLY. min/max are
  * deliberately excluded: they are not group-invertible — deleting the
  * current minimum requires the group's remaining values (a per-group
  * value buffer or a rescan), which is different machinery with a
  * different state contract, not a variant of this delta algebra.
  */
object IncrementalAgg {

  /** The measure value as checked decimal: a non-null value whose
    * decimal(18,2) cast comes back NULL (numeric overflow / unparseable
    * string under non-ANSI cast semantics) fails LOUDLY instead of
    * silently vanishing from the sum while still being counted — that
    * desync would make the maintained rollup diverge from a recompute
    * with no signal.
    */
  private def checkedVal(value: Column): Column =
    when(value.isNotNull && value.cast("decimal(18,2)").isNull,
      raise_error(concat(lit("measure value '"), value.cast("string"),
        lit("' does not fit decimal(18,2) — rollup sums would silently " +
          "drop it"))))
      .otherwise(value.cast("decimal(18,2)"))

  /** Maintained (keys..., n_rows, n_vals, sum_val) rollup.
    *
    * `base` must carry `n_rows` (long), `n_vals` (long, non-null measure
    * count) and `sum_val` (decimal) for the same `keys` — i.e. a prior
    * output of this function or of [[sumCountRollup]]. `inserted` /
    * `deleted` are raw rows.
    *
    * NULL discipline: SQL `sum` skips NULL measures while `count(*)`
    * does not, so a group whose surviving rows are all NULL-valued must
    * yield `sum_val = NULL` — not the 0 the delta arithmetic would
    * cancel to. `n_vals` tracks the non-null measure count through the
    * same insert/delete algebra, and `sum_val` is nulled exactly when it
    * reaches zero, keeping the maintained result bit-identical to a
    * from-scratch recompute even for all-NULL groups.
    */
  def maintainSumCount(base: DataFrame, inserted: DataFrame,
                       deleted: DataFrame, keys: Seq[String],
                       value: Column): DataFrame = {
    require(keys.nonEmpty, "at least one group key required")
    val kc = keys.map(col)
    // insert and delete counts stay SEPARATE through the join: the
    // over-delete guard compares deletes against the base alone, so a
    // batch that deletes more rows than the base holds is caught even
    // when co-arriving inserts net the count back to >= 0
    val cv = checkedVal(value)
    val ins = inserted.groupBy(kc: _*)
      .agg(count(lit(1)).as("__ni"), count(cv).as("__vi"),
        sum(cv).as("__si"))
    val del = deleted.groupBy(kc: _*)
      .agg(count(lit(1)).as("__nd"), count(cv).as("__vd"),
        sum(cv).as("__sd"))
    val delta = ins.join(del, keys, "full_outer")
    def dz(c: String) = coalesce(col(c).cast("decimal(28,2)"),
      lit(0).cast("decimal(28,2)"))
    def lz(c: String) = coalesce(col(c), lit(0L))
    val baseN = coalesce(col("n_rows"), lit(0L))
    val baseV = coalesce(col("n_vals"), lit(0L))
    base.join(delta, keys, "full_outer")
      .select(kc :+
        baseN.as("__bn") :+
        lz("__nd").as("__dn") :+
        (baseN + lz("__ni") - lz("__nd")).as("n_rows") :+
        (baseV + lz("__vi") - lz("__vd")).as("n_vals") :+
        (dz("sum_val") + dz("__si") - dz("__sd"))
          .cast("decimal(28,2)").as("__sv"): _*)
      // guards live IN the filter predicate: a projection-side
      // raise_error would be pruned away when Catalyst pushes the
      // n_rows > 0 filter below it, silently dropping impossible rows
      .filter(when(col("__dn") > col("__bn"), raise_error(concat(
        lit("over-delete: batch deletes "), col("__dn").cast("string"),
        lit(" rows from a group the base rollup holds "),
        col("__bn").cast("string"), lit(" of"))))
        .otherwise(col("n_rows") > 0))
      .withColumn("sum_val",
        when(col("n_vals") === 0L, lit(null).cast("decimal(28,2)"))
          .otherwise(col("__sv")))
      .drop("__bn", "__dn", "__sv")
  }

  /** The from-scratch rollup in the same shape `maintainSumCount`
    * consumes and emits: one row per key group, exact-decimal sum (NULL
    * when the group has no non-null measures — plain SQL sum semantics).
    */
  def sumCountRollup(facts: DataFrame, keys: Seq[String],
                     value: Column): DataFrame = {
    val cv = checkedVal(value)
    facts.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), count(cv).as("n_vals"),
        sum(cv).cast("decimal(28,2)").as("sum_val"))
  }
}
