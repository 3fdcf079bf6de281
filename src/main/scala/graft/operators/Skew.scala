package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins — the hand-rolled fallback when AQE's
  * skew-join split isn't enough (or is disabled): salt the skewed (large)
  * side with a deterministic `hash(row) % factor` and explode the small
  * side across all salt values. Equivalent join result, `factor`-way
  * fan-out of each hot key's partition.
  *
  * Deterministic salting (no rand()) keeps retries/speculative tasks and
  * the DuckDB-style differential checks stable.
  */
object Skew {

  /** Inner-join `large` with `small` on `key`, salting the large side by
    * a hash of `saltBy` (ideally a high-cardinality column) mod `factor`.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBy: String, factor: Int): DataFrame = {
    val l = large.withColumn("__salt",
      pmod(hash(col(saltBy)), lit(factor)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
