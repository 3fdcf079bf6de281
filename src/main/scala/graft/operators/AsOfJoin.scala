package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal point-in-time) join — for every left row, the single
  * most recent right row with `rightTs <= leftTs` on the same key: the
  * price-as-of-trade / attribute-as-of-event lookup that plain SQL can
  * only express as a correlated subquery or a pair-exploding inequality
  * join. Spark has no native operator for it (Catalyst plans inequality
  * joins as BroadcastNestedLoop); engines that do (DuckDB/kdb ASOF JOIN)
  * define exactly the backward-inclusive semantics implemented here.
  *
  * Shape: tag both inputs, UNION them, and take, per key in one ordered
  * window pass, the last non-null right payload at or before each left
  * row (`last(ignoreNulls)` over rows-unbounded-preceding — a running
  * carry-forward, computed in a single sort per key partition). ONE
  * shuffle on the key, no per-pair blowup: cost is O(|L|+|R|) rows
  * through one Exchange regardless of how many right rows precede each
  * left row — the 100 TB-safe plan a time-bucketed join or nested-loop
  * can't give. Equal timestamps match (right sorts before left at the
  * same instant, like DuckDB's `>=`).
  *
  * Caller contract: right rows should be unique per (key, rightTs) —
  * duplicates resolve to an arbitrary one of them (pre-aggregate to
  * enforce a policy). Null timestamps never match and produce no match.
  */
object AsOfJoin {

  /** Backward as-of join.
    *
    * @param rightVals right columns carried onto matching left rows
    *                  (must not collide with left column names)
    * @param inner     true drops unmatched left rows (ASOF JOIN);
    *                  false keeps them with null rightVals (ASOF LEFT)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightVals: Seq[String],
               inner: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "asof join requires at least one key column")
    require(rightVals.nonEmpty, "rightVals must be non-empty")
    val leftCols = left.columns.toSeq
    require(rightVals.forall(!leftCols.contains(_)),
      s"rightVals ${rightVals.filter(leftCols.contains)} collide with " +
        "left column names")
    val rvType = right.select(struct(rightVals.map(col): _*)).schema
      .head.dataType
    val lvType = left.select(struct(leftCols.map(col): _*)).schema
      .head.dataType
    val rPacked = right.filter(col(rightTs).isNotNull)
      .select(keys.map(col) ++ Seq(col(rightTs).as("__ts"),
        lit(0).as("__side"), struct(rightVals.map(col): _*).as("__rv"),
        lit(null).cast(lvType).as("__lv")): _*)
    val lPacked = left.filter(col(leftTs).isNotNull)
      .select(keys.map(col) ++ Seq(col(leftTs).as("__ts"),
        lit(1).as("__side"), lit(null).cast(rvType).as("__rv"),
        struct(leftCols.map(col): _*).as("__lv")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rPacked.unionByName(lPacked)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val base = if (inner) matched.filter(col("__m").isNotNull) else matched
    base.select(leftCols.map(c => col(s"__lv.$c").as(c)) ++
      rightVals.map(v => col(s"__m.$v").as(v)): _*)
  }
}
