package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — match point rows to interval rows
  * with `lo <= p <= hi` (optionally on equi-keys too, e.g. "clicks
  * within an hour of the same user's signup"). Catalyst plans a bare
  * BETWEEN join as BroadcastNestedLoopJoin — O(|P|·|I|) comparisons —
  * which dies at scale unless one side is tiny.
  *
  * Shape: quantize the value domain into `bucketWidth`-sized buckets.
  * Each interval explodes to the buckets it spans (cheap while
  * `(hi-lo)/bucketWidth` is small — pick the width near the typical
  * interval length); each point maps to exactly ONE bucket. The
  * equi-join on (keys, bucket) then prunes to co-bucketed candidates and
  * the exact BETWEEN filter runs per candidate. Because a point lives in
  * a single bucket, every qualifying (point, interval) pair is produced
  * exactly once — no distinct pass. One shuffle each side, partitioned
  * by (keys, bucket), so hot value regions spread across buckets instead
  * of one join partition.
  */
object RangeJoin {

  /** Inner containment join of `points` (value column `pCol`, LONG
    * domain) against `intervals` (`loCol`..`hiCol` inclusive, LONG).
    * Output: point columns ++ interval columns (names must not collide).
    */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long,
                      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth ($bucketWidth) must be positive")
    val pCols = points.columns.toSeq
    val iCols = intervals.columns.toSeq
    // equi-keys share a name on both sides (USING-join style); any other
    // shared name is ambiguous
    val overlap = iCols.filter(c => pCols.contains(c) && !keys.contains(c))
    require(overlap.isEmpty, s"column names collide: $overlap")
    val iKeys = keys
    val p = points.withColumn("__bk",
      floor(col(pCol).cast("long") / bucketWidth))
    val i = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__bk", explode(sequence(
        floor(col(loCol).cast("long") / bucketWidth),
        floor(col(hiCol).cast("long") / bucketWidth))))
    p.join(i, iKeys :+ "__bk")
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .select((pCols ++ iCols.filterNot(iKeys.contains)).map(col): _*)
  }
}
