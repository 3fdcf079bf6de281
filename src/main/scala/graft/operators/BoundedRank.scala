package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense 0..n-1 indexing over a BOUNDED frame without a partition-less
  * window.
  *
  * `row_number().over(Window.orderBy(...))` — even over a frame already
  * reduced to a handful of rows by a limit()/top-k — plans a
  * WindowExec with an empty partition spec, the "moving all data to a
  * single partition" class the registry-wide plan lint bans outright
  * (a bounded input today is only bounded by caller discipline
  * tomorrow). For frames that are GENUINELY bounded (seed sets, top-N
  * vocabularies, centroid candidates — all ≤ a few thousand rows), the
  * equivalent single-pass shape is: pack the rows into one
  * `collect_list` of structs with the sort key leading, `array_sort`
  * the packed array (struct ordering = lexicographic on fields), and
  * `posexplode` back out — the position IS the dense rank. One
  * aggregation, no shuffle of anything bigger than the packed array,
  * and nothing in the plan that degrades if the caller's frame grows
  * (it fails loudly on a too-large array instead of silently
  * single-partitioning a corpus).
  */
object BoundedRank {

  /** Index `df`'s rows 0..n-1 in ascending `ordCols` order (append
    * `idxName`). `payload` columns are carried through; every output
    * row keeps its payload values. The caller guarantees `df` is
    * bounded (post-limit / top-k); the packed array materializes in a
    * single row.
    */
  def packedIndex(df: DataFrame, ordCols: Seq[Column],
                  payload: Seq[(String, Column)],
                  idxName: String): DataFrame = {
    val ordFields = ordCols.zipWithIndex.map { case (c, i) =>
      c.as(s"__o$i")
    }
    val payFields = payload.map { case (n, c) => c.as(n) }
    val packed = df.agg(array_sort(collect_list(
      struct(ordFields ++ payFields: _*))).as("__a"))
    packed
      .select(posexplode(col("__a")).as(Seq("__pos", "__e")))
      .select(col("__pos").cast("long").as(idxName) +:
        payload.map { case (n, _) => col(s"__e.$n").as(n) }: _*)
  }
}
