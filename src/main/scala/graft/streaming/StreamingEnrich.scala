package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming enrichment joins — the continuous counterparts of the batch
  * [[graft.operators.RangeJoin]] attribution shape: two unbounded event
  * streams joined on a key within an event-time window.
  *
  * Spark-native stream-stream inner join with watermarks on BOTH sides
  * and a closed time-range predicate: the range condition is what lets
  * the state store evict — each side buffers only rows younger than
  * (watermark + horizon), so state is bounded by arrival rate x horizon,
  * never by stream length. Without the time bound Spark would
  * (correctly) refuse to plan the join with append semantics.
  */
object StreamingEnrich {

  /** Inner interval join: left rows matched to same-key right rows with
    * `rightTs <= leftTs <= rightTs + horizon` (the "click within an hour
    * of signup" attribution shape, continuously).
    *
    * Column names must be disjoint across the two sides except `keys`
    * (the output carries the left key columns once).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, horizon: String,
                   watermark: String): DataFrame = {
    require(keys.nonEmpty, "interval join requires at least one key")
    val overlap = right.columns
      .filter(c => left.columns.contains(c) && !keys.contains(c))
    require(overlap.isEmpty, s"column names collide: ${overlap.toSeq}")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      l(leftTs) >= r(rightTs) &&
      l(leftTs) <= r(rightTs) + expr(s"interval $horizon")
    l.join(r, cond, "inner")
      .select((left.columns.map(l(_)) ++
        right.columns.filterNot(keys.contains).map(r(_))).toIndexedSeq: _*)
  }
}
