package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.StableHash

/** Continuous minhash-LSH near-duplicate detection — the fuzzy
  * counterpart of [[StreamingDedup]]: as documents arrive, emit
  * `(id_a, id_b)` for every near-dup pair whose members both arrived
  * within the state horizon.
  *
  * Same algorithm as the batch [[graft.operators.Dedup.minhashNearDups]]
  * (identical shingles, permutations, band keys, and signature-agreement
  * verification — the parity spec asserts equal pair sets), restructured
  * for unbounded input:
  *
  *  - signatures are computed STATELESSLY per document (array_min over
  *    the doc's own shingle hashes — no explode/groupBy, so the
  *    signature stage rides the micro-batch scan);
  *  - each doc lands in its band buckets via one posexplode, and
  *    `flatMapGroupsWithState` keyed on (band, bucket) keeps the bucket
  *    population `(id, signature, ts)` as state. A new arrival compares
  *    against its bucket's residents only — the same inverted-index
  *    bound as the batch operator, never all-pairs;
  *  - state is pruned by event-time watermark and evicted wholesale by
  *    an event-time timeout at `ts + horizon`, so bucket state holds
  *    (docs per horizon per bucket), never the corpus.
  *
  * Pairs sharing several band buckets are emitted once per shared
  * bucket (at-least-once detection); dedup downstream if exactly-once
  * pair sets matter — e.g. `dropDuplicatesWithinWatermark` on a carried
  * event time, or the batch connected-components pass that consumes
  * these pairs anyway.
  */
object StreamingNearDup {

  private type Arrival = (String, Long, Seq[Long], java.sql.Timestamp)
  private type Resident = (Long, Seq[Long], Long)

  /** @param watermark  event-time watermark duration (e.g. "1 hour");
    *                   also the pairing horizon — residents older than
    *                   the watermark are pruned
    * @param horizonMs  state-eviction timeout in ms; set it to at least
    *                   the watermark duration
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   tsCol: String, watermark: String,
                   k: Int = 3, numHashes: Int = 12, rowsPerBand: Int = 3,
                   threshold: Double = 0.5,
                   horizonMs: Long = 3600000L): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand")
    val spark = docs.sparkSession
    import spark.implicits._

    // the per-row signature/band scalars shared with the SQL surface
    // (graft_minhash_sigs / graft_minhash_bands) — one implementation
    // for every stateless-signature consumer
    val sh = array_distinct(
      graft.functions.TextShingles.wordShingles(col(textCol), k))
    val sigArr =
      graft.functions.ProbeFunctions.minhashSigs(col(textCol), k, numHashes)
    val bandKeys = graft.functions.ProbeFunctions.minhashBands(
      col("sig"), numHashes, rowsPerBand)

    val arrivals = docs
      .withWatermark(tsCol, watermark)
      .filter(size(sh) > 0)
      .select(col(idCol).cast("long").as("id"), sigArr.as("sig"),
        col(tsCol).as("__ts"))
      .select(col("id"), col("sig"), col("__ts"),
        posexplode(bandKeys).as(Seq("band_no", "bk")))
      // keep the timestamp-typed column: the watermark tag rides the
      // attribute, and event-time timeout needs it visible here
      .select(concat_ws("#", col("band_no"), col("bk")).as("key"),
        col("id"), col("sig"), col("__ts"))
      .as[Arrival]

    val agreeMin = threshold // fraction of equal signature positions

    def process(key: String, rows: Iterator[Arrival],
                state: GroupState[List[Resident]])
        : Iterator[(Long, Long)] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val wm = state.getCurrentWatermarkMs()
        var residents = state.getOption.getOrElse(Nil)
          .filter(_._3 >= wm)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        // deterministic within-batch order
        rows.toSeq.map(r => (r._2, r._3, r._4.getTime))
          .sortBy(r => (r._3, r._1)).foreach {
          case (id, sig, tsMs) =>
            residents.foreach { case (rid, rsig, _) =>
              if (rid != id) {
                var agree = 0
                var i = 0
                while (i < sig.length) {
                  if (sig(i) == rsig(i)) agree += 1
                  i += 1
                }
                if (agree.toDouble / sig.length >= agreeMin)
                  out += ((math.min(id, rid), math.max(id, rid)))
              }
            }
            residents = (id, sig, tsMs) ::
              residents.filterNot(_._1 == id)
        }
        if (residents.isEmpty) state.remove()
        else {
          state.update(residents)
          state.setTimeoutTimestamp(residents.map(_._3).max + horizonMs)
        }
        out.iterator
      }
    }

    arrivals
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process)
      .toDF("id_a", "id_b")
  }
}
