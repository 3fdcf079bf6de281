package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous perceptual near-duplicate detection over media payloads —
  * the multimodal twin of [[StreamingNearDup]]: as images/blobs arrive,
  * emit `(id_a, id_b, hamming)` for every pair whose aHash fingerprints
  * share a byte band with Hamming distance <= `maxHamming`, both within
  * the state horizon.
  *
  * Same algorithm as the batch
  * [[graft.operators.Multimodal.phashNearDups]] (identical AHash64
  * fingerprint, 8-bit band keys, Hamming verification — the parity spec
  * asserts equal pair sets), restructured for unbounded input exactly
  * like the text LSH stream:
  *
  *  - fingerprints are a STATELESS projection on the micro-batch scan
  *    (the payload never enters state — only the 8-byte hash does);
  *  - each fingerprint lands in its 8 band buckets via one posexplode,
  *    and `flatMapGroupsWithState` keyed on (band, bucket) keeps the
  *    bucket population `(id, phash, ts)` as state;
  *  - state is pruned by event-time watermark and evicted wholesale by
  *    an event-time timeout at `ts + horizon`.
  *
  * Pairs sharing several bands emit once per shared band
  * (at-least-once); dedup downstream like the batch path's `distinct`.
  */
object StreamingMediaDedup {

  private type Arrival = (String, Long, Long, java.sql.Timestamp)
  private type Resident = (Long, Long, Long)

  def phashPairs(media: DataFrame, idCol: String, payloadCol: String,
                 tsCol: String, watermark: String,
                 maxHamming: Int = 12,
                 horizonMs: Long = 3600000L,
                 bandBits: Int = 16): DataFrame =
    pairsImpl(media, idCol, tsCol, watermark, maxHamming, horizonMs,
      graft.functions.AHash64.aHash(col(payloadCol)), bandBits)

  /** [[phashPairs]] over DECODED media — the true 2-D block aHash
    * ([[graft.operators.Multimodal.phashNearDupsDecoded]]'s
    * fingerprint) instead of the opaque byte-range fallback. This is
    * the right streaming spelling for COMPRESSED formats (PNG, r17):
    * one changed pixel rewrites most deflate bytes, so the opaque hash
    * sees unrelated payloads, while the decoded hash sees the
    * one-block edit. Undecodable payloads (null fingerprint) are
    * dropped from the pair graph here, exactly like the batch twin —
    * route them to dead letter upstream.
    */
  def phashPairsDecoded(media: DataFrame, idCol: String,
                        payloadCol: String, tsCol: String,
                        watermark: String, maxHamming: Int = 12,
                        horizonMs: Long = 3600000L,
                        bandBits: Int = 16): DataFrame =
    pairsImpl(media, idCol, tsCol, watermark, maxHamming, horizonMs,
      graft.functions.MediaCodec.mediaPhash(col(payloadCol)), bandBits)

  private def pairsImpl(media: DataFrame, idCol: String, tsCol: String,
                        watermark: String, maxHamming: Int,
                        horizonMs: Long,
                        hashCol: org.apache.spark.sql.Column,
                        bandBits: Int = 16)
      : DataFrame = {
    require(bandBits > 0 && bandBits < 64 && 64 % bandBits == 0,
      s"bandBits ($bandBits) must divide 64")
    // one-time recall-contract warn (shared with the batch operator):
    // maxHamming above nBands-1 is luck-range under this geometry
    graft.operators.Dedup.warnBandedHammingRecall(64, bandBits,
      maxHamming)
    val spark = media.sparkSession
    import spark.implicits._

    // bandBits is the STATE-size knob, same trade as the batch
    // operator's (Multimodal.phashNearDupsDecoded): 8-bit bands put
    // every fingerprint in 8 of 256 buckets per band, so each
    // (band, bucket) resident list grows ~n/256 and per-arrival work
    // goes quadratic on a large horizon; 16-bit bands (4 × 65,536
    // buckets) cut resident lists 256× and keep pigeonhole certainty
    // for hamming <= 3. Wide-band pairs are an exact subset of the
    // 8-bit pairs (a shared 16-bit band shares both 8-bit halves).
    val bandMask = (1L << bandBits) - 1
    val bandKeys = array((0 until 64 / bandBits).map { b =>
      concat_ws("_", lit(b),
        shiftright(col("phash"), b * bandBits).bitwiseAND(bandMask))
    }: _*)

    val arrivals = media
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("id"),
        hashCol.as("phash"), col(tsCol).as("__ts"))
      .filter(col("phash").isNotNull)
      .select(col("id"), col("phash"), col("__ts"),
        posexplode(bandKeys).as(Seq("band_no", "bk")))
      .select(concat_ws("#", col("band_no"), col("bk")).as("key"),
        col("id"), col("phash"), col("__ts"))
      .as[Arrival]

    def process(key: String, rows: Iterator[Arrival],
                state: GroupState[List[Resident]])
        : Iterator[(Long, Long, Int)] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val wm = state.getCurrentWatermarkMs()
        var residents = state.getOption.getOrElse(Nil)
          .filter(_._3 >= wm)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
        rows.toSeq.map(r => (r._2, r._3, r._4.getTime))
          .sortBy(r => (r._3, r._1)).foreach { case (id, fp, tsMs) =>
            residents.foreach { case (rid, rfp, _) =>
              if (rid != id) {
                val hamming = java.lang.Long.bitCount(fp ^ rfp)
                if (hamming <= maxHamming)
                  out += ((math.min(id, rid), math.max(id, rid), hamming))
              }
            }
            residents = (id, fp, tsMs) :: residents.filterNot(_._1 == id)
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
      .toDF("id_a", "id_b", "hamming")
  }
}
