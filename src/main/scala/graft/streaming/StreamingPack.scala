package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous sequence packing — the streaming twin of
  * [[graft.operators.Sampling.packSequences]]: documents arrive on a
  * stream, are tokenized with the learned vocabulary, laid end to end
  * per shard, and emitted as fixed-`seqLen` training sequences AS THEY
  * FILL — the pack that training reads minutes after the crawl lands,
  * instead of after a batch rebuild.
  *
  * Same decomposition as the batch packer: documents hash-shard into
  * `numShards` independent pack streams, and packing is sequential only
  * WITHIN a shard. Spark shape:
  *
  *  - tokenization ([[graft.functions.GreedyTokenIds]]) is a stateless
  *    codegen projection on the micro-batch scan — text never enters
  *    state, only token-id arrays do;
  *  - `flatMapGroupsWithState` keyed on shard holds `(next_pack_no,
  *    carry_buffer)`: the buffer is ALWAYS < seqLen tokens after a batch
  *    (full packs are emitted eagerly), so state is bounded by
  *    `numShards × seqLen` ints regardless of stream length;
  *  - within a micro-batch, docs pack in `(event-time, id)` order —
  *    deterministic under replay of the same micro-batch;
  *  - a partial trailing pack flushes (marked `is_final`) when the
  *    event-time watermark passes `last arrival + flushHorizonMs`, so an
  *    idle shard's tail reaches training instead of waiting forever;
  *    numbering continues if the shard wakes up again.
  *
  * Output (Append mode): `(shard, pack_no, n_tokens, token_ids,
  * is_final)` — every non-final pack holds exactly `seqLen` tokens.
  * Exactly-once: packs ride the streaming sink's transaction log
  * (checkpointed state + file-sink manifest), asserted by the restart
  * spec.
  */
object StreamingPack {

  private type Arrival = (Int, Long, java.sql.Timestamp, Seq[Int])
  private type PackState = (Long, Seq[Int])
  private type Packed = (Int, Long, Long, Seq[Int], Boolean)

  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    tsCol: String, vocab: Seq[String], seqLen: Int,
                    numShards: Int, watermark: String,
                    flushHorizonMs: Long = 3600000L): DataFrame = {
    require(seqLen > 0, s"seqLen ($seqLen) must be positive")
    require(numShards > 0, s"numShards ($numShards) must be positive")
    val spark = docs.sparkSession
    import spark.implicits._

    val arrivals = docs
      .withWatermark(tsCol, watermark)
      .select(
        pmod(graft.functions.StableHash.hash60(col(idCol).cast("string")),
          lit(numShards)).cast("int").as("shard"),
        col(idCol).cast("long").as("id"),
        col(tsCol).as("__ts"),
        graft.functions.GreedyTokenIds.tokenIds(col(textCol), vocab)
          .as("ids"))
      .as[Arrival]

    def process(shard: Int, rows: Iterator[Arrival],
                state: GroupState[PackState]): Iterator[Packed] = {
      if (state.hasTimedOut) {
        val (next, buf) = state.get
        if (buf.isEmpty) Iterator.empty
        else {
          // flush the partial tail; numbering continues on wake-up
          state.update((next + 1, Nil))
          Iterator.single((shard, next, buf.size.toLong, buf, true))
        }
      } else {
        var (next, buf) = state.getOption.getOrElse((0L, Seq.empty[Int]))
        val out = scala.collection.mutable.ArrayBuffer[Packed]()
        var maxTs = Long.MinValue
        rows.toSeq.sortBy(r => (r._3.getTime, r._2)).foreach { r =>
          maxTs = math.max(maxTs, r._3.getTime)
          var acc = buf ++ r._4
          while (acc.length >= seqLen) {
            out += ((shard, next, seqLen.toLong, acc.take(seqLen), false))
            next += 1
            acc = acc.drop(seqLen)
          }
          buf = acc
        }
        state.update((next, buf))
        if (maxTs != Long.MinValue)
          state.setTimeoutTimestamp(maxTs + flushHorizonMs)
        out.iterator
      }
    }

    arrivals
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process)
      .toDF("shard", "pack_no", "n_tokens", "token_ids", "is_final")
  }
}
