package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState: gap-based session
  * windows over the event stream (SURVEY.md engine mapping for the
  * reference's stateful consumers — the CDC poll loops and the
  * update-buffering pattern all reduce to keyed state + emit-on-trigger).
  *
  * A session closes when a new event for the key arrives more than
  * `gapSeconds` after the previous one; the completed session is emitted
  * and the new event opens fresh state. State is per-key and bounded
  * (one open session per key), so a 1000-executor cluster shards it by
  * the group key with no global coordination.
  */
object StatefulSessions {

  final case class SessionEvent(user_id: Long, ts_micros: Long,
                                value: Double)
  final case class OpenSession(start: Long, last: Long, n: Long,
                               total: Double)
  final case class ClosedSession(user_id: Long, start_micros: Long,
                                 end_micros: Long, n_events: Long,
                                 total_value: Double)

  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long)
      : Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    val gapMicros = gapSeconds * 1000000L
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[SessionEvent],
         state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_micros, e.value))
          val closed = Seq.newBuilder[ClosedSession]
          var open = state.getOption
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_micros - s.last > gapMicros =>
                closed += ClosedSession(userId, s.start, s.last, s.n, s.total)
                open = Some(OpenSession(e.ts_micros, e.ts_micros, 1, e.value))
              case Some(s) =>
                open = Some(s.copy(last = e.ts_micros, n = s.n + 1,
                  total = s.total + e.value))
              case None =>
                open = Some(OpenSession(e.ts_micros, e.ts_micros, 1, e.value))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
