package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpecBase
import graft.streaming.StatefulSessions._

class StatefulSessionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("flatMapGroupsWithState closes sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = sessionize(input.toDS(), gapSeconds = 1800)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_out").start()

    // batch 1: two events 10s apart -> one open session, nothing emitted
    input.addData(SessionEvent(1L, 1000000L, 5.0),
      SessionEvent(1L, 11000000L, 7.0))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() == 0)

    // batch 2: an event 2h later closes the first session
    input.addData(SessionEvent(1L, 7200000000L, 1.0))
    q.processAllAvailable()
    val out = spark.table("sessions_out").as[ClosedSession].collect()
    q.stop()
    assert(out.length == 1)
    assert(out.head == ClosedSession(1L, 1000000L, 11000000L, 2, 12.0))
  }
}
