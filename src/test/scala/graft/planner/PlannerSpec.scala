package graft.planner

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.json4s.JLong
import graft.SparkSpecBase
import graft.spec._
import graft.state.Bookmarks

class PlannerSpec extends SparkSpecBase {
  import spark.implicits._

  test("routing: no bookmark -> snapshot; bookmark -> incremental; " +
    "log_based -> streaming") {
    val inc = StreamSpec("s-t", "t", Seq("id"),
      ReplicationMethod.Incremental, Some("id"))
    assert(Planner.plan(inc, Bookmarks.empty) == Planner.InitialSnapshot)
    val withBm = Bookmarks.empty.updated("s-t",
      Map("replication_key_value" -> JLong(5L)))
    assert(Planner.plan(inc, withBm) == Planner.IncrementalFrom(JLong(5L)))
    val cdc = inc.copy(replicationMethod = ReplicationMethod.LogBased)
    assert(Planner.plan(cdc, Bookmarks.empty) == Planner.StreamingCdc)
  }

  test("two-run incremental pipeline: snapshot then delta-only upsert") {
    val dir = Files.createTempDirectory("planner").toString
    val src = s"$dir/src"
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "seq")
      .write.parquet(src)
    val pipeline = PipelineSpec("p1",
      Seq(StreamSpec("s-t", "t", Seq("id"),
        ReplicationMethod.Incremental, Some("seq"))),
      targetPath = s"$dir/tgt", statePath = s"$dir/state.json")
    // run 1: initial snapshot, bookmark = max(seq) = 20
    val st1 = Planner.run(spark, pipeline, _ => src)
    assert(st1.replicationKeyValue("s-t").contains(JLong(20L)))
    assert(spark.read.parquet(s"$dir/tgt/t").count() == 2)
    // new source rows arrive (seq 30) + an update of id=2 (seq 25)
    Seq((2L, "b2", 25L), (3L, "c", 30L)).toDF("id", "v", "seq")
      .write.mode("append").parquet(src)
    // run 2: incremental picks up seq >= 20 only and upserts
    val st2 = Planner.run(spark, pipeline, _ => src)
    assert(st2.replicationKeyValue("s-t").contains(JLong(30L)))
    val out = spark.read.parquet(s"$dir/tgt/t")
      .orderBy("id").select("id", "v").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // metadata columns present
    val cols = spark.read.parquet(s"$dir/tgt/t").columns.toSet
    assert(cols.contains("_sdc_extracted_at") &&
      cols.contains("_sdc_deleted_at"))
  }

  test("bookmark capture rides the merge scan — no second source scan") {
    // unique dir-name marker so executed plans that scan the source are
    // identifiable in the listener
    val dir = Files.createTempDirectory("plannerscan").toString
    val src = s"$dir/src"
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "seq")
      .write.parquet(src)
    val pipeline = PipelineSpec("p1",
      Seq(StreamSpec("s-t", "t", Seq("id"),
        ReplicationMethod.Incremental, Some("seq"))),
      targetPath = s"$dir/tgt", statePath = s"$dir/state.json")
    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (qe.executedPlan.toString.contains("plannerscan") &&
            qe.executedPlan.toString.contains("/src")) scans.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val st = Planner.run(spark, pipeline, _ => src)
      // bookmark still captured correctly, via the observed metric
      assert(st.replicationKeyValue("s-t").contains(JLong(20L)))
      // listener delivery is async: wait for the first event, then drain
      val deadline = System.currentTimeMillis + 10000
      while (System.currentTimeMillis < deadline && scans.get == 0)
        Thread.sleep(100)
      Thread.sleep(1000)
      assert(scans.get == 1,
        s"source was scanned ${scans.get} times; expected exactly 1")
    } finally spark.listenerManager.unregister(listener)
  }
}
