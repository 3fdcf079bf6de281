package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpecBase
import graft.operators.TextSearch

/** StreamingMonitor: stateless standing-query alerting over arriving
  * documents — phrase (decontamination) and conjunctive (topic) probes.
  */
class StreamingMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  test("phraseAlerts fires per contained phrase with counts, in-stream") {
    val dir = Files.createTempDirectory("smonitor").toString
    Seq(
      (1L, "the quick brown fox and the quick brown fox again"),
      (2L, "nothing to see here"),
      (3L, "benchmark answer key inside"),
      (4L, "brown quick the")) // words present, sequence absent
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(s"$dir/in")
    val q = StreamingMonitor.phraseAlerts(stream, "text",
        Seq("Quick  Brown", "answer key"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id", "phrase", "n_hits")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      (1L, "quick brown", 2L),
      (3L, "answer key", 1L)))
  }

  test("phraseAlerts matches batch phraseSearch on the same corpus") {
    val docs = Seq((1L, "a b c a b"), (2L, "b a"), (3L, "a b"))
      .toDF("doc_id", "text")
    val monitor = StreamingMonitor.phraseAlerts(docs, "text", Seq("a b"))
      .select("doc_id", "n_hits")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = TextSearch.phraseSearch(docs, "doc_id", "text", "a b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(monitor == batch && monitor == Set((1L, 2L), (3L, 1L)))
  }

  test("conjunctiveAlerts scores with frozen stats; missing df fails loudly") {
    val docs = Seq(
      (1L, "q q w"), (2L, "q only"), (3L, "w w q"))
      .toDF("doc_id", "text")
    // frozen stats as a published index would carry them: df over a
    // 4-doc corpus snapshot
    val out = StreamingMonitor.conjunctiveAlerts(docs, "text",
        Seq("q", "w"), Map("q" -> 4L, "w" -> 3L), nDocs = 4L)
      .select("doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // idfW: q = 4e6/4 = 1000000, w = 4e6//3 = 1333333
    assert(out == Set(
      (1L, 2L * 1000000L + 1333333L),
      (3L, 1000000L + 2L * 1333333L)))
    val err = intercept[IllegalArgumentException] {
      StreamingMonitor.conjunctiveAlerts(docs, "text",
        Seq("q", "zebra"), Map("q" -> 4L), nDocs = 4L)
    }
    assert(err.getMessage.contains("zebra"))
  }
}
