package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpecBase

/** StreamingDedup: exact dedup over a stream with watermark-bounded
  * state.
  */
class StreamingDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("first arrival survives; later duplicates within horizon drop") {
    val dir = Files.createTempDirectory("sdedup").toString
    val srcDir = s"$dir/in"
    val outDir = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    Seq(
      (1L, "alpha text", "2024-01-01 00:00:01"),
      (2L, "beta text", "2024-01-01 00:00:02"),
      (3L, "alpha text", "2024-01-01 00:00:03"), // dup of 1 within horizon
      (4L, "gamma text", "2024-01-01 00:00:04"),
      (5L, "beta text", "2024-01-01 00:00:05")   // dup of 2
    ).toDF("doc_id", "text", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
      .coalesce(1).write.parquet(srcDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(srcDir)
    val q = StreamingDedup.dropDupTexts(stream, "text", "ts", "1 hour")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 4L),
      s"expected first arrivals only, got $out")
  }

  test("dropIndexedTexts anti-joins arrivals against the corpus index") {
    val dir = Files.createTempDirectory("sdedup-idx").toString
    val srcDir = s"$dir/in"
    val outDir = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    val idxDir = s"$dir/index"

    // persisted corpus index: "known text" is already in the corpus
    graft.operators.Dedup.exact(
        Seq((10L, "known text"), (11L, "other known"))
          .toDF("doc_id", "text"),
        "doc_id", "text")
      .write.parquet(idxDir)

    Seq((100L, "known text"), (101L, "fresh text"), (102L, "other known"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(srcDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(srcDir)
    val q = StreamingDedup.dropIndexedTexts(stream, "text",
        spark.read.parquet(idxDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(101L), s"only the novel doc survives, got $out")
  }

  test("StreamingDiff classifies arrivals against the old snapshot") {
    val dir = Files.createTempDirectory("sdiff").toString
    val srcDir = s"$dir/in"
    val outDir = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    val snapDir = s"$dir/snap"

    Seq((1L, "same text"), (2L, "old body"))
      .toDF("doc_id", "text").write.parquet(snapDir)
    Seq((1L, "same text"),   // unchanged
        (2L, "new body"),    // changed
        (3L, "brand new"))   // added
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(srcDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(srcDir)
    val q = StreamingDiff.classifyArrivals(stream,
        spark.read.parquet(snapDir), "doc_id", "text")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(outDir)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "added"),
      s"got $out")
    // batch parity: same statuses as CorpusDiff.snapshotDiff (minus the
    // stream-invisible 'removed' rows)
    val batch = graft.operators.CorpusDiff.snapshotDiff(
        spark.read.parquet(snapDir), spark.read.parquet(srcDir),
        "doc_id", "text")
      .filter(col("status") =!= "removed")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(batch == out, s"stream/batch divergence: $batch vs $out")
  }

  test("streaming refresh: diff -> index probe -> lang gate composes") {
    // the continuous spelling of pipeline_incremental_refresh: classify
    // arrivals against the old snapshot, keep added/changed, drop exact
    // dups of the old corpus, gate on language — all stream-stateless
    val dir = Files.createTempDirectory("srefresh").toString
    val srcDir = s"$dir/in"
    val outDir = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    val snapDir = s"$dir/snap"
    val idxDir = s"$dir/index"

    val english = "the quick brown fox jumps over the lazy dog again and"
    val spanish = "el que de la los una por y con para este cada"
    Seq((1L, english + " v0"), (2L, "shared boilerplate page"))
      .toDF("doc_id", "text").write.parquet(snapDir)
    graft.operators.Dedup.exact(
        spark.read.parquet(snapDir), "doc_id", "text")
      .write.parquet(idxDir)
    Seq(
      (1L, english + " v1"),              // changed + en    -> embed
      (2L, "shared boilerplate page"),    // unchanged       -> dropped
      (3L, "shared boilerplate page"),    // added, dup of 2 -> skip_dup
      (4L, spanish),                      // added, not en   -> skip_lang
      (5L, english + " brand new"))       // added + en      -> embed
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(srcDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(srcDir)
    val delta = StreamingDiff.classifyArrivals(stream,
        spark.read.parquet(snapDir), "doc_id", "text")
      .filter(col("status").isin("added", "changed"))
    val novel = StreamingDedup.dropIndexedTexts(delta, "text",
      spark.read.parquet(idxDir))
    val q = novel
      .withColumn("action",
        when(graft.operators.TextAnalysis.langId(col("text")) =!= "en",
          "skip_lang").otherwise("embed"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(outDir)
      .select("doc_id", "action").as[(Long, String)].collect().toMap
    // doc 2 dropped as unchanged, doc 3 dropped by the index anti-join
    // (the streaming spelling of skip_dup: never re-embed known text)
    assert(out == Map(1L -> "embed", 4L -> "skip_lang", 5L -> "embed"),
      s"got $out")
  }
}
