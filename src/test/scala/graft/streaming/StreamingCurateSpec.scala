package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpecBase

/** StreamingCurate: the continuous curation gate — language + quality
  * filters as stateless projections, normalized-text dedup with
  * watermark-bounded state, checkpointed resume across restarts.
  */
class StreamingCurateSpec extends SparkSpecBase {
  import spark.implicits._

  private val good =
    (1 to 10).map(i => s"the quick brown fox jumps over that fence$i")
      .mkString(" ") // en, 80 words, passes every Gopher rule
  private val goodVariant = good.toUpperCase + "!!" // normalizes to same
  private val french =
    (1 to 10).map(i => s"le chat est dans la maison et le jardin$i")
      .mkString(" ")
  private val tooShort = "the quick brown fox"

  private def writeBatch(dir: String, rows: Seq[(Long, String, String)],
                         name: String): Unit =
    rows.toDF("doc_id", "text", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
      .coalesce(1).write.mode("append").parquet(dir)

  private def runStream(srcDir: String, outDir: String,
                        ckpt: String): Unit = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(srcDir)
    val q = StreamingCurate.curate(stream, "text", "ts",
        lang = "en", minWords = 20, watermark = "1 hour")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
  }

  test("gates language + quality statelessly, dedups normalized text") {
    val dir = Files.createTempDirectory("scurate").toString
    writeBatch(s"$dir/in", Seq(
      (1L, good, "2024-01-01 00:00:01"),
      (2L, french, "2024-01-01 00:00:02"),      // language gate
      (3L, tooShort, "2024-01-01 00:00:03"),    // quality gate
      (4L, goodVariant, "2024-01-01 00:00:04"), // normalized dup of 1
      (5L, good + " extra", "2024-01-01 00:00:05")), "b0")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt")
    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 5L), s"got $out")
  }

  test("dedup state survives a checkpointed restart") {
    val dir = Files.createTempDirectory("scurate2").toString
    writeBatch(s"$dir/in", Seq(
      (1L, good, "2024-01-01 00:00:01")), "b0")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt")
    // second run, same checkpoint: a normalized dup of doc 1 arrives
    // within the watermark horizon plus a genuinely new doc
    writeBatch(s"$dir/in", Seq(
      (2L, goodVariant, "2024-01-01 00:10:00"),
      (3L, good + " fresh", "2024-01-01 00:10:01")), "b1")
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt")
    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L),
      s"dup across restart must drop via checkpointed state, got $out")
  }

  test("curateCleaned collapses re-crawls differing in repeated chunks") {
    val dir = Files.createTempDirectory("scurate3").toString
    // doc 2 = doc 1 plus an exact repeat of its first 8-word chunk:
    // after intra-doc cleanup both hash identically -> doc 2 drops.
    // doc 3 genuinely differs after cleanup.
    val base = good
    val rep = base.split(" ").take(8).mkString(" ")
    writeBatch(s"$dir/in", Seq(
      (1L, base, "2024-01-01 00:00:01"),
      (2L, base + " " + rep, "2024-01-01 00:00:02"),
      (3L, base + " genuinely novel tail", "2024-01-01 00:00:03")), "b0")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .parquet(s"$dir/in")
    val q = StreamingCurate.curateCleaned(stream, "text", "ts",
        lang = "en", minWords = 20, chunkWords = 8, watermark = "1 hour")
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L), s"got $out")
  }
}
