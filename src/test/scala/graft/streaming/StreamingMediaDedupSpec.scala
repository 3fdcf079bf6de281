package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpecBase
import graft.operators.Multimodal

/** StreamingMediaDedup: continuous perceptual near-dup pairs with
  * bounded bucket state — batch parity, cross-batch memory through a
  * checkpointed restart.
  */
class StreamingMediaDedupSpec extends SparkSpecBase {
  import spark.implicits._

  // payloads: a base byte pattern, a one-byte tweak (near-dup), and two
  // unrelated diverse patterns
  private val base =
    (0 until 256).map(i => ((i * 37) % 251).toByte).toArray
  private val tweaked = {
    val t = base.clone(); t(100) = (t(100) ^ 0x7f).toByte; t
  }
  private val other =
    (0 until 256).map(i => ((i * 113 + 55) % 241).toByte).toArray
  private val third =
    (0 until 256).map(i => ((i * 59 + 17) % 239).toByte).toArray

  private def writeBatch(dir: String,
                         rows: Seq[(Long, Array[Byte], String)]): Unit =
    rows.toDF("media_id", "payload", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
      .coalesce(1).write.mode("append").parquet(dir)

  private def runStream(srcDir: String, outDir: String,
                        ckpt: String): Unit = {
    val stream = spark.readStream
      .schema("media_id LONG, payload BINARY, ts TIMESTAMP")
      .parquet(srcDir)
    val q = StreamingMediaDedup.phashPairs(stream, "media_id", "payload",
        "ts", watermark = "1 hour", maxHamming = 12,
        horizonMs = 3600000L)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
  }

  private def pairs(outDir: String): Set[(Long, Long)] =
    spark.read.parquet(outDir).select("id_a", "id_b").distinct()
      .as[(Long, Long)].collect().toSet

  test("streaming media pairs match the batch operator") {
    val media = Seq((1L, base), (2L, tweaked), (3L, other), (4L, third))
    val batchPairs = Multimodal.phashNearDups(
        media.toDF("media_id", "payload"), "media_id", "payload",
        maxHamming = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(batchPairs.contains((1L, 2L)), s"fixture sanity: $batchPairs")

    val dir = Files.createTempDirectory("smedia").toString
    writeBatch(s"$dir/in",
      media.map { case (id, p) => (id, p, s"2024-01-01 00:00:0$id") })
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt")
    assert(pairs(s"$dir/out") == batchPairs)
  }

  test("wide-band (16-bit) streaming pairs match the wide-band batch " +
      "operator and stay a subset of the 8-bit pairs") {
    // a wider fixture so band collisions actually differ between the
    // two widths: 6 clusters of (base, one-byte tweak) + 2 singles
    def pat(mul: Int, add: Int) =
      (0 until 256).map(i => ((i * mul + add) % 251).toByte).toArray
    val clusters = Seq(37 -> 0, 113 -> 55, 59 -> 17, 73 -> 5, 89 -> 29,
      101 -> 3).zipWithIndex.flatMap { case ((m, a), c) =>
        val b = pat(m, a)
        val t = b.clone(); t(100 + c) = (t(100 + c) ^ 0x7f).toByte
        Seq((c * 2 + 1L, b), (c * 2 + 2L, t))
      } ++ Seq((101L, pat(131, 7)), (102L, pat(151, 11)))
    val df = clusters.toDF("media_id", "payload")
    def batchPairs(bb: Int) = Multimodal.phashNearDups(df, "media_id",
        "payload", maxHamming = 12, bandBits = bb)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val (narrow, wide) = (batchPairs(8), batchPairs(16))
    assert(wide.nonEmpty && wide.subsetOf(narrow),
      s"wide batch pairs must be a non-empty subset: $wide vs $narrow")

    val dir = Files.createTempDirectory("smedia-wide").toString
    writeBatch(s"$dir/in", clusters.map { case (id, p) =>
      (id, p, f"2024-01-01 00:00:${id % 60}%02d") })
    val stream = spark.readStream
      .schema("media_id LONG, payload BINARY, ts TIMESTAMP")
      .parquet(s"$dir/in")
    val q = StreamingMediaDedup.phashPairs(stream, "media_id",
        "payload", "ts", watermark = "1 hour", maxHamming = 12,
        horizonMs = 3600000L, bandBits = 16)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(pairs(s"$dir/out") == wide,
      "wide-band stream must equal the wide-band batch pair set")
  }

  test("near-dup medium in a later micro-batch pairs from state") {
    val dir = Files.createTempDirectory("smedia2").toString
    writeBatch(s"$dir/in", Seq(
      (1L, base, "2024-01-01 00:00:01"),
      (3L, other, "2024-01-01 00:00:02")))
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt")
    assert(pairs(s"$dir/out").isEmpty)
    // the tweak arrives later via a RESTARTED query: the pair must come
    // from checkpointed bucket state
    writeBatch(s"$dir/in", Seq((2L, tweaked, "2024-01-01 00:10:00")))
    runStream(s"$dir/in", s"$dir/out", s"$dir/ckpt")
    assert(pairs(s"$dir/out") == Set((1L, 2L)))
  }

  test("decoded streaming dedup pairs one-pixel-edited PNGs (r17): " +
      "opaque byte hashing cannot, decoded phash can, and the stream " +
      "matches the batch decoded operator") {
    // two PNGs differing by ONE pixel: the compressed byte streams
    // diverge wholesale (deflate), the decoded pixels barely move
    def grayPng(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (r <- 0 until h; c <- 0 until w)
        img.getRaster.setSample(c, r, 0, px(r * w + c))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val px = Array.tabulate(16 * 16)(i =>
      if ((i / 16 + i % 16) % 3 == 0) 220 else (i * 11) % 128)
    val edited = px.clone(); edited(40) = (edited(40) + 90) % 256
    val unrelated = Array.tabulate(16 * 16)(i => (i * 97 + 13) % 256)
    val media = Seq((1L, grayPng(16, 16, px)),
      (2L, grayPng(16, 16, edited)), (3L, grayPng(16, 16, unrelated)),
      (4L, "not an image at all".getBytes)) // dead-letter, not a pair

    val batchPairs = Multimodal.phashNearDupsDecoded(
        media.toDF("media_id", "payload"), "media_id", "payload",
        maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(batchPairs == Set((1L, 2L)),
      s"fixture sanity (batch decoded): $batchPairs")
    // the opaque byte hash misses the pair — the artifact decoded
    // hashing exists to fix on compressed formats
    val opaque = Multimodal.phashNearDups(
        media.toDF("media_id", "payload"), "media_id", "payload",
        maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!opaque.contains((1L, 2L)),
      s"fixture sanity: opaque hash must miss the PNG pair, got $opaque")

    val dir = Files.createTempDirectory("smedia-png").toString
    writeBatch(s"$dir/in",
      media.map { case (id, p) => (id, p, s"2024-01-01 00:00:0$id") })
    val stream = spark.readStream
      .schema("media_id LONG, payload BINARY, ts TIMESTAMP")
      .parquet(s"$dir/in")
    val q = StreamingMediaDedup.phashPairsDecoded(stream, "media_id",
        "payload", "ts", watermark = "1 hour", maxHamming = 6,
        horizonMs = 3600000L)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(pairs(s"$dir/out") == batchPairs,
      "streaming decoded pairs must match the batch decoded operator")
  }
}
