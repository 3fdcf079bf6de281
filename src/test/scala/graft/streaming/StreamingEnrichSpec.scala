package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpecBase

/** StreamingEnrich: watermarked stream-stream interval join. */
class StreamingEnrichSpec extends SparkSpecBase {
  import spark.implicits._

  test("interval join attributes clicks to in-horizon signups only") {
    val dir = Files.createTempDirectory("senrich").toString
    Seq((1L, 100L, "2024-01-01 10:00:00"),   // signup u1
        (2L, 200L, "2024-01-01 12:00:00"))   // signup u2
      .toDF("signup_id", "user_id", "signup_ts")
      .withColumn("signup_ts", col("signup_ts").cast("timestamp"))
      .coalesce(1).write.parquet(s"$dir/signups")
    Seq((10L, 100L, "2024-01-01 10:30:00"),  // in horizon for u1
        (11L, 100L, "2024-01-01 11:30:00"),  // outside 1h horizon
        (12L, 200L, "2024-01-01 11:59:00"),  // BEFORE u2's signup
        (13L, 200L, "2024-01-01 12:45:00"),  // in horizon for u2
        (14L, 300L, "2024-01-01 10:10:00"))  // no signup for u3
      .toDF("click_id", "user_id", "click_ts")
      .withColumn("click_ts", col("click_ts").cast("timestamp"))
      .coalesce(1).write.parquet(s"$dir/clicks")

    val clicks = spark.readStream
      .schema("click_id LONG, user_id LONG, click_ts TIMESTAMP")
      .parquet(s"$dir/clicks")
    val signups = spark.readStream
      .schema("signup_id LONG, user_id LONG, signup_ts TIMESTAMP")
      .parquet(s"$dir/signups")
    val q = StreamingEnrich.intervalJoin(clicks, signups,
        keys = Seq("user_id"), leftTs = "click_ts", rightTs = "signup_ts",
        horizon = "1 hour", watermark = "10 minutes")
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(s"$dir/out")
      .select("click_id", "signup_id").as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 1L), (13L, 2L)), s"got $out")
  }

  test("colliding non-key column names are rejected") {
    val a = Seq((1L, "2024-01-01 00:00:00")).toDF("k", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    intercept[IllegalArgumentException] {
      StreamingEnrich.intervalJoin(a, a, Seq("k"), "ts", "ts",
        "1 hour", "1 minute")
    }
  }
}
