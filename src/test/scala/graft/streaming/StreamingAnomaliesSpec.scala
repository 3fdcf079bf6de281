package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.types.StructType
import graft.SparkSpecBase

/** StreamingAnomalies: additive exact moments; alerts judged against
  * the previous epoch's stats; per-epoch alert overwrite.
  */
class StreamingAnomaliesSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "event_id BIGINT, metric STRING, value DOUBLE")

  // moments are maintained in decimal(38,0); compare as BigInt
  private def readStats(path: String): Map[String, (BigInt, BigInt, BigInt)] =
    spark.read.parquet(path).select("metric", "n", "s", "s2")
      .as[(String, java.math.BigDecimal, java.math.BigDecimal,
        java.math.BigDecimal)].collect()
      .map(r => r._1 -> ((BigInt(r._2.toBigInteger),
        BigInt(r._3.toBigInteger), BigInt(r._4.toBigInteger)))).toMap

  private def readAlerts(path: String, batch: Long): Set[Long] =
    spark.read.parquet(s"$path/batch=$batch")
      .select("event_id").as[Long].collect().toSet

  // a tight metric around 10.00 (v_q = 1000); epoch 2 carries one wild
  // outlier plus in-band values
  private val b1 = (1L to 20L).map(i => (i, "m", 10.0 + 0.01 * (i % 3)))
  private val b2 = Seq((21L, "m", 10.01), (22L, "m", 500.0),
    (23L, "m", 9.99))

  test("alerts fire against prior stats; moments stay retrain-exact") {
    val dir = Files.createTempDirectory("sanom").toString
    val srcDir = s"$dir/in"; val state = s"$dir/stats"
    val alerts = s"$dir/alerts"; val ckpt = s"$dir/ck"
    new java.io.File(srcDir).mkdirs()

    b1.toDF("event_id", "metric", "value").coalesce(1)
      .write.parquet(s"$srcDir/f1")
    val q1 = StreamingAnomalies.start(spark, s"$srcDir/*", schema, state,
      alerts, ckpt, "metric", "value", "event_id")
    q1.processAllAvailable(); q1.stop()
    // first epoch: stats seeded, no alerts by contract
    assert(readAlerts(alerts, 0L).isEmpty)
    val vq1 = b1.map(r => BigInt(math.floor(r._3 * 100 + 0.5).toLong))
    assert(readStats(state) ==
      Map("m" -> ((BigInt(20), vq1.sum, vq1.map(v => v * v).sum))))

    // epoch 2: the 500.0 reading is a >3-sigma outlier vs epoch-1 stats;
    // the in-band values are not
    b2.toDF("event_id", "metric", "value").coalesce(1)
      .write.parquet(s"$srcDir/f2")
    val q2 = StreamingAnomalies.start(spark, s"$srcDir/*", schema, state,
      alerts, ckpt, "metric", "value", "event_id")
    q2.processAllAvailable(); q2.stop()
    assert(readAlerts(alerts, 1L) == Set(22L))
    // stats now cover both epochs exactly
    val vqAll =
      (b1 ++ b2).map(r => BigInt(math.floor(r._3 * 100 + 0.5).toLong))
    assert(readStats(state) ==
      Map("m" -> ((BigInt(23), vqAll.sum, vqAll.map(v => v * v).sum))))
  }

  test("moments and z-test survive values whose products overflow long") {
    // v_q ~ 5e9, so Σv ~ 1e11 and S·S ~ 1e22 — far past 2^63; with
    // 64-bit math the guard would wrap negative and invert the test
    val big1 = (1L to 20L).map(i => (i, "m", 5.0e7 + 100.0 * (i % 3)))
    val big2 = Seq((21L, "m", 5.0e7 + 100.0), (22L, "m", 9.9e8),
      (23L, "m", 5.0e7 - 100.0))
    val dir = Files.createTempDirectory("sanom3").toString
    val state = s"$dir/stats"; val alerts = s"$dir/alerts"
    StreamingAnomalies.applyBatch(big1.toDF("event_id", "metric", "value"),
      0L, state, alerts, "metric", "value", "event_id", 3)
    StreamingAnomalies.applyBatch(big2.toDF("event_id", "metric", "value"),
      1L, state, alerts, "metric", "value", "event_id", 3)
    assert(readAlerts(alerts, 1L) == Set(22L),
      "only the 20x outlier fires; in-band big values must not")
    val vqAll =
      (big1 ++ big2).map(r => BigInt(math.floor(r._3 * 100 + 0.5).toLong))
    assert(readStats(state) ==
      Map("m" -> ((BigInt(23), vqAll.sum, vqAll.map(v => v * v).sum))),
      "Σv² must accumulate exactly past the long range")
  }

  test("replayed epoch skips stats AND rewrites identical alerts") {
    val dir = Files.createTempDirectory("sanom2").toString
    val state = s"$dir/stats"; val alerts = s"$dir/alerts"
    val df1 = b1.toDF("event_id", "metric", "value")
    val df2 = b2.toDF("event_id", "metric", "value")
    StreamingAnomalies.applyBatch(df1, 0L, state, alerts, "metric",
      "value", "event_id", 3)
    StreamingAnomalies.applyBatch(df2, 1L, state, alerts, "metric",
      "value", "event_id", 3)
    val stats = readStats(state)
    // at-least-once replay of epoch 1: marker skips the stats merge
    StreamingAnomalies.applyBatch(df2, 1L, state, alerts, "metric",
      "value", "event_id", 3)
    assert(readStats(state) == stats, "replay must not double-count")
    assert(readAlerts(alerts, 1L) == Set(22L))
  }
}
