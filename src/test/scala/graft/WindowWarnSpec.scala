package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, Sketches}

/** Closes the PlanLint blind spot: operators that return lineage-CUT
  * frames (releaseAfter's eager localCheckpoint) show the registry lint
  * only a bare `Scan ExistingRDD`, so a partition-less WindowExec
  * hiding in their INTERNAL stages would never turn the lint red. But
  * WindowExec logs "No Partition Defined" at planning time regardless
  * of lineage — this spec runs the heavy lineage-cut operators under a
  * log capture and fails on ANY such warning. (The r13 sweep removed
  * the last bounded-frame global windows — hyperplane seed indexing,
  * trainCentroids seeding, quantile prefix offsets — via
  * BoundedRank/packed prefix sums; this pins them removed.)
  */
class WindowWarnSpec extends SparkSpecBase {

  private class Capture extends AbstractAppender(
      "graft-window-warn-capture", null, null, false, null) {
    val hits = new java.util.concurrent.atomic.AtomicInteger
    override def append(e: LogEvent): Unit =
      if (e.getMessage.getFormattedMessage.contains("No Partition Defined"))
        hits.incrementAndGet()
  }

  test("lineage-cut operators plan zero partition-less windows") {
    val cap = new Capture
    cap.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(cap, Level.WARN, null)
    ctx.updateLoggers()
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      // every operator here returns an RDD-backed frame the registry
      // lint cannot see through
      Dedup.embeddingNearDups(emb, "vec_id", "embedding")
        .write.format("noop").mode("overwrite").save()
      Dedup.minhashPrecision(docs, "doc_id", "text").count()
      Sketches.hashSampleQuantiles(docs, "doc_id",
        length(col("text")).cast("long"), 0.5, Seq(0.5, 0.9)).count()
      Similarity.trainCentroids(emb, "vec_id", "embedding",
        k = 8, iterations = 1).count()
      assert(cap.hits.get == 0,
        s"${cap.hits.get} partition-less WindowExec warnings fired " +
          "inside lineage-cut operators — a hidden global window")
    } finally {
      cfg.getRootLogger.removeAppender("graft-window-warn-capture")
      ctx.updateLoggers()
      cap.stop()
    }
  }

  test("the capture itself sees a planted partition-less window") {
    val cap = new Capture
    cap.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(cap, Level.WARN, null)
    ctx.updateLoggers()
    try {
      import org.apache.spark.sql.expressions.Window
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("rn",
          row_number().over(Window.orderBy(col("event_id"))))
        .write.format("noop").mode("overwrite").save()
      assert(cap.hits.get > 0,
        "planted global window produced no warning — capture is blind")
    } finally {
      cfg.getRootLogger.removeAppender("graft-window-warn-capture")
      ctx.updateLoggers()
      cap.stop()
    }
  }
}
