package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure full-rewrite flush vs partitioned incremental flush
  * for a small batch against a large target — the scale claim behind
  * MergeSink.flushPartitioned, in numbers (docs/MERGE_SCALING.md).
  *
  * Usage: runMain graft.MergeBench <sfDir> [batchRows] [numParts]
  */
object MergeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchRows = args.lift(1).map(_.toInt).getOrElse(1000)
    val numParts = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-merge-bench")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val clustered = args.lift(3).contains("clustered")
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("_seq", lit(1L))
    val pks = Seq("l_orderkey", "l_linenumber")
    // clustered mode: all batch keys fall in ONE bucket — the
    // slowly-changing / ranged-update case bucket skipping exists for
    val pool =
      if (clustered)
        base.filter(graft.sink.MergeSink.pkBucket(pks, numParts) === 3)
      else base
    val batch = pool.orderBy("l_orderkey", "l_linenumber").limit(batchRows)
      .withColumn("_seq", lit(2L))
      .withColumn("l_comment", lit("updated"))
    val dir = java.nio.file.Files.createTempDirectory("mergebench").toString

    def dirBytes(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val path = new org.apache.hadoop.fs.Path(p)
      if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
    }
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // bytes of files written since t0 — the rewrite amplification metric
    // (wall time at toy scale is fixed job overhead; I/O is what scales)
    def bytesNewer(p: String, t0: Long): Long = {
      val f = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val it = f.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var n = 0L
      while (it.hasNext) {
        val st = it.next()
        if (st.getModificationTime >= t0) n += st.getLen
      }
      n
    }

    // seed both layouts with the same target
    val fullT = s"$dir/full"
    val partT = s"$dir/part"
    graft.sink.MergeSink.flush(spark, base, fullT, pks, "_seq")
    graft.sink.MergeSink.flushPartitioned(spark, base, partT, pks, "_seq",
      numParts)
    val targetRows = base.count()
    val targetBytes = dirBytes(fullT)

    // warm both paths once (plan/codegen), on a throwaway copy
    graft.sink.MergeSink.flush(spark, batch, fullT, pks, "_seq")
    graft.sink.MergeSink.flushPartitioned(spark, batch, partT, pks, "_seq",
      numParts)

    val w0 = System.currentTimeMillis()
    val tFull = timed(
      graft.sink.MergeSink.flush(spark, batch, fullT, pks, "_seq"))
    val fullBytes = bytesNewer(fullT, w0)
    val w1 = System.currentTimeMillis()
    val tPart = timed(
      graft.sink.MergeSink.flushPartitioned(spark, batch, partT, pks,
        "_seq", numParts))
    val partBytes = bytesNewer(partT, w1)

    // merge-on-read path: flush is O(batch); the read pays a broadcast
    // anti-join over the unshuffled base
    val deltaT = s"$dir/delta"
    graft.sink.DeltaMerge.flushDelta(spark, base, deltaT, pks, "_seq")
    graft.sink.DeltaMerge.flushDelta(spark, batch, deltaT, pks, "_seq")
    val tDelta = timed(
      graft.sink.DeltaMerge.flushDelta(spark, batch, deltaT, pks, "_seq"))
    val tRead = timed(
      graft.sink.DeltaMerge.readMerged(spark, deltaT, pks, "_seq")
        .agg(count(lit(1))).head())
    val tReadBase = timed(
      spark.read.parquet(fullT).agg(count(lit(1))).head())

    val touched = batch
      .select(graft.sink.MergeSink.pkBucket(pks, numParts)).distinct()
      .count()
    println(f"""{"target_rows":$targetRows,"target_bytes":$targetBytes,""" +
      f""""batch_rows":$batchRows,"num_parts":$numParts,""" +
      f""""touched_parts":$touched,""" +
      f""""full_rewrite_sec":$tFull%.3f,""" +
      f""""full_rewrite_bytes":$fullBytes,""" +
      f""""partitioned_sec":$tPart%.3f,""" +
      f""""partitioned_bytes":$partBytes,""" +
      f""""delta_flush_sec":$tDelta%.3f,""" +
      f""""merged_read_sec":$tRead%.3f,""" +
      f""""plain_read_sec":$tReadBase%.3f}""")
    spark.stop()
  }
}
