package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of the scale-critical
  * operators so partition pruning / pushdown / codegen spans can be
  * audited per round (docs/PLANS_r*.md).
  *
  * Usage: runMain graft.PlanAudit <sfDir> [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("cdc_wal2json_decode", "merge_partitioned_incremental",
        "incremental_scan", "dedup_minhash_lsh", "ann_cosine_topk")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      if (n == "partitioned_slice") { explainSlice(spark, sfDir); }
      else if (n == "delta_read") { explainDeltaRead(spark, sfDir); }
      else SparkEntry.queries.get(n) match {
        case Some(fn) =>
          try println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable =>
            println(s"[plan-audit] $n failed: ${e.getMessage}")
          }
        case None => println(s"[plan-audit] unknown query $n")
      }
    }
    spark.stop()
  }

  /** The target-side read inside flushPartitioned's incremental path:
    * partition pruning must reach the scan (PartitionFilters on __p), so
    * per-flush target I/O is the touched buckets only.
    */
  private def explainSlice(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-planaudit").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("_seq", lit(1L))
    graft.sink.MergeSink.flushPartitioned(spark, orders, s"$dir/t",
      Seq("o_orderkey"), "_seq", numParts = 16)
    val target = spark.read.parquet(s"$dir/t")
    val slice = target
      .filter(col(graft.sink.MergeSink.PartCol).isin(3, 7))
      .drop(graft.sink.MergeSink.PartCol)
    println(slice.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
  }

  /** DeltaMerge.readMerged: the base side must show NO Exchange — the
    * delta winners broadcast into the anti-join.
    */
  private def explainDeltaRead(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-planaudit-d").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("_seq", lit(1L))
    graft.sink.DeltaMerge.flushDelta(spark, orders, s"$dir/t",
      Seq("o_orderkey"), "_seq")
    graft.sink.DeltaMerge.flushDelta(spark,
      orders.limit(50).withColumn("_seq", lit(2L)), s"$dir/t",
      Seq("o_orderkey"), "_seq")
    println(graft.sink.DeltaMerge
      .readMerged(spark, s"$dir/t", Seq("o_orderkey"), "_seq")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
  }
}
