package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line {"metric":...,"queries":{...}} on stdout AND
  * writes the same line to SPARK_GRAFT_BENCH_OUT (default
  * /root/repo/bench_out.json) so the result survives log-prefix mangling.
  *
  * Measurement: one cold pass (plan + janino codegen compile — excluded),
  * then SPARK_GRAFT_BENCH_ITERS (default 3) steady-state passes; the
  * reported per-query number is the MEDIAN across passes (single runs on
  * sub-second queries carry ±40% scheduler noise).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        // surface it: a swallowed failure would read as a fast query
        System.err.println(s"bench: $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop datasets the query persisted: each invocation re-persists
      // fresh RDDs, so 4 passes x 23 queries would otherwise pile ~90
      // leftover cached datasets into executor storage and skew the
      // later, memory-sensitive measurements (GC + eviction pressure)
      spark.catalog.clearCache()
      dt
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    val cold = SparkEntry.benchQueries.map(n => n -> once(n))
    val passes = (1 to math.max(1, iters))
      .map(_ => SparkEntry.benchQueries.map(n => n -> once(n)).toMap)
    val med = SparkEntry.benchQueries.map(n =>
      n -> median(passes.map(_(n))))
    val qs = med.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = med.map(_._2).sum
    val coldTotal = cold.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cold_total_sec":$coldTotal%.3f,"iterations":${passes.size},"measurement":"per-query median of ${passes.size} steady-state runs (1st-run plan+codegen compile excluded; cache cleared between queries so each run pays its own persists - no cross-run InMemoryRelation reuse)"}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"bench: could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}
