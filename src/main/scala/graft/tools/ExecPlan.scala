package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run one registry query and summarize its EXECUTED plan
  * (post-AQE) — scan/reuse/exchange/join counts. The initial formatted
  * plan (PlanAudit/Explain) shows what the planner intends; this shows
  * what actually ran, which is how the duplicate-signature-pipeline
  * issue was found (self-join sides never hit ReusedExchange — the
  * alias-renamed sides defeat sameResult — so un-persisted LSH
  * signature frames recomputed the corpus scan per side).
  *
  * Usage: runMain graft.tools.ExecPlan <sfDir> <queryName> [nobc]
  * (`nobc` disables broadcast joins to preview the large-cluster SMJ
  * shape at local scale).
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1)
    val noBc = args.length > 2 && args(2) == "nobc"
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (noBc) b.config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // cold pass (plan+codegen) then a timed steady-state pass, matching
    // the bench methodology closely enough for before/after comparisons
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    val p = df.queryExecution.executedPlan.toString
    println(f"scans=${"Scan parquet".r.findAllIn(p).size} " +
      s"reused=${"ReusedExchange".r.findAllIn(p).size} " +
      s"exchanges=${"Exchange".r.findAllIn(p).size} " +
      s"bhj=${"BroadcastHashJoin".r.findAllIn(p).size} " +
      s"smj=${"SortMergeJoin".r.findAllIn(p).size} " +
      f"steady_sec=$secs%.3f")
    spark.stop()
  }
}
