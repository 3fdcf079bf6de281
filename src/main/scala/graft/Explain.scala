package graft

import org.apache.spark.sql.SparkSession

/** Plan-dump tool: prints the formatted physical plan of registry
  * queries — the per-round EXPLAIN audit (docs/PLANS_r*.md) without
  * hand-driving a shell. Usage:
  * `runMain graft.Explain <sfDir> <name1,name2,...>`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.benchQueries
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      // composed pipelines end in an EAGER localCheckpoint
      // (Dedup.releaseAfter), so building the DataFrame already ran the
      // interesting stages and the remaining plan is just the
      // checkpointed scan — flag it instead of presenting a vacuous plan
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("ExistingRDD"))
        println("NOTE: query materializes eagerly (releaseAfter " +
          "localCheckpoint); the plan below only scans the checkpoint — " +
          "audit the stage plans in the operator code/specs instead")
      df.explain("formatted")
    }
    spark.stop()
  }
}
