package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-job profiler for registry queries (not part of the
  * driver contract): runs a query through the noop sink with a listener
  * that prints every Spark job's wall time, stage count and task-time
  * sum — the "which internal action dominates this composed operator"
  * question the bench's single per-query number cannot answer.
  *
  * Usage: runMain graft.tools.ProfileJobs <sfDir> <query> [passes]
  *
  * With `SPARK_GRAFT_EXEC_PLANS=1` (r21) it additionally prints, for
  * every SQL action of the recorded pass — including the eager
  * localCheckpoint/Observation boundaries inside composed operators,
  * which go through Dataset.withAction like any collect/save — the
  * EXECUTED plan's operator counts and the plan itself. This is the
  * evidence channel the r20 verdict asked for: `_after` explain dumps
  * of eager-materializing queries show only the final `ExistingRDD`
  * scan, while this shows the stage plans each releaseAfter boundary
  * actually ran.
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileJobs <sfDir> <query> [passes]")
    val (sfDir, name) = (args(0), args(1))
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-jobs")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var taskTimeMs = 0L
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobStart.put(e.jobId, System.nanoTime())
        jobStages.put(e.jobId, e.stageInfos.size)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) {
          taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
          val si = e.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield (c - s) / 1e3).getOrElse(-1.0)
          println(f"[stage] id=${si.stageId}%4d wall=$wall%7.3fs tasks=${
            si.numTasks}%3d run=${si.taskMetrics.executorRunTime / 1e3}%7.2fs ${
            si.name.take(90)}")
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        // getOrDefault: a job already in flight when the listener
        // registers has no recorded start — a bare get would return a
        // null java.lang.Long and NPE on unboxing before the t0 guard
        val t0 = jobStart.getOrDefault(e.jobId, 0L)
        if (record && t0 != 0)
          println(f"[job] id=${e.jobId}%4d wall=${
            (System.nanoTime() - t0) / 1e9}%7.3fs stages=${
            jobStages.getOrDefault(e.jobId, -1)}%2d")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    if (sys.env.get("SPARK_GRAFT_EXEC_PLANS").contains("1")) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = if (record) {
            val p = qe.executedPlan.toString
            println(f"[action] $funcName wall=${durationNs / 1e9}%7.3fs " +
              s"scans=${"Scan parquet".r.findAllIn(p).size} " +
              s"exchanges=${"Exchange".r.findAllIn(p).size} " +
              s"reused=${"ReusedExchange".r.findAllIn(p).size} " +
              s"inmem=${"InMemoryTableScan".r.findAllIn(p).size} " +
              s"bhj=${"BroadcastHashJoin".r.findAllIn(p).size} " +
              s"smj=${"SortMergeJoin".r.findAllIn(p).size} " +
              s"window=${"\\bWindow\\b".r.findAllIn(p).size}")
            println(p)
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }
    val fn = graft.SparkEntry.queries(name)
    (0 until passes).foreach { p =>
      record = p == passes - 1 // print only the last (warm) pass
      taskTimeMs = 0
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[pass $p] $name wall=$wall%7.3fs taskTime=${
        taskTimeMs / 1e3}%8.2fs")
    }
    spark.stop()
  }
}
