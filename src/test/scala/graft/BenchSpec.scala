package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

class BenchSpec extends SparkSpecBase {

  test("a broken query is recorded in failed, not as a fast entry") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok" -> ((s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }),
      "broken" -> ((s, _) => s.read.parquet("/nonexistent/graft/path")))
    // quiet the expected FAILED line
    val old = System.err
    System.setErr(new java.io.PrintStream(
      new java.io.ByteArrayOutputStream(), true, "UTF-8"))
    val (json, summary, failed) =
      try Bench.run(spark, sfDir, iters = 1, Seq("ok", "broken"), qs)
      finally System.setErr(old)
    assert(failed == Seq("broken"),
      "main exits non-zero exactly when this list is non-empty")
    assert(json.contains("\"failed\":[\"broken\"]"), json)
    assert(json.contains("\"methodology_version\":2"), json)
    assert(summary.contains("\"failed\":[\"broken\"]"), summary)
  }

  test("an all-green run reports no failures and carries env context") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok" -> ((s, _) => { import s.implicits._; Seq(1).toDF("x") }))
    val (json, summary, failed) = Bench.run(spark, sfDir, iters = 1, Seq("ok"), qs)
    assert(failed.isEmpty)
    assert(json.contains("\"failed\":[]"), json)
    // machine-context fields present and parse-shaped
    assert(json.contains("\"env\":{\"passes\":["), json)
    assert(json.contains("\"contended\":"), json)
    assert(json.contains("\"median_wait_cpu_ratio\":"), json)
    // the summary line is the one the harness's 2 KB stdout-tail capture
    // must always hold whole: bounded size regardless of registry growth
    // (top-5 heaviest only), and itself a complete JSON object carrying
    // the headline total + contention verdict
    assert(summary.length < 1200,
      s"summary line must stay far under the 2 KB tail capture: " +
        s"${summary.length} bytes")
    assert(summary.startsWith("{\"metric\":\"total\",\"value\":"), summary)
    assert(summary.endsWith("}"), summary)
    assert(summary.contains("\"contended\":"), summary)
    assert(summary.contains("\"top5\":{"), summary)
  }

  test("contended flag fires under synthetic CPU oversubscription") {
    // burn 3x the cores with runnable threads: our measured workload's
    // threads (and the burners themselves) then spend a large fraction
    // of their runnable time waiting on the runqueue — exactly the
    // external-pressure signal the flag keys on. On an idle machine the
    // same workload alone measures a near-zero wait/cpu ratio.
    val cores = Runtime.getRuntime.availableProcessors
    def work(): Unit = {
      // a real CPU-bound workload (not sleep): several compute threads
      val ts = (1 to math.max(2, cores / 4)).map { _ =>
        val t = new Thread(() => {
          var acc = 0.0
          var i = 0
          while (i < 40000000) { acc += math.sqrt(i.toDouble); i += 1 }
          if (acc < 0) throw new IllegalStateException("unreachable")
        })
        t.start(); t
      }
      ts.foreach(_.join())
    }
    // probe FIRST, burners not yet started: if the machine running this
    // suite is itself already loaded, the calm-side assertion cannot
    // distinguish our signal from real pressure — cancel (inconclusive)
    // rather than flake. On a quiet machine this also proves the
    // workload alone does NOT trip the flag (it keys on EXTERNAL
    // pressure, not on parallelism).
    val (_, calm) = BenchEnv.measurePass(work())
    assume(!BenchEnv.contended(Seq(calm)),
      s"suite machine already loaded (ratio=${BenchEnv.waitRatio(calm)})" +
        " - contention test inconclusive here")
    val stop2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val burners2 = (1 to cores * 3).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop2.get()) { x += 1; if (x == Long.MaxValue) x = 0 }
      })
      t.setDaemon(true); t.start(); t
    }
    try {
      val (_, loaded) = BenchEnv.measurePass(work())
      val r = BenchEnv.waitRatio(loaded)
      assert(r.nonEmpty, s"no wait/cpu signal measured: $loaded")
      assert(BenchEnv.contended(Seq(loaded)),
        s"expected contended under ${cores * 3} burner threads: " +
          s"ratio=$r env=$loaded")
    } finally {
      stop2.set(true)
      burners2.foreach(_.join(2000))
    }
  }

  test("per-query env: burst flag and median-wall attribution (synthetic)") {
    import BenchEnv.PassEnv
    // a host burst: 86 s of wall on 5 s of CPU with 40 s of runqueue
    // wait (the BENCH_r18 cdc_wal2json shape) — flagged
    assert(BenchEnv.burst(PassEnv(86.0, Some(5.0), Some(40.0))))
    // a busy-but-uncontended query: high CPU, negligible wait — clean
    assert(!BenchEnv.burst(PassEnv(4.0, Some(100.0), Some(1.0))))
    // no signal != contended
    assert(!BenchEnv.burst(PassEnv(4.0, None, None)))
    // the env of record is the median-WALL pass's env, a real pass
    val envs = Seq(
      PassEnv(1.0, Some(30.0), Some(0.1)),
      PassEnv(86.0, Some(5.0), Some(40.0)),
      PassEnv(2.0, Some(31.0), Some(0.2)))
    assert(BenchEnv.medianWallEnv(envs).wallSec == 2.0,
      "median wall of (1, 86, 2) is 2 — the burst pass must NOT be " +
        "the env of record when the median dodged it")
    assert(!BenchEnv.burst(BenchEnv.medianWallEnv(envs)))
    // when the burst IS the median (persistent pressure), it is flagged
    val all = Seq(
      PassEnv(80.0, Some(5.0), Some(38.0)),
      PassEnv(86.0, Some(5.0), Some(40.0)),
      PassEnv(90.0, Some(5.0), Some(44.0)))
    assert(BenchEnv.burst(BenchEnv.medianWallEnv(all)))
  }

  test("a query measured under synthetic load lands in contended_queries") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "victim" -> ((s, _) => {
        // CPU-bound driver-side work inside the measured window so the
        // process accrues cpu and (under burners) runqueue wait
        var acc = 0.0
        var i = 0
        while (i < 40000000) { acc += math.sqrt(i.toDouble); i += 1 }
        import s.implicits._
        Seq(acc).toDF("x")
      }))
    // calm control: on a quiet machine the victim alone must NOT flag
    val (jsonCalm, _, _) = Bench.run(spark, sfDir, iters = 1,
      Seq("victim"), qs)
    assert(jsonCalm.contains("\"query_env\":{\"victim\":{\"wall_sec\":"),
      jsonCalm)
    assume(jsonCalm.contains("\"contended_queries\":[]"),
      "suite machine already loaded - per-query burst test inconclusive")
    val cores = Runtime.getRuntime.availableProcessors
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val burners = (1 to cores * 3).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop.get()) { x += 1; if (x == Long.MaxValue) x = 0 }
      })
      t.setDaemon(true); t.start(); t
    }
    try {
      val (json, summary, _) = Bench.run(spark, sfDir, iters = 1,
        Seq("victim"), qs)
      assert(json.contains("\"contended_queries\":[\"victim\"]"),
        s"burst under ${cores * 3} burners must be attributed to the " +
          s"query: $json")
      assert(summary.contains("\"n_contended_queries\":1"), summary)
    } finally {
      stop.set(true)
      burners.foreach(_.join(2000))
    }
  }
}
