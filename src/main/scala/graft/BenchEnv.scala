package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Machine-context instrumentation for the bench harness — makes a
  * contended run DETECTABLE from the artifact instead of requiring
  * judge-side forensics (the round-9 driver bench ran on a ~7×-contended
  * sandbox and its numbers read as a 3× regression until a clean re-run
  * disproved it; see BASELINE.md "Detecting a contended run").
  *
  * Signals, strongest first:
  *  - **runqueue wait** (`/proc/self/task/<tid>/schedstat` field 2, summed
  *    over all JVM threads): nanoseconds our runnable threads spent
  *    waiting for a CPU. On an idle machine this is ~0 relative to CPU
  *    time; under external load it grows in direct proportion to how
  *    often other processes preempt us. `wait / cpu` is therefore a
  *    near-pure external-contention ratio, unaffected by our own
  *    parallelism (our 32 runnable threads on 32 cores wait on each
  *    other only when someone else holds a core).
  *  - **process CPU vs wall**: low CPU utilization with high wall can
  *    also mean I/O or scheduling overhead, so it is recorded for
  *    context, not used for the flag.
  *  - **loadavg before/after**: whole-machine context (includes us).
  *
  * All reads are Linux-procfs best-effort: on a platform without them the
  * fields are absent and the flag stays false (no signal ≠ contended).
  */
object BenchEnv {

  /** Per-pass snapshot deltas, all in seconds. */
  final case class PassEnv(wallSec: Double, cpuSec: Option[Double],
                           runqWaitSec: Option[Double]) {
    def json: String = {
      def opt(v: Option[Double]) = v.map(x => f"$x%.3f").getOrElse("null")
      f"""{"wall_sec":$wallSec%.3f,"cpu_sec":${opt(cpuSec)},"runq_wait_sec":${opt(runqWaitSec)}}"""
    }
  }

  /** Total process CPU time (user+sys, all threads), ns. */
  def processCpuNs(): Option[Long] =
    Try {
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        .getProcessCpuTime
    }.toOption.filter(_ >= 0)

  /** Sum of runqueue-wait ns over every live thread of this process.
    * Threads that die between snapshots under-count slightly — fine for
    * a contention flag (the bench's executor pool is stable).
    */
  def runqWaitNs(): Option[Long] = Try {
    val tasks = Files.list(Paths.get("/proc/self/task"))
    try {
      tasks.iterator().asScala.flatMap { t =>
        Try {
          val parts = new String(Files.readAllBytes(
            t.resolve("schedstat")), "UTF-8").trim.split("\\s+")
          parts(1).toLong
        }.toOption
      }.sum
    } finally tasks.close()
  }.toOption

  /** The three loadavg numbers, if readable. */
  def loadavg(): Option[Seq[Double]] = Try {
    new String(Files.readAllBytes(Paths.get("/proc/loadavg")), "UTF-8")
      .trim.split("\\s+").take(3).toSeq.map(_.toDouble)
  }.toOption

  /** Measure `f`, returning its value plus the pass deltas. */
  def measurePass[T](f: => T): (T, PassEnv) = {
    val w0 = System.nanoTime()
    val c0 = processCpuNs()
    val q0 = runqWaitNs()
    val out = f
    val wall = (System.nanoTime() - w0) / 1e9
    val cpu = for { a <- c0; b <- processCpuNs() } yield (b - a) / 1e9
    val wait = for { a <- q0; b <- runqWaitNs() } yield (b - a) / 1e9
    (out, PassEnv(wall, cpu, wait))
  }

  /** Runqueue-wait-to-CPU ratio above which a pass is called contended.
    * Idle-machine baseline for this harness (32 busy threads on 32
    * cores) measures < 0.05; the r9 incident would have measured ~6.
    * 0.25 flags anything stealing ≳ a fifth of our cycles while staying
    * far above self-scheduling noise.
    */
  val ContendedWaitRatio = 0.25

  /** A run is contended when the MEDIAN pass shows external runqueue
    * pressure (median, so one noisy pass among clean ones does not
    * condemn the run — and one clean pass cannot launder a loaded one).
    * Passes with near-zero CPU (nothing measured) are skipped.
    */
  def contended(passes: Seq[PassEnv]): Boolean = {
    val ratios = passes.flatMap(waitRatio)
    ratios.nonEmpty && median(ratios) > ContendedWaitRatio
  }

  def waitRatio(p: PassEnv): Option[Double] = for {
    c <- p.cpuSec if c > 0.05
    w <- p.runqWaitSec
  } yield w / c

  /** Whether ONE measurement (a single query's measured window) was
    * taken under external runqueue pressure — the per-query burst
    * flag. Same ratio and threshold as the run-level [[contended]],
    * but no median: the point is to attribute a single-query host
    * burst (the BENCH_r18 cdc_wal2json ×31 reading) from the artifact
    * alone, and a burst confined to one query IS the single sample.
    */
  def burst(p: PassEnv): Boolean =
    waitRatio(p).exists(_ > ContendedWaitRatio)

  /** Of several measurements of the same query, the one whose wall is
    * the reported median (lower-middle on even counts — a real
    * measured pass, never an interpolated one): the env that belongs
    * to the number of record.
    */
  def medianWallEnv(envs: Seq[PassEnv]): PassEnv = {
    require(envs.nonEmpty, "medianWallEnv of no measurements")
    val s = envs.sortBy(_.wallSec)
    s((s.size - 1) / 2)
  }

  /** Compact per-query env JSON: the median-wall pass's numbers plus
    * its burst verdict.
    */
  def queryJson(p: PassEnv): String = {
    def opt(v: Option[Double]) = v.map(x => f"$x%.3f").getOrElse("null")
    val ratio = waitRatio(p).map(x => f"$x%.4f").getOrElse("null")
    f"""{"wall_sec":${p.wallSec}%.3f,"cpu_sec":${opt(p.cpuSec)},"runq_wait_sec":${opt(p.runqWaitSec)},"wait_cpu_ratio":$ratio,"burst":${burst(p)}}"""
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  // ---------------------------------------------------------------- canary

  /** Host-speed calibration sample: wall seconds for a FIXED amount of
    * CPU-bound integer work, measured single-threaded and across all
    * cores. The work is constant, so the wall scales inversely with the
    * host's effective speed — hypervisor frequency throttling and
    * steal-time bands that are INVISIBLE to runq-wait (three consecutive
    * BENCH artifacts read ×7-11 high on identical code with
    * runq_wait ≈ 0 and needed a manual control re-run to adjudicate)
    * show up directly as inflated canary walls. Dividing a query's wall
    * by the same pass's mt canary yields a host-speed-independent
    * "canary units" number; two artifacts' canaries give the exact
    * rescale factor between their hosts/boots.
    */
  final case class CanarySample(oneThreadSec: Double, mtSec: Double,
                                threads: Int) {
    def json: String =
      f"""{"one_thread_sec":$oneThreadSec%.4f,"mt_sec":$mtSec%.4f,"threads":$threads}"""
  }

  /** splitmix64 finalizer chain — pure register arithmetic, no memory
    * traffic, so the measured wall tracks effective CPU frequency and
    * available core share, not cache or DRAM state. The running value
    * feeds the next iteration (a true dependency chain the JIT cannot
    * vectorize away) and escapes via the return value.
    */
  private def mixChain(iters: Long, seed: Long): Long = {
    var x = seed
    var i = 0L
    while (i < iters) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      x = z ^ (z >>> 31)
      i += 1
    }
    x
  }

  /** Iteration counts sized for ~100-200 ms per phase on an idle modern
    * core — long enough to average over scheduler ticks, short enough
    * that two phases per pass cost ~2% of a typical pass.
    */
  private val CanaryIters1T = 80L * 1000 * 1000
  private val CanaryItersPerThread = 40L * 1000 * 1000

  // DCE guard: the JIT must observe every kernel result escaping
  @volatile private var canarySink: Long = 0L

  private lazy val canaryWarm: Unit = {
    // one warmup per JVM so C2 compiles the kernel before the first
    // measured sample — otherwise the cold pass's canary reads slow and
    // "normalizes" the cold numbers fast
    canarySink ^= mixChain(CanaryIters1T / 8, 1L)
    val _ = canaryOnce()
  }

  private def canaryOnce(): CanarySample = {
    val n = math.max(1, Runtime.getRuntime.availableProcessors)
    val w0 = System.nanoTime()
    canarySink ^= mixChain(CanaryIters1T, 42L)
    val oneT = (System.nanoTime() - w0) / 1e9
    val results = new java.util.concurrent.atomic.AtomicLong(0L)
    val w1 = System.nanoTime()
    val threads = (0 until n).map { t =>
      val th = new Thread(() => {
        results.addAndGet(mixChain(CanaryItersPerThread, t + 7L))
      })
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    val mt = (System.nanoTime() - w1) / 1e9
    canarySink ^= results.get()
    CanarySample(oneT, mt, n)
  }

  /** One calibration sample (after a once-per-JVM JIT warmup). */
  def canary(): CanarySample = { canaryWarm; canaryOnce() }

  /** JSON object fragment describing a whole run. */
  def runJson(passes: Seq[PassEnv], loadBefore: Option[Seq[Double]],
              loadAfter: Option[Seq[Double]]): String = {
    def load(v: Option[Seq[Double]]) =
      v.map(_.map(x => f"$x%.2f").mkString("[", ",", "]")).getOrElse("null")
    val ratios = passes.flatMap(waitRatio)
    val ratio =
      if (ratios.isEmpty) "null" else f"${median(ratios)}%.4f"
    s"""{"passes":${passes.map(_.json).mkString("[", ",", "]")},""" +
      s""""loadavg_before":${load(loadBefore)},""" +
      s""""loadavg_after":${load(loadAfter)},""" +
      s""""avail_processors":${Runtime.getRuntime.availableProcessors},""" +
      s""""median_wait_cpu_ratio":$ratio,""" +
      s""""contended":${contended(passes)}}"""
  }
}
