package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B for the r20 verdict's connected-components question:
  * does unrolling TWO min-propagation rounds per eager checkpoint (half
  * the driver actions, double the plan depth per action) beat the
  * one-round-per-action loop at a scale where stage cost is measurable?
  * The sf0.1 probe was rejected on projection in r20; this measures it
  * on the StressCC graph (~1.6M edges: 300k chain components, a
  * 100k-leaf star, a 10k path — the adversarial diameter mix).
  *
  *   runMain graft.tools.StressCCUnroll [edgeScale]
  *
  * Variant 1R is the shipped Dedup.connectedComponents; variant 2R is
  * the same loop with two (a)+(b) rounds fused between checkpoints.
  * Label parity is asserted exactly (union-distinct). Timings are
  * bench-style (cold + 3 passes, canary-normalized).
  */
object StressCCUnroll {
  def main(args: Array[String]): Unit = {
    val scale = if (args.nonEmpty) args(0).toLong else 1L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the StressCC graph, scaled: chains of 5, one viral star, one
    // worst-case-diameter path
    val chains = spark.range(1500000L * scale)
      .filter(col("id") % 5 =!= 4)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val star = spark.range(100000L * scale)
      .select(lit(10000000L * scale).as("id_a"),
        (col("id") + 10000000L * scale + 1).as("id_b"))
    val path = spark.range(9999L)
      .select((col("id") + 20000000L * scale).as("id_a"),
        (col("id") + 20000000L * scale + 1).as("id_b"))
    val edges = chains.union(star).union(path)
      .localCheckpoint(true) // fixture, outside every timed region

    def oneR(): DataFrame =
      graft.operators.Dedup.connectedComponents(edges, "id_a", "id_b")

    // the 2R variant: identical algorithm, two lowered+jumped rounds
    // between eager checkpoints; convergence still fingerprint-fused
    def twoR(): DataFrame = {
      import org.apache.spark.storage.StorageLevel
      val sym = edges.select(explode(array(
          struct(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v")),
          struct(col("id_b").cast("long").as("u"), col("id_a").cast("long").as("v"))))
          .as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      def checkpointWithFp(l: DataFrame): (DataFrame, java.math.BigDecimal) = {
        val obs = org.apache.spark.sql.Observation()
        val out = l.observe(obs,
          sum(col("comp").cast("decimal(38,0)")).as("fp"))
          .localCheckpoint(true)
        val fp = Option(obs.get("fp"))
          .map(_.asInstanceOf[java.math.BigDecimal])
          .getOrElse(java.math.BigDecimal.ZERO)
        (out, fp)
      }
      def round(labels: DataFrame): DataFrame = {
        val viaEdges = sym
          .join(labels.select(col("id").as("v"), col("comp").as("vcomp")), "v")
          .groupBy(col("u").as("id")).agg(min(col("vcomp")).as("ncomp"))
        val lowered = labels.join(viaEdges, Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        lowered
          .join(lowered.select(col("id").as("comp"), col("comp").as("pcomp")),
            Seq("comp"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("pcomp"), col("comp"))).as("comp"))
      }
      var (labels, fp) = checkpointWithFp(
        sym.groupBy(col("u").as("id"))
          .agg(min(col("v")).as("mv"))
          .select(col("id"), least(col("id"), col("mv")).as("comp")))
      var converged = false
      var it = 0
      while (!converged && it < 25) {
        val (jumped, nfp) = checkpointWithFp(round(round(labels)))
        converged = nfp.compareTo(fp) == 0
        fp = nfp
        labels = jumped
        it += 1
      }
      sym.unpersist()
      require(converged, "2R did not converge in 25 outer iterations")
      labels.select(col("id"), col("comp").as("component_id"))
    }

    // parity: exact
    val (c1, c2) = (oneR().count(), twoR().count())
    val du = oneR().union(twoR()).distinct().count()
    require(c1 == c2 && du == c1, s"variants diverge: $c1 $c2 union=$du")
    println(s"[cc-unroll] parity: rows=$c1 distinct-union=$du")

    def time(name: String)(f: () => DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save() // cold
      spark.catalog.clearCache()
      val ts = (1 to 3).map { _ =>
        val c = graft.BenchEnv.canary()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (w, w / c.mtSec)
      }
      println(f"[cc-unroll] $name median=${ts.map(_._1).sorted.apply(1)}%7.3fs " +
        f"canary_units=${ts.map(_._2).sorted.apply(1)}%8.2f")
    }
    time("1R(shipped)")(oneR _)
    time("2R(unroll) ")(twoR _)
    spark.stop()
  }
}
