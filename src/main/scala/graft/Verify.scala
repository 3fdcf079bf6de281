package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args.length > 3) {
      System.err.println(
        "usage: graft.Verify <sfDir> <outDir> [name,name,...]")
      sys.exit(2)
    }
    val sfDir = args(0); val outDir = args(1)
    // optional dev-loop filter: only dump the named queries. A typo must
    // fail loudly — an empty output dir otherwise looks like a clean run.
    val only: Option[Set[String]] =
      if (args.length == 3) Some(args(2).split(',').toSet) else None
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        System.err.println(
          s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
        sys.exit(2)
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as long + convert
      // (see graft.queries.Q.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // fixture-drift diagnostic first: when the driver regenerates a
    // fixture with a type the engine can't read, the per-query failures
    // below all share this one root cause — name it once, pointedly.
    // Diagnostic only: queries still run so their individual markers dump.
    graft.catalog.FixtureContract.check(spark, sfDir).foreach(v =>
      System.err.println(s"[verify] fixture-contract: $v"))
    // oracle_sql.json is written BEFORE the dump (r21): the r20 driver
    // run was killed on a wall-clock budget mid-verify and left NO
    // oracle file, so the driver's diff produced an empty CORRECTNESS
    // artifact instead of a partial one. The oracle map is pure
    // metadata — flushing it first means any prefix of the dump below
    // is already a checkable partial result.
    writeOracleJson(outDir)
    val failed = dumpAll(spark, sfDir, outDir, only)
    spark.stop()
    // Honesty guard (mirrors Bench.scala): a query that throws must fail
    // the whole run — otherwise the driver's CORRECTNESS file silently
    // shrinks and every listed row still reads green.
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] FAILED ${failed.size} queries: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }

  /** Queries deferred to the END of the dump (r21): the handful of
    * rows that dominate verify wall time — iterative cluster
    * resolution, the inline index-build probe family, the composed
    * curation/retrieval pipelines and the streaming maintainers. A
    * driver-side wall-clock kill now truncates the EXPENSIVE TAIL, not
    * a random prefix: the ~220 cheap rows land first (measured: they
    * are >90% of the registry but <40% of the dump wall at sf0.01).
    * Membership = every query that took >2.5s in a timed sf0.01 dump
    * on this host (see OPTIMIZATION_r21.md), by name so the order is
    * stable across Map iteration changes.
    */
  private[graft] val slowLast: Set[String] = Set(
    "dedup_connected_components", "dedup_incremental_components",
    "pipeline_curate_corpus", "pipeline_spec_curate",
    "pipeline_spec_jaccard", "pipeline_spec_simhash",
    "pipeline_spec_mixture", "pipeline_boilerplate_dedup",
    "pipeline_weighted_mixture", "pipeline_spec_retrieval",
    "pipeline_spec_hybrid", "sql_curate_tvf",
    "dedup_semantic_pairs", "dedup_semantic_pairs_scale",
    "dedup_semantic_against", "dedup_semantic_against_index",
    "dedup_semantic_rebuild_swap", "dedup_minhash_lsh",
    "dedup_minhash_precision", "dedup_minhash_containment",
    "dedup_minhash_capped", "dedup_ngram_jaccard", "dedup_edit_verified",
    "dedup_minhash_against_bloomed", "dedup_minhash_against_postings",
    "dedup_minhash_maintained_probe", "dedup_embedding_maintained_probe",
    "dedup_incremental_minhash", "dedup_incremental_jaccard",
    "dedup_incremental_simhash", "dedup_incremental_embedding",
    "dedup_incremental_embedding_scale", "dedup_incremental_exact",
    "dedup_incremental_runs", "more_like_this", "more_like_this_bm25",
    "decontam_semantic", "cdc_wal2json_decode", "cdc_slot_drain",
    "cdc_slot_drain_delta", "pipeline_cdc_rollup")

  /** Dumps each selected query to `outDir/<name>` parquet; on failure
    * writes `outDir/<name>/_ERROR.json` instead. Returns failed names.
    * Order: name-sorted cheap rows first, the [[slowLast]] tail last,
    * one parquet flush per query — a budget kill yields a maximal
    * partial CORRECTNESS file instead of an empty one. */
  def dumpAll(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Set[String]] = None): Seq[String] =
    SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy { case (name, _) => (slowLast.contains(name), name) }
      .flatMap { case (name, fn) =>
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          // per-query progress on stderr (flushed): a killed run's log
          // shows exactly how far the dump got and what each row cost
          System.err.println(f"[verify] $name ok in ${
            (System.nanoTime() - t0) / 1e9}%.2fs")
          // drop any cache a query leaked (mirrors Bench): 237 dumps in
          // one session would otherwise accumulate persisted frames and
          // slow the tail queries with eviction/GC pressure
          spark.catalog.clearCache()
          None
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          val dir = Paths.get(s"$outDir/$name")
          // drop any partial parquet output — the driver must see the
          // error marker, never a half-written "result"
          if (Files.exists(dir)) {
            import scala.jdk.CollectionConverters._
            Files.walk(dir).iterator().asScala.toSeq.reverse
              .foreach(p => Files.deleteIfExists(p))
          }
          Files.createDirectories(dir)
          Files.writeString(dir.resolve("_ERROR.json"),
            s"""{"query": ${jstr(name)}, "err": ${jstr(
              s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}")}}""")
          Some(name)
        }
      }

  def writeOracleJson(outDir: String): Unit = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
