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
    val failed = dumpAll(spark, sfDir, outDir, only)
    writeOracleJson(outDir)
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

  /** Dumps each selected query to `outDir/<name>` parquet; on failure
    * writes `outDir/<name>/_ERROR.json` instead. Returns failed names. */
  def dumpAll(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Set[String]] = None): Seq[String] =
    SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
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
