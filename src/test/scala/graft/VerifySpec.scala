package graft

/** Honesty guard for the correctness dump (mirrors BenchSpec): a query
  * that throws must surface as a returned failure AND an on-disk
  * `_ERROR.json` marker — never as a silently-absent entry. Round 10/11
  * lost 15 regressions for two rounds because the old Verify swallowed
  * exceptions and exited 0. */
class VerifySpec extends SparkSpecBase {

  test("dumpAll surfaces a failing query as _ERROR.json + failed name") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify").toString
    // `only` filter limits the run to one cheap green query and one
    // guaranteed-broken name from the real registry... but the registry
    // has no broken entries (that's the point), so drive dumpAll with the
    // real green query and check the failure path via a bogus sfDir.
    val green = "dedup_exact"
    assert(SparkEntry.queries.contains(green))
    val old = System.err
    System.setErr(new java.io.PrintStream(
      new java.io.ByteArrayOutputStream(), true, "UTF-8"))
    val failed =
      try Verify.dumpAll(spark, "/nonexistent/graft/sfdir", out,
        Some(Set(green)))
      finally System.setErr(old)
    assert(failed == Seq(green),
      "main exits non-zero exactly when this list is non-empty")
    val marker = java.nio.file.Paths.get(s"$out/$green/_ERROR.json")
    assert(java.nio.file.Files.exists(marker), s"missing $marker")
    val body = java.nio.file.Files.readString(marker)
    assert(body.contains("\"query\"") && body.contains("\"err\""), body)
  }

  test("a green query dumps parquet and no error marker") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify2").toString
    val failed = Verify.dumpAll(spark, sfDir, out, Some(Set("dedup_exact")))
    assert(failed.isEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/dedup_exact/_ERROR.json")))
    assert(spark.read.parquet(s"$out/dedup_exact").count() > 0)
  }

  test("a failure after partial output leaves only the error marker") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify3").toString
    // first a green dump, then the same name fails: stale parquet from
    // the earlier run must NOT survive next to _ERROR.json — the driver
    // would read it as a (wrong) green result
    Verify.dumpAll(spark, sfDir, out, Some(Set("dedup_exact")))
    val old = System.err
    System.setErr(new java.io.PrintStream(
      new java.io.ByteArrayOutputStream(), true, "UTF-8"))
    try Verify.dumpAll(spark, "/nonexistent/graft/sfdir", out,
      Some(Set("dedup_exact")))
    finally System.setErr(old)
    val dir = java.nio.file.Paths.get(s"$out/dedup_exact")
    import scala.jdk.CollectionConverters._
    val entries = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(entries == Set("_ERROR.json"), entries.toString)
  }
}
