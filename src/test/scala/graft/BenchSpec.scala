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
    val (json, failed) =
      try Bench.run(spark, sfDir, iters = 1, Seq("ok", "broken"), qs)
      finally System.setErr(old)
    assert(failed == Seq("broken"),
      "main exits non-zero exactly when this list is non-empty")
    assert(json.contains("\"failed\":[\"broken\"]"), json)
    assert(json.contains("\"methodology_version\":2"), json)
  }

  test("an all-green run reports no failures") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok" -> ((s, _) => { import s.implicits._; Seq(1).toDF("x") }))
    val (json, failed) = Bench.run(spark, sfDir, iters = 1, Seq("ok"), qs)
    assert(failed.isEmpty)
    assert(json.contains("\"failed\":[]"), json)
  }
}
