package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Per-column profiling: exact counts/min/max, sketch parity, plan
  * shapes (exact pays the Expand; the sketch path must not).
  */
class ProfilingSpec extends SparkSpecBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(10)),
    (2L, Some("b"), None),
    (3L, None, Some(10)),
    (4L, Some("a"), Some(30))).toDF("id", "s", "v")

  test("columnProfile: exact counts, nulls excluded from distinct") {
    val p = Profiling.columnProfile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 4L, 4L, "1", "4")))
    assert(p("s") == ((4L, 3L, 2L, "a", "b")))
    assert(p("v") == ((4L, 3L, 2L, "10", "30")))
  }

  test("columnProfileSketch: exact under k, single pass without Expand") {
    val out = Profiling.columnProfileSketch(df, Seq("id", "s", "v"), k = 16)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"sketch profile must not multiply the scan by |cols|:\n$plan")
    val p = out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(p("id") == ((4L, 4L, 4.0)))
    assert(p("s") == ((4L, 3L, 2.0)))
    assert(p("v") == ((4L, 3L, 2.0)))
  }

  test("columnProfileSketch estimate tracks exact at scale") {
    val big = (1L to 50000L).map(i => i % 9973L).toDF("x")
    val est = Profiling.columnProfileSketch(big, Seq("x"), k = 256)
      .collect().head.getDouble(3)
    assert(math.abs(est - 9973.0) / 9973.0 < 0.15,
      s"KMV estimate $est vs exact 9973")
  }

  test("correlationMatrix: exact +1/-1 on linear columns, one scan") {
    // values chosen so every n*Σx²−(Σx)² is a perfect square: the sqrt
    // terms are exact integers and ±1.0 comes out bit-exact
    val t = Seq((0.0, 0.0, 0.0), (3.0, 6.0, -3.0)).toDF("x", "y2x", "neg")
    val out = Profiling.correlationMatrix(t, Seq("x", "y2x", "neg"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand") && !plan.contains("Join"),
      s"one aggregate pass, no Expand/Join:\n$plan")
    val r = out.collect().map(x =>
      (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    // decimal-exact sums make perfectly linear relations EXACTLY +-1
    assert(r(("x", "y2x")) == 1.0, r.toString)
    assert(r(("x", "neg")) == -1.0, r.toString)
    assert(r(("y2x", "neg")) == -1.0, r.toString)
  }
}
