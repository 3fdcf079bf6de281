package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Sampling: deterministic hash splits and stratified sampling. */
class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("hashSplit is deterministic, exhaustive, and ~proportional") {
    val df = (1L to 10000L).toDF("id")
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(df, "id", splits)
    val b = Sampling.hashSplit(df, "id", splits)
    // deterministic: identical assignment on re-run
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    val counts = a.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)
    assert(counts.keySet == Set("train", "valid", "test"))
    // ~proportional (hash uniformity; generous tolerance)
    assert(math.abs(counts("train") - 8000L) < 400,
      s"train=${counts("train")}")
    assert(math.abs(counts("valid") - 1000L) < 200)
  }

  test("membership is stable under corpus growth") {
    val splits = Seq("train" -> 0.9, "test" -> 0.1)
    val small = Sampling.hashSplit((1L to 100L).toDF("id"), "id", splits)
    val large = Sampling.hashSplit((1L to 200L).toDF("id"), "id", splits)
    val smallMap = small.as[(Long, String)].collect().toMap
    val largeMap = large.as[(Long, String)].collect().toMap
    assert(smallMap.forall { case (k, v) => largeMap(k) == v },
      "existing rows must keep their split when new rows arrive")
  }

  test("stratified sampling keeps per-stratum fractions") {
    val df = (1L to 8000L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("id", "stratum")
    val out = Sampling.stratifiedSampleByHash(df, "id", "stratum",
      Map("a" -> 0.5, "b" -> 0.1))
    val counts = out.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("a") - 2000L) < 200, s"a=${counts("a")}")
    assert(math.abs(counts("b") - 400L) < 120, s"b=${counts("b")}")
    // default fraction 0 drops unlisted strata
    val none = Sampling.stratifiedSampleByHash(df, "id", "stratum",
      Map("a" -> 0.5))
    assert(none.filter(col("stratum") === "b").count() == 0)
  }

  test("invalid fractions are rejected") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("mixturePlan caps the binding source at rate 1.0, scales the rest") {
    // sA: 8 tokens, weight 1 -> tokens/weight = 8
    // sB: 4 tokens, weight 2 -> tokens/weight = 2  (binding: budget = 2)
    // sC: not in the weights map -> excluded from the plan
    val docs = Seq(
      ("sA", "one two three four"), ("sA", "five six seven eight"),
      ("sB", "alpha beta gamma delta"), ("sC", "ignored rows entirely x"))
      .toDF("source", "text")
    val plan = Sampling.mixturePlan(docs, "source", "text",
      Map("sA" -> 1.0, "sB" -> 2.0))
    val rows = plan.select("source", "n_docs", "n_tokens", "sample_rate")
      .as[(String, Long, Long, Double)].collect()
      .map { case (s, d, t, r) => s -> ((d, t, r)) }.toMap
    assert(rows.keySet == Set("sA", "sB"))
    assert(rows("sA") == ((2L, 8L, 0.25)))
    assert(rows("sB") == ((1L, 4L, 1.0)))
    intercept[IllegalArgumentException] {
      Sampling.mixturePlan(docs, "source", "text", Map("sA" -> -1.0))
    }
  }
}
