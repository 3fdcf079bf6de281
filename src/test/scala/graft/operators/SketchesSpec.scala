package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.functions.{MinKBuffer, StableHash}

/** Sketches: deterministic KMV distinct estimation. */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  test("MinKBuffer keeps the k smallest distinct values, sorted") {
    val b = new MinKBuffer(4)
    Seq(50L, 10L, 30L, 10L, 20L, 40L, 5L, 50L).foreach(b.insert)
    assert(b.size == 4)
    assert(b.vals.take(4).toSeq == Seq(5L, 10L, 20L, 30L))
    // value above the current k-th is a no-op
    b.insert(99L)
    assert(b.vals.take(4).toSeq == Seq(5L, 10L, 20L, 30L))
    // merge folds another buffer's values with dedup
    val c = new MinKBuffer(4)
    Seq(1L, 20L).foreach(c.insert)
    b.mergeFrom(c)
    assert(b.vals.take(4).toSeq == Seq(1L, 5L, 10L, 20L))
  }

  test("kmvDistinct is exact under k, ~1/sqrt(k) accurate above") {
    val rows = (1L to 5000L).map(i => ("big", s"tok$i")) ++
      (1L to 10L).map(i => ("small", s"tok$i"))
    val df = rows.toDF("source", "tok")
      .select(col("source"), StableHash.hash60(col("tok")).as("h"))
    val out = Sketches.kmvDistinct(df, "source", col("h"), 256)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2)))).toMap
    assert(out("small") == ((10, 10.0)), "under k: sketch is exact")
    val (bigSize, bigEst) = out("big")
    assert(bigSize == 256)
    assert(math.abs(bigEst - 5000.0) / 5000.0 < 0.2,
      s"estimate $bigEst for 5000 distinct")
    // determinism: same input, bit-identical estimate
    val again = Sketches.kmvDistinct(df, "source", col("h"), 256)
      .filter(col("source") === "big").head().getDouble(2)
    assert(again == bigEst)
  }

  test("hashSampleQuantiles picks exact ranks on the full sample") {
    // sampleFrac 1.0: the "sample" is the whole set, so quantiles are
    // the true discrete quantiles of 1..100
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val out = Sketches.hashSampleQuantiles(df, "id", col("v"), 1.0,
        Seq(0.01, 0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
    assert(out == Map(0.01 -> 1L, 0.5 -> 50L, 0.9 -> 90L, 1.0 -> 100L))
    intercept[IllegalArgumentException] {
      Sketches.hashSampleQuantiles(df, "id", col("v"), 0.0, Seq(0.5))
    }
  }

  test("stress: 1M values across 100 groups, bounded state, <15% error") {
    // 100 groups x ~10k distinct values each, arriving with duplicates
    // and across many partitions — the sketch must stay k-bounded and
    // land near the true per-group cardinality
    val n = 1000000L
    val df = spark.range(n).repartition(32)
      .selectExpr("id % 100 AS g", "(id % 200000) AS raw")
      .select(col("g"), StableHash.hash60(col("raw").cast("string"))
        .as("h"))
    // per group: distinct raw values = 200000/100 = 2000
    val out = Sketches.kmvDistinct(df, "g", col("h"), 1024).collect()
    assert(out.length == 100)
    out.foreach { r =>
      val est = r.getDouble(2)
      assert(math.abs(est - 2000.0) / 2000.0 < 0.15,
        s"group ${r.get(0)}: est $est for 2000 distinct")
    }
  }

  test("sketch aggregates map-side: no distinct expansion, no window") {
    val df = (1L to 100L).map(i => (s"s${i % 3}", i))
      .toDF("source", "h")
    val plan = Sketches.kmvDistinct(df, "source", col("h"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"), plan)
    assert(!plan.contains("Expand") && !plan.contains("Window"), plan)
  }

  test("quantileBuckets bins by sampled thresholds via broadcast") {
    // values 1..1000, full sample -> quartile thresholds 250/500/750
    val df = (1L to 1000L).map(i => (i, i)).toDF("id", "v")
    val out = Sketches.quantileBuckets(df, "id", col("v"),
      sampleFrac = 1.0, probs = Seq(0.25, 0.5, 0.75))
    val plan = out.queryExecution.executedPlan.toString
    // catalyst constant-folds the join key, leaving a broadcast of the
    // single threshold row — either broadcast form is shuffle-free
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"thresholds must broadcast:\n$plan")
    assert(!plan.contains("ShuffledHashJoin") &&
      !plan.contains("SortMergeJoin"), plan)
    val m = out.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(m(1L) == 0 && m(250L) == 0, "at/below p25 -> bucket 0")
    assert(m(251L) == 1 && m(500L) == 1)
    assert(m(501L) == 2 && m(750L) == 2)
    assert(m(751L) == 3 && m(1000L) == 3)
    // every bucket holds a quarter of the data
    val sizes = m.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map(0 -> 250, 1 -> 250, 2 -> 250, 3 -> 250), sizes)
  }
}
