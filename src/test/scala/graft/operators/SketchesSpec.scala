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

  test("count-min: exact without collisions, upper bound always") {
    import graft.functions.{CountMin, StableHash}
    // 3 distinct keys, counts 100/10/1, w=64 >> 3 -> near-zero collision
    // chance for this fixed hash family; estimates must be exact
    val rows = (Seq.fill(100)("alpha") ++ Seq.fill(10)("beta") ++
      Seq("gamma")).toDF("k")
    val inst = rows.select(StableHash.hash60(col("k")).as("h"), col("k"))
    val sk = inst.agg(CountMin.sketch(col("h"), 4, 64).as("sk"))
      .withColumn("__j", lit(1))
    val est = inst.distinct().withColumn("__j", lit(1))
      .join(broadcast(sk), Seq("__j"))
      .select(col("k"),
        Sketches.cmsEstimate(col("sk"), col("h"), 4, 64).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("alpha" -> 100L, "beta" -> 10L, "gamma" -> 1L), est)
  }

  test("count-min: merge across partitions, bounded aggregate plan") {
    import graft.functions.{CountMin, StableHash}
    // heavy skew: key 0 appears 5000x among 50k rows over 8 partitions
    val df = (1L to 50000L).map(i => if (i % 10 == 0) 0L else i)
      .toDF("v").repartition(8)
    val q = df.select(StableHash.hash60(col("v").cast("string")).as("h"))
      .agg(CountMin.sketch(col("h"), 4, 4096).as("sk"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"), plan)
    val sk = q.collect().head.getAs[scala.collection.Seq[Long]](0)
    assert(sk.length == 4 * 4096)
    // every row of the sketch sums to the total instance count
    (0 until 4).foreach { i =>
      assert(sk.slice(i * 4096, (i + 1) * 4096).sum == 50000L)
    }
    // the heavy key's estimate is >= its true count and close to it
    // (45k light keys spread over 4096 buckets add ~11 each)
    val est = df.sparkSession.range(1)
      .select(Sketches.cmsEstimate(
        typedLit(sk.toSeq), StableHash.hash60(lit("0")), 4, 4096)
        .as("est")).collect().head.getLong(0)
    assert(est >= 5000L && est < 5200L, s"heavy-key estimate $est")
  }

  test("count-min accepts negative hashes (SQL surface inputs)") {
    import graft.functions.CountMin
    // raw xxhash64-style negative longs: update must not throw, and the
    // estimate must look up the SAME bucket the update incremented
    val df = Seq(-1L, -1L, -1L, Long.MinValue, -42L).toDF("h")
    val sk = df.agg(CountMin.sketch(col("h"), 4, 64).as("sk"))
      .withColumn("__j", lit(1))
    val est = df.distinct().withColumn("__j", lit(1))
      .join(broadcast(sk), Seq("__j"))
      .select(col("h"),
        Sketches.cmsEstimate(col("sk"), col("h"), 4, 64).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(-1L) == 3L, est.toString)
    assert(est(Long.MinValue) >= 1L && est(-42L) >= 1L, est.toString)
  }

  test("quantileBuckets fails loudly on an undersized hash sample") {
    val df = (1L to 500L).map(i => (i, i)).toDF("id", "v")
    val e = intercept[Exception] {
      Sketches.quantileBuckets(df, "id", col("v"),
        sampleFrac = 0.0001, probs = Seq(0.5)).collect()
    }
    assert(e.getMessage.contains("raise sampleFrac") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("raise sampleFrac"),
      e.getMessage)
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

  test("BloomBits: no false negatives, deterministic, merges partitions") {
    import graft.functions.BloomBits
    val k = 4
    val m = 512
    // member hashes spread over many partitions so map-side partials
    // must merge; probe set = members ++ certain non-members
    val members = (1L to 300L).map(_ * 7919L)
    val sk = members.toDF("h").repartition(8)
      .agg(BloomBits.sketch(col("h"), k, m).as("sk"))
    val skRow = sk.head().getSeq[Long](0)
    assert(skRow.size == m && skRow.forall(b => b == 0L || b == 1L))
    // determinism: same input, different partitioning -> same bits
    val skRow2 = members.reverse.toDF("h").repartition(3)
      .agg(BloomBits.sketch(col("h"), k, m).as("sk"))
      .head().getSeq[Long](0)
    assert(skRow == skRow2)

    val probes = (members ++ (1L to 300L).map(_ * 104729L + 13L))
      .toDF("h").crossJoin(broadcast(sk))
    val checked = probes.select(col("h"),
        Sketches.bloomMightContain(col("sk"), col("h"), k, m).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every member hits (the Bloom guarantee)
    members.foreach(h => assert(checked(h), s"false negative for $h"))
    // the geometry is sized to produce SOME false positives (fill
    // ratio ~90%), proving the probe exercises both outcomes — but not
    // all non-members may hit
    val nonMembers = (1L to 300L).map(_ * 104729L + 13L)
      .filterNot(members.toSet)
    val fp = nonMembers.count(checked)
    assert(fp > 0 && fp < nonMembers.size,
      s"expected a mixed false-positive outcome, got $fp/${nonMembers.size}")
  }
}
