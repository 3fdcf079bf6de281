package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Sampling: deterministic hash splits and stratified sampling. */
class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("clusterSafeSplit never separates paired docs; singletons self-key") {
    // components: {1,2,3} (chained), {10,11}; 4..9 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = (1L to 12L).toDF("doc_id")
    val labels = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val out = Sampling.clusterSafeSplit(docs, "doc_id", labels,
        Seq("train" -> 0.5, "valid" -> 0.25, "test" -> 0.25))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out.size == 12, "every doc keeps exactly one assignment")
    // every edge's endpoints share BOTH the representative and the split
    for ((a, b) <- Seq((1L, 2L), (2L, 3L), (10L, 11L)))
      assert(out(a) == out(b), s"pair ($a,$b) split apart: ${out(a)} vs ${out(b)}")
    assert(out(1L)._1 == 1L && out(10L)._1 == 10L,
      "cluster representative is the component min")
    for (d <- 4L to 9L)
      assert(out(d)._1 == d, "singletons represent themselves")
    // the split is the plain hashSplit of the representative, so the
    // growth-stability contract carries over unchanged
    val viaRep = Sampling.hashSplit(
        docs.withColumn("component_rep",
          when(col("doc_id").isin(2L, 3L), 1L)
            .when(col("doc_id") === 11L, 10L)
            .otherwise(col("doc_id"))),
        "component_rep", Seq("train" -> 0.5, "valid" -> 0.25, "test" -> 0.25))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.map { case (k, v) => k -> v._2 } == viaRep)
  }

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

  test("packPlan tiles each shard's token stream without gaps or overlap") {
    val docs = (1L to 300L)
      .map(i => (i, (0 until (i % 17).toInt + 1).map(j => s"w$j")
        .mkString(" ")))
      .toDF("doc_id", "text")
    val seqLen = 16
    val plan = Sampling.packPlan(docs, "doc_id", "text", seqLen, 4)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    assert(plan.length == 300)
    // per shard: sorted by start offset, consecutive docs tile the
    // stream exactly (prev start + prev tokens = next start), and the
    // pack arithmetic is consistent with the offsets
    plan.groupBy(_._2).foreach { case (_, rows) =>
      val byStart = rows.sortBy(r => r._4 * seqLen + r._6)
      byStart.zip(byStart.tail).foreach { case (a, b) =>
        val aStart = a._4 * seqLen + a._6
        val bStart = b._4 * seqLen + b._6
        assert(aStart + a._3 == bStart,
          s"gap/overlap between docs ${a._1} and ${b._1}")
      }
      rows.foreach { case (_, _, n, sp, ep, off) =>
        val start = sp * seqLen + off
        assert(ep == math.max(sp, (start + n - 1) / seqLen))
      }
    }
  }

  test("packPlan handles docs longer than seqLen and is order-insensitive") {
    val long = (0 until 100).map(i => s"t$i").mkString(" ") // 100 tokens
    val docs = Seq((1L, long), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val plan = Sampling.packPlan(docs, "doc_id", "text", 8, 1)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val r1 = plan(1L)
    assert(r1._5 - r1._4 >= 11, "100 tokens at seqLen 8 spans >= 12 packs")
    // same plan regardless of input partitioning/order
    val shuffled = Sampling.packPlan(
      docs.orderBy(col("doc_id").desc).repartition(7), "doc_id", "text",
      8, 1).as[(Long, Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(plan == shuffled)
  }

  test("GreedyTokenIds: ids map to vocab indices, -1 UNK, count parity") {
    import graft.functions.{GreedyTokenCount, GreedyTokenIds}
    val vocab = Seq("abc", "ab", "cd", "x")
    val df = Seq("abcd xcdx zq", "", "ab").toDF("t")
    val rows = df.select(
        GreedyTokenIds.tokenIds(col("t"), vocab).as("ids"),
        GreedyTokenCount.tokenCount(col("t"), vocab).as("n"))
      .collect()
    // "abcd" -> abc(0), d UNK; "xcdx" -> x(3), cd(2), x(3); z,q UNK
    assert(rows(0).getSeq[Int](0) == Seq(0, -1, 3, 2, 3, -1, -1))
    assert(rows(1).getSeq[Int](0) == Seq())
    assert(rows(2).getSeq[Int](0) == Seq(1))
    rows.foreach(r => assert(r.getSeq[Int](0).size.toLong == r.getLong(1),
      "size(ids) must equal GreedyTokenCount"))
  }

  test("packSequences materializes the exact seqLen tiling of packPlan") {
    val vocab = Seq("aa", "bb", "cc")
    // 3 docs, all tokens in-vocab, single shard for hand verification
    val docs = Seq(
      (1L, "aa aa bb"),      // ids 0 0 1
      (2L, "cc cc"),         // ids 2 2
      (3L, "bb aa cc aa"))   // ids 1 0 2 0
      .toDF("doc_id", "text")
    val seqLen = 4
    val packs = Sampling.packSequences(docs, "doc_id", "text", vocab,
        seqLen, numShards = 1)
      .orderBy("shard", "pack_no")
      .as[(Int, Long, Long, Seq[Int])].collect()
    // every pack full except the last; total conserved
    assert(packs.map(_._3).sum == 9L)
    packs.init.foreach(p => assert(p._3 == seqLen && p._4.size == seqLen))
    assert(packs.last._3 == 9L % seqLen || packs.last._3 == seqLen)
    // the concatenated packs equal the docs' id streams concatenated in
    // packPlan's deterministic order
    val plan = Sampling.packPlan(docs, "doc_id", "text", seqLen, 1,
        tokensCol = Some(graft.functions.GreedyTokenCount
          .tokenCount(col("text"), vocab)))
      .select("id", "start_pack", "start_offset")
      .as[(Long, Long, Long)].collect()
      .sortBy(r => r._2 * seqLen + r._3).map(_._1)
    val perDoc = Map(1L -> Seq(0, 0, 1), 2L -> Seq(2, 2),
      3L -> Seq(1, 0, 2, 0))
    assert(packs.flatMap(_._4).toSeq == plan.flatMap(perDoc).toSeq,
      "payload placement must follow the plan order exactly")
  }

  test("packSequences invariants hold across shards at 300 docs") {
    val vocab = Seq("w0", "w1", "w2", "w3", "w4")
    // words all in-vocab so the expected token total is the word total
    val docs = (1L to 300L)
      .map(i => (i, (0 until (i % 5).toInt + 1).map(j => s"w$j")
        .mkString(" ")))
      .toDF("doc_id", "text")
    val seqLen = 16
    val packs = Sampling.packSequences(docs, "doc_id", "text", vocab,
        seqLen, numShards = 4)
      .as[(Int, Long, Long, Seq[Int])].collect()
    val totalTokens = (1L to 300L).map(i => (i % 5) + 1).sum
    assert(packs.map(_._3).sum == totalTokens)
    packs.groupBy(_._1).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._2)
      // contiguous pack numbering from 0, all full except the last
      assert(sorted.map(_._2).toSeq == (0L until sorted.size).toSeq,
        s"shard $shard pack numbering")
      sorted.init.foreach(p => assert(p._3 == seqLen))
      assert(sorted.last._3 <= seqLen)
      rows.foreach(p => assert(p._4.forall(t => t >= 0 && t < 5)))
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

  test("capPerGroup keeps top-n by (score desc, id asc) per group") {
    // domain "big" has 5 docs, cap 2 -> the two longest win, tie on
    // score 9.0 broken by the smaller id; "small" is under the cap
    val docs = Seq(
      ("big", 1L, 9.0), ("big", 2L, 9.0), ("big", 3L, 5.0),
      ("big", 4L, 12.0), ("big", 5L, 1.0),
      ("small", 6L, 3.0)).toDF("source", "doc_id", "score")
    val kept = Sampling.capPerGroup(docs, "source", "doc_id",
      col("score"), 2)
      .as[(String, Long)].collect().toSet
    assert(kept == Set(("big", 4L), ("big", 1L), ("small", 6L)))
    intercept[IllegalArgumentException] {
      Sampling.capPerGroup(docs, "source", "doc_id", col("score"), 0)
    }
  }

  test("stress: cap 1M rows to 3 per 1000 groups") {
    val kept = Sampling.capPerGroup(
      spark.range(1000000L).repartition(32)
        .selectExpr("CAST(id % 1000 AS STRING) AS g", "id",
          "CAST(id AS DOUBLE) AS score"),
      "g", "id", col("score"), 3)
    assert(kept.count() == 3000L)
    // spot-check one group: the cap keeps the 3 largest ids (score = id)
    val g7 = kept.filter(col("g") === "7").select("id")
      .as[Long].collect().toSet
    assert(g7 == Set(998007L, 999007L, 997007L), s"got $g7")
  }

  test("capPerGroup shuffles bounded candidates, not whole groups") {
    // the cap must compile to a two-phase (partial) aggregate — a
    // window/row_number formulation would show a Window node and pull
    // every row of the heaviest group into one reducer
    val docs = (1L to 1000L).map(i => (s"d${i % 3}", i, i.toDouble))
      .toDF("source", "doc_id", "score")
    val plan = Sampling.capPerGroup(docs, "source", "doc_id",
      col("score"), 5).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"), plan)
  }

  test("sampleByRate keeps ~rate per row, deterministic, clamped") {
    val df = (1L to 10000L).map(i =>
      (i, if (i % 2 == 0) 0.9 else 0.1)).toDF("id", "r")
    val out = Sampling.sampleByRate(df, "id", col("r"))
    val counts = out.groupBy("r").count()
      .collect().map(x => x.getDouble(0) -> x.getLong(1)).toMap
    assert(math.abs(counts(0.9) - 4500L) < 300, counts.toString)
    assert(math.abs(counts(0.1) - 500L) < 150, counts.toString)
    // deterministic re-run; clamping keeps all at >=1, none at <=0
    assert(out.except(Sampling.sampleByRate(df, "id", col("r")))
      .count() == 0)
    assert(Sampling.sampleByRate(df, "id", lit(5.0)).count() == 10000L)
    assert(Sampling.sampleByRate(df, "id", lit(-1.0)).count() == 0L)
  }

  test("sqrtTemperatureRates flattens toward sqrt, smallest keeps all") {
    // sources with 100 / 400 / 10000 tokens (one doc each)
    val docs = Seq(
      ("s1", (1 to 100).map(_ => "w").mkString(" ")),
      ("s2", (1 to 400).map(_ => "w").mkString(" ")),
      ("s3", (1 to 10000).map(_ => "w").mkString(" ")))
      .toDF("source", "text")
    val r = Sampling.sqrtTemperatureRates(docs, "source", "text")
      .collect().map(x => x.getString(0) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r("s1") == ((100L, 1.0, 100.0)))
    assert(r("s2")._2 == 0.5 && r("s2")._3 == 200.0)
    assert(r("s3")._2 == 0.1 && r("s3")._3 == 1000.0)
    // kept tokens proportional to sqrt(n): 100/200/1000 = 1:2:10
  }
}
