package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class TextSearchSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b a"),
    (2L, "a c"),
    (3L, "a d"),
    (4L, "   ")) // blank: tokenizes to [""], must vanish entirely
    .toDF("doc_id", "text")

  test("wordTermCounts parity holds on generated whitespace-heavy text") {
    import org.scalacheck.Gen
    val token = Gen.oneOf(Gen.alphaNumStr.map(_.take(5)),
      Gen.oneOf("a", "B", "cc", "", " ", "\t", "\n", "Ab1"))
    val textGen = Gen.listOfN(12, token).map(_.mkString(" "))
    val texts = Gen.listOfN(60, textGen).sample.getOrElse(Nil)
    assert(texts.nonEmpty)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fast = rows.select(col("doc_id"),
        explode(graft.functions.TextShingles.wordTermCounts(col("text")))
          .as("tc"))
      .select(col("doc_id"), col("tc.term"), col("tc.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val slow = rows.select(col("doc_id"),
        explode(graft.functions.TextShingles.wordShingles(col("text"), 1))
          .as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(fast == slow)
  }

  test("wordTermCounts matches the explode+groupBy formulation on edges") {
    val rows = Seq("", "   ", "a b a", "a\nb\ta  b b", " x ", "x x x\n")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fast = rows.select(col("doc_id"),
        explode(graft.functions.TextShingles.wordTermCounts(col("text")))
          .as("tc"))
      .select(col("doc_id"), col("tc.term"), col("tc.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val slow = rows.select(col("doc_id"),
        explode(graft.functions.TextShingles.wordShingles(col("text"), 1))
          .as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(fast == slow)
  }

  test("invertedIndex: exact df, capped ascending postings, no Window") {
    val out = TextSearch.invertedIndex(corpus, "doc_id", "text", 2)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // term a appears in docs 1,2,3 -> df=3 but only 2 postings kept,
    // smallest doc ids first
    assert(rows == Set(
      ("a", 3L, 0L, 1L), ("a", 3L, 1L, 2L),
      ("b", 1L, 0L, 1L),
      ("c", 1L, 0L, 2L),
      ("d", 1L, 0L, 3L)))
    // the posting cap must be the two-phase bounded aggregate, not a
    // per-term window (stopword posting lists would melt one reducer)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "postings cap must not use Window")
    assert(plan.contains("ObjectHashAggregate"),
      "BoundedTopK should run as ObjectHashAggregate partials")
  }

  test("invertedIndexAppend equals a from-scratch rebuild, capped terms included") {
    // 6 docs all sharing term "t" with cap 3 -> base index is already
    // capped (df=4 > 3 postings); the batch adds ids 0 and 7: 0 must
    // displace into the kept set, 7 must not, df must become 6
    val all = Seq(
      (0L, "t new"), (2L, "t x"), (3L, "t"), (4L, "t y"),
      (5L, "t"), (7L, "t z")).toDF("doc_id", "text")
    val base = all.filter(col("doc_id").isin(2L, 3L, 4L, 5L))
    val batch = all.filter(col("doc_id").isin(0L, 7L))
    val incr = TextSearch.invertedIndexAppend(
      TextSearch.invertedIndex(base, "doc_id", "text", 3),
      batch, "doc_id", "text", 3)
    val full = TextSearch.invertedIndex(all, "doc_id", "text", 3)
    val a = incr.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet
    val b = full.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
    assert(a.contains(("t", 6L, 0L, 0L)) && a.contains(("t", 6L, 2L, 3L))
      && !a.exists(r => r._1 == "t" && r._4 > 3L))
  }

  test("tfidfKeywords: exact integer scores, rank order, top-k cut") {
    val docs = Seq(
      (1L, "x x y common"),
      (2L, "common y"),
      (3L, "common z")).toDF("doc_id", "text")
    val out = TextSearch.tfidfKeywords(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // N=3; idfW: df=1 -> 3000000, df=2 -> 1500000, df=3 -> 1000000
    assert(out == Set(
      (1L, 1L, "x", 2L, 1L, 6000000L),
      (1L, 2L, "y", 1L, 2L, 1500000L),
      (2L, 1L, "y", 1L, 2L, 1500000L),
      (2L, 2L, "common", 1L, 3L, 1000000L),
      (3L, 1L, "z", 1L, 1L, 3000000L),
      (3L, 2L, "common", 1L, 3L, 1000000L)))
  }

  test("tfidfKeywords: score ties break term-ascending") {
    val docs = Seq((1L, "beta alpha"), (2L, "other")).toDF("doc_id", "text")
    val out = TextSearch.tfidfKeywords(docs, "doc_id", "text", 2)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .select("term").as[String].collect().toSeq
    // both terms df=1, tf=1 -> equal scores; alpha must outrank beta
    assert(out == Seq("alpha", "beta"))
  }

  test("phraseSearch: consecutive-sequence semantics, counts, zero exchange") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick brown quick brown fox"),
      (3L, "brown quick"), // words present, order wrong
      (4L, "Quick  BROWN stuff")) // case/whitespace-normalized match
      .toDF("doc_id", "text")
    val out = TextSearch.phraseSearch(docs, "doc_id", "text",
      "Quick Brown")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 1L), (2L, 2L), (4L, 1L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "phrase search must be a pure scan filter")
  }

  test("searchTopK: conjunctive AND, exact summed score, bounded top-k") {
    // only doc 2 contains BOTH a and c
    val out = TextSearch.searchTopK(corpus, "doc_id", "text",
      Seq("a", "c"), 10)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    // N=4 docs (blank counts); df(a)=3 -> idfW 1333333, df(c)=1 ->
    // 4000000; doc2 score = 1*1333333 + 1*4000000
    assert(rows.toSeq == Seq((2L, 5333333L)))
    // plan shape asserts on the LAZY spelling: the eager one now
    // release-checkpoints its sliver (r17, the bm25Impl discipline),
    // which cuts the lineage the assertion needs to see
    val plan = TextSearch.searchTopKLazy(corpus, "doc_id", "text",
      Seq("a", "c"), 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "global top-k must compile to TakeOrderedAndProject")
  }

  test("searchTopKBm25: tf saturation, length normalization, OR") {
    val docs = Seq(
      (1L, "hit pad pad pad pad pad pad pad"),                  // tf=1, dl=8
      (2L, "hit hit hit hit hit hit hit hit"),                  // tf=8, dl=8
      (3L, "hit pad"),                                          // tf=1, dl=2
      (4L, "pad pad"))                                          // no hit
      .toDF("doc_id", "text")
    val out = TextSearch.searchTopKBm25(docs, "doc_id", "text",
        Seq("hit"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val byId = out.toMap
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L), s"OR + no-hit drop: $out")
    // saturation: 8x the tf must score FAR less than 8x
    assert(byId(2L) < 4 * byId(1L),
      s"tf saturation violated: ${byId(2L)} vs ${byId(1L)}")
    assert(byId(2L) > byId(1L), "more tf still scores higher")
    // length normalization: same tf, shorter doc scores higher
    assert(byId(3L) > byId(1L),
      s"length normalization violated: ${byId(3L)} vs ${byId(1L)}")
  }

  test("searchTopKBatchBm25: panel isolation, single-query parity " +
      "with searchTopKBm25's ranking (r16)") {
    val docs = Seq(
      (1L, "hit pad pad pad pad pad pad pad"),
      (2L, "hit hit hit hit hit hit hit hit"),
      (3L, "hit pad"),
      (4L, "pad pad other"),
      (5L, "other other"))
      .toDF("doc_id", "text")
    // a single-query panel must rank exactly like the single-query
    // operator (identical chain + fold => identical doubles)
    val qt1 = Seq((7L, "hit")).toDF("query_id", "term")
    val batch1 = TextSearch.searchTopKBatchBm25(docs, "doc_id",
        "text", qt1, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._2)
    val single = TextSearch.searchTopKBm25(docs, "doc_id", "text",
        Seq("hit"), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(batch1.map(_._3) == single,
      s"single-query panel must equal the single-query ranking: " +
        s"${batch1.map(_._3)} vs $single")
    assert(batch1.forall(_._1 == 7L))
    // panel isolation: each query ranks over its own terms only
    val qt2 = Seq((1L, "hit"), (2L, "other")).toDF("query_id", "term")
    val panel = TextSearch.searchTopKBatchBm25(docs, "doc_id", "text",
        qt2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(panel.filter(_._1 == 1L).map(_._2) == Set(1L, 2L, 3L))
    assert(panel.filter(_._1 == 2L).map(_._2) == Set(4L, 5L))
  }

  test("searchSnippets: first-hit window, clamped edges, zero exchange") {
    val docs = Seq(
      (1L, "w1 w2 w3 hit w5 w6 w7 w8"),   // interior hit, full window
      (2L, "hit w2 w3"),                   // hit at position 1: clamp left
      (3L, "w1 w2 other w4"),              // no hit: no row
      (4L, "w1 miss hit miss hit"))        // FIRST hit wins (pos 3)
      .toDF("doc_id", "text")
    val out = TextSearch.searchSnippets(docs, "doc_id", "text",
        Seq("hit", "MISS"), window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, 4L, "w2 w3 hit w5 w6"),
      (2L, 1L, "hit w2 w3"),
      (4L, 2L, "w1 miss hit miss")), s"got $out")
    // scan-only: no exchange anywhere in the plan
    val plan = TextSearch.searchSnippets(docs, "doc_id", "text",
      Seq("hit"), 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"snippets must not shuffle:\n$plan")
  }

  test("searchTopKBatch: disjunctive OR, panel isolation, rank order") {
    // query 100 asks {a, c}: unlike searchTopK's AND, docs with only
    // ONE of the terms still rank. N=4 docs; df(a)=3 -> idfW 1333333,
    // df(c)=1 -> 4000000. doc1 = 2*1333333 (tf(a)=2), doc2 =
    // 1333333+4000000, doc3 = 1333333. query 200 asks {d}: doc3 only
    // (df(d)=1 -> 4000000) — panels must not leak into each other.
    val qt = Seq((100L, "a"), (100L, "c"), (200L, "d"))
      .toDF("query_id", "term")
    val out = TextSearch.searchTopKBatch(corpus, "doc_id", "text", qt, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(out == Seq(
      (100L, 1L, 2L), // 5333333
      (100L, 2L, 1L), // 2666666
      (100L, 3L, 3L), // 1333333
      (200L, 1L, 3L)), s"got $out")
    // k cuts per query, not globally
    val top1 = TextSearch.searchTopKBatch(corpus, "doc_id", "text", qt, 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
    assert(top1 == Seq((100L, 2L), (200L, 3L)), s"got $top1")
  }

  test("searchTopKFromIndex: exact when df <= cap, bounded-recall beyond") {
    val docs = Seq(
      (1L, "q q q w"),
      (2L, "q w"),
      (3L, "q w w"),
      (4L, "q only")).toDF("doc_id", "text")
    // cap 10 >= every df: serving MUST equal the scan path exactly
    val wide = TextSearch.invertedIndex(docs, "doc_id", "text", 10)
    val served = TextSearch.searchTopKFromIndex(wide, docs,
      "doc_id", "text", Seq("q", "w"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val scanned = TextSearch.searchTopK(docs, "doc_id", "text",
      Seq("q", "w"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == scanned && served.map(_._1) == Seq(1L, 3L))
    val plan = TextSearch.searchTopKFromIndex(wide, docs,
      "doc_id", "text", Seq("q", "w"), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "candidates must broadcast into the corpus join")

    // cap 2: both posting lists truncate to [1,2], so doc 3 is outside
    // the candidate set (bounded recall, deterministically); the docs
    // that DO survive score with the exact index df and rank exactly
    // as the scan path ranks them
    val narrow = TextSearch.invertedIndex(docs, "doc_id", "text", 2)
    val servedNarrow = TextSearch.searchTopKFromIndex(narrow, docs,
      "doc_id", "text", Seq("q", "w"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(servedNarrow == scannedAll(docs).filter(r =>
      Set(1L, 2L).contains(r._1)))
  }

  private def scannedAll(docs: org.apache.spark.sql.DataFrame) =
    TextSearch.searchTopK(docs, "doc_id", "text", Seq("q", "w"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("searchTopK: ranking order and limit on a multi-match query") {
    val docs = Seq(
      (1L, "q q q w"),
      (2L, "q w"),
      (3L, "q w w"),
      (4L, "q only")).toDF("doc_id", "text")
    val out = TextSearch.searchTopK(docs, "doc_id", "text",
      Seq("q", "w"), 2).collect().map(_.getLong(0)).toSeq
    // N=4, df(q)=4 -> idfW 1000000; df(w)=3 -> 1333333
    // doc1: 3*1e6 + 1333333 = 4333333; doc2: 2333333; doc3: 3666666
    // top-2 by score desc: doc1, doc3; doc4 fails the AND
    assert(out == Seq(1L, 3L))
  }
}
