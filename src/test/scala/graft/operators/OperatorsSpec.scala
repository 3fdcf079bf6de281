package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.functions.{StableHash, VectorOps}

class OperatorsSpec extends SparkSpecBase {
  import spark.implicits._

  test("stable hash60 matches the known md5-derived value") {
    // md5('abc') = 900150983cd24fb0d6963f7d28e17f72;
    // first 15 hex chars as int = 648541476951500027 (oracle-verified)
    val h = Seq("abc").toDF("s")
      .select(StableHash.hash60(col("s"))).as[Long].head()
    assert(h == 648541476951500027L)
  }

  test("shingles produce k-grams; short docs produce none") {
    val out = Seq("a b c d").toDF("t")
      .select(Dedup.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(out == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Dedup.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("wordShingles matches split(trim(lower())) on whitespace edges") {
    // the oracle tokenizes with SQL trim (spaces only) + a split that
    // keeps trailing empty tokens; the one-pass expression must agree
    // on tab/newline-wrapped text, not just spaces
    val rows = Seq("", "   ", "one two three", "foo bar\n", "\tfoo bar",
      "foo bar\t\n", "a b c ", " a\nb c")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    for (k <- Seq(1, 2, 3)) {
      val ws = split(trim(lower(col("t"))), "\\s+")
      val composed = when(size(ws) < k, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(ws) - (k - 1)),
          i => array_join(slice(ws, i, lit(k)), " ")))
      val bad = rows.select(
          graft.functions.TextShingles.wordShingles(col("t"), k)
            .as("fast"), composed.as("slow"))
        .filter(not(col("fast") === col("slow"))).count()
      assert(bad == 0, s"k=$k: fast shingles diverge from composed")
    }
  }

  test("incremental minhash dedup finds batch-vs-corpus collisions only") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val nearDup = base.replace("word30", "changed")
    // 10 and 20 are "new batch" (id % 10 == 0); 1, 2, 3 are corpus
    val docs = Seq(
      (1L, base), (2L, "totally other stuff a b c"),
      (3L, "yet more unrelated text x y z"),
      (10L, nearDup), (20L, "nothing like anything here q r s"))
      .toDF("doc_id", "text")
    val corpusSigs = Dedup.minhashSignatures(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
    val out = Dedup.minhashNearDupsAgainst(
      docs.filter(col("doc_id") % 10 === 0), corpusSigs, "doc_id", "text")
    val rows = out.select("new_id", "corpus_id")
      .as[(Long, Long)].collect().toSet
    assert(rows.contains((10L, 1L)), s"planted pair missing: $rows")
    assert(rows.forall { case (n, c) => n % 10 == 0 && c % 10 != 0 },
      "only batch-vs-corpus pairs allowed")
    // the corpus index side must be probed by a broadcast of the batch —
    // no shuffle of the (large) index
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "batch side must broadcast")
  }

  test("normalizeForHash canonicalizes case, punctuation, and spacing") {
    val out = Seq("  Hello,   World!! 42 ", "hello world 42", "a\tb\nc")
      .toDF("t").select(TextAnalysis.normalizeForHash(col("t")))
      .as[String].collect().toSeq
    assert(out(0) == "hello world 42")
    assert(out(0) == out(1), "near-identical docs must normalize equal")
    assert(out(2) == "a b c")
  }

  test("topNgrams counts instances with a deterministic total order") {
    val docs = Seq(
      (1L, "a b c a b c"),   // "a b c" x2, "b c a" x1, "c a b" x1
      (2L, "a b c z z z"))   // "a b c" x1, "b c z", "c z z", "z z z"
      .toDF("doc_id", "text")
    val out = TextAnalysis.topNgrams(docs, "text", k = 3, topN = 3)
      .as[(String, Long)].collect().toSeq
    assert(out.head == (("a b c", 3L)), s"got $out")
    // ties broken by gram ascending
    assert(out.tail == out.tail.sortBy(r => (-r._2, r._1)))
  }

  test("bigramRarity counts hapax and mean document frequency exactly") {
    val docs = Seq(
      (1L, "the cat sat"),   // bigrams: "the cat", "cat sat"
      (2L, "the cat ran"),   // bigrams: "the cat", "cat ran"
      (3L, "x"))             // no bigrams -> absent from output
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramRarity(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    // each doc: 2 bigrams, one shared (df=2), one unique (df=1)
    assert(out(1L) == ((1L, 2L, 1L, 1.5)))
    assert(out(2L) == ((2L, 2L, 1L, 1.5)))
  }

  test("exact dedup groups identical texts") {
    val docs = Seq((1L, "same text here"), (2L, "same text here"),
      (3L, "different")).toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).select("keep_id", "n_copies")
      .as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("minhash near-dups finds the planted near-duplicate pair") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val nearDup = base.replace("word30", "changed")
    val docs = Seq((1L, base), (2L, nearDup), (3L, "totally other stuff x y"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        k = 3, numHashes = 12, rowsPerBand = 3, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.toSeq.contains((1L, 2L)))
  }

  test("minhash maxBucket: viral bucket emits a linear star, CC-equivalent") {
    // 40 identical docs (one viral boilerplate cluster: every band
    // bucket holds all 40) + a distinct near-dup pair + unrelated noise
    val viral = (1 to 60).map(i => s"tok$i").mkString(" ")
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val docs = ((1L to 40L).map(i => (i, viral)) ++ Seq(
      (50L, other), (51L, other.replace("w130", "x")),
      (60L, "totally unrelated z q m")))
      .toDF("doc_id", "text")
    val exact = Dedup.minhashNearDups(docs, "doc_id", "text",
      k = 3, numHashes = 12, rowsPerBand = 3, threshold = 0.3)
    val capped = Dedup.minhashNearDups(docs, "doc_id", "text",
      k = 3, numHashes = 12, rowsPerBand = 3, threshold = 0.3,
      maxBucket = 10)
    // exact: full clique = 40*39/2 pairs; capped: the star = 39
    val cliquePairs = exact.filter(col("id_b") <= 40L).count()
    val starPairs = capped.filter(col("id_b") <= 40L).collect()
    assert(cliquePairs == 780L, s"expected full clique, got $cliquePairs")
    assert(starPairs.length == 39 &&
      starPairs.forall(_.getLong(0) == 1L),
      "capped bucket must emit exactly the hub star")
    // the under-cap pair is untouched by the cap
    assert(capped.filter(col("id_a") === 50L && col("id_b") === 51L)
      .count() == 1L)
    // downstream equivalence: CC gives the same components either way
    def labels(p: org.apache.spark.sql.DataFrame) =
      Dedup.connectedComponents(p, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
    assert(labels(exact) == labels(capped))
  }

  test("hamming and embedding LSH share the viral-bucket star guard") {
    // identical texts -> identical simhash -> every byte-band collides,
    // so an uncapped mega-cluster squares in all bands at once
    val docs = ((1L to 30L).map(i => (i, "same words every time here")) :+
      ((40L, "other thing entirely"))).toDF("doc_id", "text")
    val exact = Dedup.simhashNearDups(docs, "doc_id", "text")
    val capped = Dedup.simhashNearDups(docs, "doc_id", "text",
      maxBucket = 5)
    assert(exact.filter(col("id_b") <= 30L).count() == 435L) // 30*29/2
    val star = capped.filter(col("id_b") <= 30L).collect()
    assert(star.length == 29 && star.forall(_.getLong(0) == 1L),
      "capped hamming bucket must emit exactly the hub star")
    // embedding twin: one repeated vector forms the viral bucket; the
    // outlier may band-collide into it but fails cosine verification
    val vecs = ((1L to 30L).map(i => (i, Seq(1.0f, 0.5f, 0.25f))) :+
      ((40L, Seq(-1.0f, 0.2f, 0.9f)))).toDF("vec_id", "embedding")
    val starE = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      numPlanes = 8, bandBits = 4, threshold = 0.99, maxBucket = 5)
      .collect()
    assert(starE.length == 29 && starE.forall(_.getLong(0) == 1L),
      s"expected the 29-pair hub star, got ${starE.length}")
  }

  test("simhash of identical docs is identical; hamming pairs found") {
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), (3L, "unrelated content entirely z"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq.contains((1L, 2L, 0)))
  }

  test("chunk dedup: cross-doc and in-doc repeated chunks are counted") {
    val docs = Seq(
      (1L, "a b c d e f g h"),          // chunks: [a b c d], [e f g h]
      (2L, "a b c d x y z w"),          // shares chunk [a b c d] with 1
      (3L, "p q r s p q r s"))          // same chunk twice within one doc
      .toDF("doc_id", "text")
    val out = Dedup.chunkDupStats(docs, "doc_id", "text", w = 4)
      .select("id", "total_chunks", "dup_chunks", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 2L, 1.0)))
  }

  test("ngram jaccard = 1.0 for identical docs") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("editVerifiedPairs finds small-edit pairs, rejects distant ones") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val oneEdit = base.replace("quick", "quickk")      // ed 1
    val fourEdit = base.replace("jumps over", "leaps over") // small edit
    val far = "completely different content with no shared phrasing at all"
    val docs = Seq((1L, base), (2L, oneEdit), (3L, fourEdit), (4L, far))
      .toDF("doc_id", "text")
    val out = Dedup.editVerifiedPairs(docs, "doc_id", "text",
      q = 5, maxEdit = 12)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"gram-bucket join must not degenerate to all-pairs:\n$plan")
    val got = out.as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 1, s"one-edit pair: $got")
    assert(got.contains((1L, 3L)) && got((1L, 3L)) <= 5, s"small edit: $got")
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L),
      s"distant doc must not pair: $got")
    // edit distance exceeding maxEdit is cut even when grams are shared
    val tight = Dedup.editVerifiedPairs(docs, "doc_id", "text",
      q = 5, maxEdit = 2).as[(Long, Long, Int)].collect()
    assert(tight.toSeq == Seq((1L, 2L, 1)), s"maxEdit=2: ${tight.toSeq}")
  }

  test("vector dot expression matches manual computation (and codegen)") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val d = df.select(VectorOps.dotF(col("a"), col("b"))).as[Double].head()
    assert(d == 32.0)
    val c = df.select(VectorOps.cosineF(col("a"), col("a")))
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("brute-force topk ranks the nearest vector first") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(corpus,
        corpus.filter(col("vec_id") === 1L), "vec_id", "embedding", 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(out.toSeq == Seq(2L, 3L))
  }

  test("hardNegatives drops positives, re-ranks, keeps panels apart") {
    val ranked = Seq((7L, 1L, 10L), (7L, 2L, 20L), (7L, 3L, 30L),
      (7L, 4L, 40L), (8L, 1L, 10L))
      .toDF("query_id", "rank", "neighbor_id")
    val positives = Seq((7L, 10L), (7L, 30L))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.hardNegatives(ranked, positives, 2)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // query 7: 10/30 are positives -> 20 re-ranks 2->1, 40 re-ranks
    // 4->2; query 8: query 7's positives must not leak -> 10 stays
    assert(out == Seq((7L, 1L, 20L), (7L, 2L, 40L), (8L, 1L, 10L)),
      s"got $out")
  }

  test("rrfFuse ranks multi-list agreement above single-list rank") {
    // query 7: doc 30 is rank-2 lexically and rank-3 by vector —
    // 1/62 + 1/63 beats doc 10's lone 1/61 and doc 40's lone 1/61, so
    // agreement wins even against a better single-list rank (the RRF
    // property the operator exists for). Ties break neighbor-id asc.
    val lex = Seq((7L, 1L, 10L), (7L, 2L, 30L), (7L, 3L, 50L))
      .toDF("query_id", "rank", "neighbor_id")
    val vec = Seq((7L, 1L, 40L), (7L, 2L, 50L), (7L, 3L, 30L))
      .toDF("query_id", "rank", "neighbor_id")
    val fused = Similarity.rrfFuse(Seq(lex, vec), 3, rrfK = 60)
      .orderBy("rank")
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSeq
    // rrf: 30 -> 1/62+1/63 ≈ .03200; 50 -> 1/63+1/62 (same!) tie with
    // 30 broken by neighbor_id; 10/40 -> 1/61 ≈ .01639
    assert(fused == Seq((1L, 30L), (2L, 50L), (3L, 10L)),
      s"got $fused")
    // rankTopK lifts a scored list into the ranked shape
    val scored = Seq((7L, 10L, 5.0), (7L, 20L, 9.0), (7L, 30L, 9.0))
      .toDF("query_id", "neighbor_id", "sim")
    val ranked = Similarity.rankTopK(scored, 2)
      .orderBy("rank").select("rank", "neighbor_id")
      .as[(Long, Long)].collect().toSeq
    assert(ranked == Seq((1L, 20L), (2L, 30L)), s"got $ranked")
  }

  test("IVF topk approximates brute force on clustered data") {
    val emb = graft.queries.Q.table(spark, sfDir, "embeddings")
    val centroids = Similarity.seedCentroids(emb, "vec_id", "embedding", 50)
    val assigned = Similarity.ivfAssign(emb, centroids, "vec_id", "embedding")
    // every corpus vector lands in exactly one cluster
    assert(assigned.count() == emb.count())
    val topk = Similarity.ivfTopK(assigned, centroids,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", 5, 2)
    assert(topk.groupBy("query_id").count().as[(Long, Long)].collect()
      .forall(_._2 == 5))
  }

  test("seedCentroidsK holds nlist exactly k as the corpus grows (r16/r17)") {
    def emb(n: Int) = (0 until n).map(i =>
      (i.toLong, Seq(i.toFloat, 1f))).toDF("vec_id", "embedding")
    val k = 10
    val small = Similarity.seedCentroidsK(emb(200), "vec_id",
      "embedding", k).count()
    val big = Similarity.seedCentroidsK(emb(2000), "vec_id",
      "embedding", k).count()
    // hash-rank selection: EXACTLY k seeds at both sizes (the corpus-
    // proportional `every` knob would give 10x at the bigger corpus)
    assert(small == k, s"small=$small")
    assert(big == k, s"big=$big")
    val ids = Similarity.seedCentroidsK(emb(2000), "vec_id",
      "embedding", k).select("centroid_id").as[Long].collect()
    assert(ids.distinct.length == ids.length)
    // deterministic: same input, same seeds in the same order
    val ids2 = Similarity.seedCentroidsK(emb(2000), "vec_id",
      "embedding", k).select("centroid_id").as[Long].collect()
    assert(ids.sameElements(ids2))
  }

  test("seedCentroidsK is id-distribution-free: sparse 63-bit id space " +
      "still yields exactly k centroids (r17)") {
    // snowflake-style sparse ids — the r16 max-id/k modulo stride
    // yields ~0 seeds here (no id is divisible by ~maxId/k); the
    // hash-rank selection is immune to id sparsity
    def sparse(n: Int) = (0 until n).map { i =>
      val id = 1234567891011L + i.toLong * 1000003L
      (id, Seq(i.toFloat, 1f))
    }.toDF("vec_id", "embedding")
    val k = 10
    val seeds = Similarity.seedCentroidsK(sparse(500), "vec_id",
      "embedding", k)
    assert(seeds.count() == k)
    val ids = seeds.select("centroid_id").as[Long].collect()
    assert(ids.distinct.length == k)
    // a corpus smaller than k seeds every row
    assert(Similarity.seedCentroidsK(sparse(4), "vec_id",
      "embedding", k).count() == 4)
  }

  test("k-means training recovers planted clusters; deterministic") {
    // three well-separated clusters in 4-d
    val pts = Seq.tabulate(60) { i =>
      val c = i % 3
      val base = Array.fill(4)(0.05f * ((i * 7 + c) % 5))
      base(c) = 10f + 0.1f * (i % 4)
      (i.toLong, base.toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    val c1 = Similarity.trainCentroids(df, "vec_id", "embedding",
      k = 3, iterations = 4)
    assert(c1.count() == 3)
    // every trained centroid points at one planted axis, all 3 covered
    val axes = c1.select("embedding").as[Seq[Float]].collect()
      .map(v => v.indexOf(v.max)).toSet
    assert(axes == Set(0, 1, 2))
    // determinism: identical run, identical centroids
    val c2 = Similarity.trainCentroids(df, "vec_id", "embedding",
      k = 3, iterations = 4)
    assert(c1.orderBy("centroid_id").collect().toSeq ==
      c2.orderBy("centroid_id").collect().toSeq)
    // trained centroids slot into the IVF pipeline
    val assigned = Similarity.ivfAssign(df, c1, "vec_id", "embedding")
    val sizes = assigned.groupBy("cluster").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.values.sum == 60L && sizes.size == 3)
    assert(sizes.values.forall(n => n == 20L))
  }

  test("langId flags CJK and stopword-heavy text") {
    val out = Seq((1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "中文文本"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "en"), (2L, "de"), (3L, "zh")))
  }

  test("htmlToText: scripts/styles/comments drop, blocks split, entities decode") {
    val html = "<html><head><style>p{x:1}</style><title>T</title></head>" +
      "<body><!-- menu --><h1>Head</h1><p>one two</p><p>three</p>" +
      "<script>if (1 < 2) { alert('x </b>'); }</script>" +
      "<div>a&amp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;z" +
      "&amp;amp;</div></body></html>"
    val out = Seq((1L, html)).toDF("id", "h")
      .select(TextAnalysis.htmlToText(col("h"))).as[String].head()
    // title survives (head text is text), script payload including its
    // stray '<' is gone, block closes keep words separated, &amp; is
    // decoded LAST so &amp;amp; yields the literal five-char entity
    assert(out ==
      "T Head one two three a&b <tag> \"q\" 's' z&amp;")
  }

  test("urlHost/urlDomain/urlPath decompose crawl URLs") {
    val rows = Seq(
      "https://user:pw@WWW.Sub.Example.COM:8443/a/b/c?q=1#frag",
      "http://example.org/",
      "https://no-path.io?x=1",
      "ftp://Files.Example.net/pub")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "u")
    val out = rows.orderBy("id").select(
        TextAnalysis.urlHost(col("u")),
        TextAnalysis.urlDomain(col("u")),
        TextAnalysis.urlPath(col("u")))
      .as[(String, String, String)].collect().toSeq
    assert(out == Seq(
      ("www.sub.example.com", "example.com", "/a/b/c"),
      ("example.org", "example.org", "/"),
      ("no-path.io", "no-path.io", ""),
      ("files.example.net", "example.net", "/pub")))
  }

  test("PII scrubbing replaces emails/urls/ips/number-runs with tags") {
    val out = Seq(
      (1L, "contact jane.doe+x@example.com or visit https://e.com/u?id=1"),
      (2L, "server at 10.1.2.3 answered"),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "clean text stays untouched"),
      (5L, "released 2024-01-01 under v1.2.34, pages 100-200 (see 7.8.9)"),
      (6L, "card 4111 1111 1111 1111 and phone 555-123-4567 redacted"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.scrubPii(col("text")).as("t"))
      .orderBy("doc_id").as[(Long, String)].collect().toMap
    assert(out(1L) == "contact <EMAIL> or visit <URL>")
    assert(out(2L) == "server at <IP> answered")
    assert(out(3L) == "call <NUMBER> now")
    assert(out(4L) == "clean text stays untouched")
    // <NUMBER> counts ACTUAL digits (9+), not run length: dates, dotted
    // versions, and numeric ranges carry too few digits to be scrubbed
    assert(out(5L) ==
      "released 2024-01-01 under v1.2.34, pages 100-200 (see 7.8.9)")
    assert(out(6L) == "card <NUMBER> and phone <NUMBER> redacted")
  }

  test("repetition ratio separates template spam from prose") {
    val out = Seq(
      (1L, "buy now buy now buy now buy now buy now"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "ab"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.repetitionRatio(col("text")).as("r"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(out(0)._2 > 0.7, s"spam should score high: ${out(0)._2}")
    assert(out(1)._2 == 0.0, "unique prose has no repeated shingles")
    assert(out(2)._2 == 0.0, "short text (< k words) scores 0")
  }

  test("token counts and fingerprint are deterministic") {
    val docs = Seq((1L, "Hello, world! This is a test."))
      .toDF("doc_id", "text")
    val (ws, bpe) = docs.select(
      TextAnalysis.wsTokenCount(col("text")),
      TextAnalysis.bpeTokenEstimate(col("text"))).as[(Int, Long)].head()
    assert(ws == 6)
    assert(bpe > 0)
    val f1 = TextAnalysis.fingerprint(docs, "doc_id", "text")
      .as[(Long, Long)].head()
    val f2 = TextAnalysis.fingerprint(docs, "doc_id", "text")
      .as[(Long, Long)].head()
    assert(f1 == f2)
  }

  test("IVF index on disk prunes partitions at probe time") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = graft.queries.Q.table(spark, sfDir, "embeddings")
    val centroids = Similarity.seedCentroids(emb, "vec_id", "embedding",
      every = 50)
    val assigned = Similarity.ivfAssign(emb, centroids, "vec_id",
      "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Similarity.writeIvfIndex(assigned, s"$dir/index")
    val index = Similarity.readIvfIndex(spark, s"$dir/index")
    // probing two clusters must read only those partitions
    val probe = index.filter(col("cluster").isin(0L, 1L))
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("cluster"), scan)
    // and the pruned read returns exactly the assignment's rows
    val expected = assigned.filter(col("cluster").isin(0L, 1L))
      .select("vec_id").as[Long].collect().toSet
    val got = probe.select("vec_id").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty)
    // the full index round-trips the whole assignment
    assert(index.count() == assigned.count())
  }

  test("knnLabelAgreement flags a planted mislabeled vector") {
    // two tight clusters in 2-D; vector 10 sits in cluster A but wears
    // cluster B's label -> agreement 0 for it, 1.0 for clean vectors
    val a = (0L to 10L).map(i =>
      (i, Array(1.0f, 0.001f * i), if (i == 10L) 1 else 0))
    val b = (20L to 29L).map(i =>
      (i, Array(-1.0f, 0.001f * (i - 20)), 1))
    val emb = (a ++ b).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelAgreement(emb,
        emb.filter(col("vec_id").isin(0L, 10L, 20L)),
        "vec_id", "embedding", "label", k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(10L) == 0.0, "mislabeled vector must have zero agreement")
    assert(out(0L) == 1.0 && out(20L) == 1.0,
      s"clean vectors must agree fully: $out")
    // the audit must broadcast the tiny NN frame, never re-shuffle the
    // corpus labels
    val plan = Similarity.knnLabelAgreement(emb, emb.filter(
        col("vec_id") < 3), "vec_id", "embedding", "label", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("IVF append: new vectors probed without retrain; drift reported") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = graft.queries.Q.table(spark, sfDir, "embeddings")
    val centroids = Similarity.seedCentroids(emb, "vec_id", "embedding",
      every = 50)
    val dir = java.nio.file.Files.createTempDirectory("ivfapp").toString
    val path = s"$dir/index"
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(emb, centroids, "vec_id", "embedding"), path)
    def partFiles(): Map[String, Int] =
      new java.io.File(path).listFiles().filter(_.isDirectory)
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val before = partFiles()

    // the append batch: near-copies of an existing vector, fresh ids
    val seed = emb.filter(col("vec_id") === 7L)
      .select(col("embedding")).as[Array[Float]].head()
    val batch = (0 until 3).map(i =>
      (100000L + i, seed.map(x => x + 0.001f * i)))
      .toDF("vec_id", "embedding")
    val assignedBatch = Similarity.appendToIvfIndex(batch, centroids,
      "vec_id", "embedding", path)
    val touched = assignedBatch.select("cluster").as[Long].collect()
      .map(c => s"cluster=$c").toSet
    // dynamic-partition append: ONLY the touched cluster dirs gained files
    val after = partFiles()
    after.foreach { case (p, n) =>
      if (touched(p)) assert(n > before(p), s"$p must gain a file")
      else assert(n == before.getOrElse(p, 0), s"$p must be untouched")
    }

    // a query equal to the seed vector now finds the appended near-copies
    // through the SAME probe path, no retrain
    val index = Similarity.readIvfIndex(spark, path)
    val queries = Seq((7L, seed)).toDF("vec_id", "embedding")
    val neighbors = Similarity.ivfTopK(index, centroids, queries,
        "vec_id", "embedding", k = 3, nprobe = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(Set(100000L, 100001L, 100002L).subsetOf(neighbors),
      s"appended vectors must be probed: $neighbors")

    // drift report: every indexed cluster rows out with a finite drift,
    // and the appended cluster's member count grew by the batch size
    val drift = Similarity.centroidDriftReport(index, centroids,
        "embedding")
      .collect().map(r => r.getAs[Any]("cluster").toString.toLong ->
        (r.getLong(1), r.getDouble(2))).toMap
    val appendedCluster = assignedBatch.select("cluster").as[Long].head()
    val baseCount = Similarity.ivfAssign(emb, centroids, "vec_id",
        "embedding")
      .filter(col("cluster") === appendedCluster).count()
    assert(drift(appendedCluster)._1 == baseCount + 3)
    assert(drift.values.forall { case (n, d) =>
      n > 0 && !d.isNaN && d >= -1e-6 && d <= 2.0 })
  }

  test("documents fixture is pure ASCII (phash/tokenizer oracle contract)") {
    // the phash oracle walks CODE POINTS (ord/substr) while the Spark
    // side hashes UTF-8 BYTES — identical only for ASCII. If the
    // fixture ever gains a non-ASCII char this canary fails with a
    // clear message instead of a baffling downstream hash mismatch.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = graft.queries.Q.table(spark, s"/root/testdata/$sf",
        "documents")
      val nonAscii = docs
        .filter(length(col("text")) =!=
          length(encode(col("text"), "UTF-8"))).count()
      assert(nonAscii == 0L,
        s"$sf: $nonAscii non-ASCII documents — the phash/tokenizer " +
          "oracles assume byte==codepoint; rewrite them over " +
          "encode(text) before changing the fixture")
    }
  }

  test("wordStats matches the split/regexp formulation on edge inputs") {
    import graft.functions.TextCounters
    val rows = Seq("", "   ", "one", "  leading and trailing  ",
      "tab\tsep\nnewline\rcr", "123 456 a1 _x", "héllo wörld 漢字 mixed",
      "ab\fc", "x  double   runs")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val t = trim(col("t"))
    val ws = split(t, "\\s+")
    val out = rows.select(
      TextCounters.wordStats(col("t")).as("st"),
      when(length(t) === 0, 0L).otherwise(size(ws).cast("long"))
        .as("n_words"),
      length(regexp_replace(t, "\\s+", "")).cast("long").as("non_ws"),
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long")
        .as("alpha"))
      .collect()
    out.foreach { r =>
      val st = r.getAs[scala.collection.Seq[Long]]("st")
      assert(st(0) == r.getAs[Long]("n_words"), s"n_words: $r")
      assert(st(1) == r.getAs[Long]("non_ws"), s"non_ws: $r")
      assert(st(2) == r.getAs[Long]("alpha"), s"alpha: $r")
    }
  }

  test("int8 quantization round-trips within half a scale step") {
    import graft.functions.VectorOps
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector: scale 0
      (3L, Array(-2.0f, 2.0f, 1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val out = vecs.select(col("vec_id"), col("embedding"),
        VectorOps.quantizeInt8(col("embedding")).as("qs"))
      .select(col("vec_id"), col("embedding"), col("qs.scale").as("scale"),
        col("qs.q").as("q"),
        VectorOps.dequantizeInt8(col("qs")).as("back"))
      .collect()
    out.foreach { r =>
      val orig = r.getAs[scala.collection.Seq[Float]]("embedding")
      val back = r.getAs[scala.collection.Seq[Float]]("back")
      val scale = r.getAs[Double]("scale")
      val q = r.getAs[scala.collection.Seq[Int]]("q")
      assert(q.forall(c => c >= -127 && c <= 127), s"codes in range: $q")
      orig.zip(back).foreach { case (o, b) =>
        assert(math.abs(o - b) <= scale / 2 + 1e-9,
          s"vec ${r.getLong(0)}: $o vs $b at scale $scale")
      }
    }
    // the max-|x| element always quantizes to exactly +-127
    val r3 = out.find(_.getLong(0) == 3L).get
    assert(r3.getAs[scala.collection.Seq[Int]]("q").head == -127)
  }

  test("semanticNearDups pairs only within clusters, above threshold") {
    // two planted clusters on orthogonal axes: x-ish vectors 1,2,3 and
    // y-ish vectors 4,5. 3 is x-but-noisy (cosine to 1/2 below the 0.95
    // bar); cross-cluster cosine ~0 can never pair.
    val assigned = Seq(
      (1L, Array(1f, 0f), 0L), (2L, Array(0.99f, 0.05f), 0L),
      (3L, Array(0.7f, 0.7f), 0L),
      (4L, Array(0f, 1f), 1L), (5L, Array(0.01f, 0.98f), 1L))
      .toDF("vec_id", "embedding", "cluster")
    val pairs = Dedup.semanticNearDups(assigned, "vec_id", "embedding",
      "cluster", 0.95).as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (4L, 5L)))
  }

  test("assignHierarchical: total assignment, bounded clusters, " +
    "self-assigned sub-seeds, deterministic") {
    // four tight bundles of three near-identical vectors on four
    // orthogonal axes — cross-bundle cosine ~0, within-bundle ~1. The
    // structural properties below must hold for ANY hash-rank seed
    // choice (the oracle rows pin the exact assignment; this spec pins
    // the invariants that make it an assignment at all).
    def axis(i: Int, eps: Float): Array[Float] = {
      val v = Array.fill(4)(0f); v(i) = 1f
      v((i + 1) % 4) = eps; v
    }
    val rows = (0 until 4).flatMap { b =>
      Seq(0.00f, 0.01f, 0.02f).zipWithIndex.map { case (e, j) =>
        (b * 10L + j, axis(b, e))
      }
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.assignHierarchical(emb, "vec_id", "embedding",
      k1 = 2, k2 = 2)
    val got = out.as[(Long, Seq[Float], Long)].collect()
    // every row assigned exactly once
    assert(got.length == rows.length)
    assert(got.map(_._1).toSet == rows.map(_._1).toSet)
    // cluster ids are member ids, and there are at most k1*k2 of them
    val clusters = got.map(_._3).toSet
    assert(clusters.subsetOf(rows.map(_._1).toSet))
    assert(clusters.size <= 4 && clusters.nonEmpty)
    // a sub-seed is its own nearest sub-seed (distinct vectors: cosine
    // with itself is the unique max), so cluster ids self-assign
    val byId = got.map(t => t._1 -> t._3).toMap
    clusters.foreach(c => assert(byId(c) == c,
      s"cluster seed $c assigned to ${byId(c)}"))
    // near-dup pairs the verification emits are within-bundle only
    // (cross-bundle cosine ~eps can never reach the 0.9 bar)
    val pairs = Dedup.semanticNearDups(out, "vec_id", "embedding",
      "cluster", 0.9).as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(a / 10 == b / 10, s"cross-bundle pair ($a, $b)") }
    // deterministic: same input, same assignment
    val again = Similarity.assignHierarchical(emb, "vec_id", "embedding",
        k1 = 2, k2 = 2)
      .as[(Long, Seq[Float], Long)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(got.map(t => t._1 -> t._3).toMap == again)
  }

  test("assignToHierarchy: probing the index's own corpus reproduces " +
    "the build assignment; probe pairs stay within clusters") {
    def axis(i: Int, eps: Float): Array[Float] = {
      val v = Array.fill(4)(0f); v(i) = 1f
      v((i + 1) % 4) = eps; v
    }
    val rows = (0 until 4).flatMap { b =>
      Seq(0.00f, 0.01f, 0.02f, 0.03f).zipWithIndex.map { case (e, j) =>
        (b * 10L + j, axis(b, e))
      }
    }
    val emb = rows.toDF("vec_id", "embedding")
    val idx = Similarity.buildHierarchyIndex(emb, "vec_id", "embedding",
      k1 = 2, k2 = 2)
    // the probe is the same two argmax levels over the same persisted
    // seeds, so re-assigning the corpus itself must be a fixpoint
    val built = idx.assigned.as[(Long, Seq[Float], Long)].collect()
      .map(t => t._1 -> t._3).toMap
    val probed = Similarity.assignToHierarchy(emb, idx, "vec_id",
        "embedding")
      .as[(Long, Seq[Float], Long)].collect().map(t => t._1 -> t._3).toMap
    assert(probed == built)
    // a disjoint batch: one near-dup of bundle 0 (must pair with a
    // bundle-0 member), one orthogonal-ish stray (pairs with nobody
    // at the 0.9 bar)
    val batch = Seq(
      (100L, axis(0, 0.015f)),
      (101L, Array(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val asg = Similarity.assignToHierarchy(batch, idx, "vec_id",
      "embedding")
    val pairs = Dedup.semanticNearDupsAgainst(asg, idx.assigned,
        "vec_id", "embedding", "cluster", 0.9)
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "the planted near-dup found no corpus dup")
    pairs.foreach { case (n, c) =>
      assert(n == 100L && c / 10 == 0,
        s"unexpected probe pair ($n, $c)") }

    // published round-trip: same pairs from the on-disk layout, and
    // the verification scan is PRUNED to the batch's clusters. The
    // default layout buckets the partition key (cluster mod B — the
    // r19 bounded-directory-namespace publish): the partition filter
    // is on bucket, and the residual cluster IN list must still reach
    // the scan as a pushed data filter (served by row-group stats on
    // the cluster-sorted files)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hier-spec").toString
    Similarity.writeHierarchyIndex(idx, dir, "vec_id", "embedding",
      assignedBuckets = 2)
    val served = Similarity.semanticNearDupsAgainstIndex(batch, dir,
      "vec_id", "embedding", 0.9)
    assert(served.as[(Long, Long)].collect().toSet == pairs.toSet)
    val scan = served.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r
      .findFirstIn(scan).isDefined,
      s"verification scan is not bucket-pruned:\n$scan")
    // a 1-element IN list folds to EqualTo — accept either spelling
    assert("PushedFilters: \\[[^\\]]*(In|EqualTo)\\(cluster".r
      .findFirstIn(scan).isDefined,
      s"cluster IN list did not reach the scan:\n$scan")
    // the bucketed directory namespace is bounded by B, not by the
    // cluster count
    val bucketDirs = new java.io.File(s"$dir/assigned").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(bucketDirs.length <= 2,
      s"expected <= 2 bucket dirs, got ${bucketDirs.map(_.getName).toSeq}")
    // legacy per-cluster hive layout (pre-r19 / assignedBuckets <= 0):
    // identical answers, cluster-level partition pruning
    val dirLegacy = java.nio.file.Files
      .createTempDirectory("graft-hier-spec-legacy").toString
    Similarity.writeHierarchyIndex(idx, dirLegacy, "vec_id", "embedding",
      assignedBuckets = 0)
    val servedLegacy = Similarity.semanticNearDupsAgainstIndex(batch,
      dirLegacy, "vec_id", "embedding", 0.9)
    assert(servedLegacy.as[(Long, Long)].collect().toSet == pairs.toSet,
      "bucketed and legacy layouts must serve identical pairs")
    val scanLegacy = servedLegacy.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r
      .findFirstIn(scanLegacy).isDefined,
      s"legacy verification scan is not cluster-pruned:\n$scanLegacy")
    // column-name mismatch fails loudly, not with silent wrong columns
    intercept[IllegalArgumentException] {
      Similarity.semanticNearDupsAgainstIndex(batch, dir, "doc_id",
        "embedding", 0.9)
    }
  }

  test("semanticContamination: a paraphrase-leaked train doc is " +
      "flagged, clean docs report kept with zero hits") {
    def axis(i: Int, eps: Float): Array[Float] = {
      val v = Array.fill(4)(0f); v(i) = 1f
      v((i + 1) % 4) = eps; v
    }
    // training corpus: four tight direction bundles
    val corpus = (0 until 4).flatMap { b =>
      Seq(0.00f, 0.01f, 0.02f, 0.03f).zipWithIndex.map { case (e, j) =>
        (b * 10L + j, axis(b, e))
      }
    }.toDF("vec_id", "embedding")
    // benchmark: one item semantically equal to bundle 0 (the
    // paraphrase-leak case — no shared surface text exists here at
    // all), one direction no training doc is near
    val bench = Seq(
      (900L, axis(0, 0.015f)),
      (901L, Array(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val report = graft.operators.Decontamination.semanticContamination(
        corpus, bench, "vec_id", "embedding", threshold = 0.9,
        targetClusterSize = 4)
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> t).toMap
    assert(report.size == 16, "one row per training doc, zeros included")
    // every bundle-0 member clears 0.9 cosine vs the leaked item
    (0L to 3L).foreach { id =>
      val (_, hits, kept) = report(id)
      assert(hits == 1L && !kept, s"doc $id should be contaminated") }
    // every other bundle is clean and KEPT (cosine vs both bench
    // items is far below the bar)
    (1 to 3).flatMap(b => (0 to 3).map(j => b * 10L + j)).foreach { id =>
      val (_, hits, kept) = report(id)
      assert(hits == 0L && kept, s"doc $id should be kept") }
  }

  test("gopherRules flags each rule independently") {
    val good = (1 to 30)
      .map(i => s"the quick brown fox jumps over that fence$i")
      .mkString(" ") // 240 words, mean len ~4.6, stopword-rich, alphabetic
    val tooShort = "the and of to is in that with"
    val numeric = (1 to 40).map(i => s"12345 67890 $i").mkString(" ")
    val longWords = (1 to 40)
      .map(_ => "the incomprehensibilities of internationalization")
      .mkString(" ")
    val docs = Seq((1L, good), (2L, tooShort), (3L, numeric),
      (4L, longWords)).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text",
        minWords = 20)
      .select(col("doc_id"), col("keep")).as[(Long, Boolean)]
      .collect().toMap
    assert(out(1L), "well-formed doc passes")
    assert(!out(2L), "under the word-count floor")
    assert(!out(3L), "alpha-word fraction too low")
    assert(!out(4L), "mean word length too high")
  }

  test("multimodal feature extraction preserves schema + checksums") {
    // media 1 is a real 8x8 PGM (decodes to 64 block means); media 2 is
    // junk bytes (no decoder applies -> null features, dead-letter
    // routable) — provenance columns populate for both
    val pgm = ("P5\n8 8\n255\n".getBytes("US-ASCII").toSeq ++
      Array.tabulate(64)(i => (i * 3 % 256).toByte)).toArray
    val media = Seq((1L, "image", pgm),
      (2L, "audio", Array[Byte](4, 5)))
      .toDF("media_id", "modality", "payload")
    val out = Multimodal.extractFeatures(media)
    assert(out.schema == Multimodal.featureSchema)
    val r = out.orderBy("media_id").collect()
    assert(r(0).getAs[Long]("n_bytes") == pgm.length.toLong)
    assert(r(0).getAs[scala.collection.Seq[Float]]("features").length == 64)
    assert(r(1).getAs[Long]("n_bytes") == 2L)
    assert(r(1).isNullAt(r(1).fieldIndex("features")))
  }

  test("dropRepeatedChunks keeps first occurrences, shuffle-free") {
    // w=2 chunks: "a b" / "c d" / "a b" / "e" -> middle repeat dropped
    val docs = Seq((1L, "a b c d a b e"), (2L, "x y x y"),
      (3L, "solo")).toDF("doc_id", "text")
    val out = Dedup.dropRepeatedChunks(docs, "doc_id", "text", w = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"intra-doc dedup is a pure projection, no shuffle:\n$plan")
    val r = out.collect().map(x => x.getLong(0) ->
      (x.getString(1), x.getInt(2), x.getInt(3))).toMap
    assert(r(1L) == (("a b c d e", 4, 3)))
    assert(r(2L) == (("x y", 2, 1)))
    assert(r(3L) == (("solo", 1, 1)))
  }

  test("epochPlan: integer ceil-div epochs and last-pass fraction") {
    // stock: a=4 tokens (2 docs), b=10 tokens (1 doc)
    val docs = Seq((1L, "w x", "a"), (2L, "y z", "a"),
      (3L, "a b c d e f g h i j", "b")).toDF("doc_id", "text", "source")
    val out = graft.operators.Sampling.epochPlan(docs, "source", "text",
      budget = 100L, weights = Map("a" -> 0.1, "b" -> 0.5))
    val r = out.collect().map(x => x.getAs[String]("source") ->
      ((x.getAs[Long]("target_tokens"), x.getAs[Long]("epochs"),
        x.getAs[Double]("last_pass_frac")))).toMap
    // a: target 10 over stock 4 -> 3 epochs, last pass 2/4
    assert(r("a") == ((10L, 3L, 0.5)), r.toString)
    // b: target 50 over stock 10 -> 5 full epochs
    assert(r("b") == ((50L, 5L, 1.0)), r.toString)
    // unweighted sources are dropped; tiny weight -> 0 epochs, frac 0
    val zero = graft.operators.Sampling.epochPlan(docs, "source", "text",
      budget = 1L, weights = Map("a" -> 0.2))
    val z = zero.collect().map(x => x.getAs[String]("source") ->
      ((x.getAs[Long]("epochs"), x.getAs[Double]("last_pass_frac"))))
      .toMap
    assert(z == Map("a" -> ((0L, 0.0))), z.toString)
  }

  test("recallAudit: per-query hit fraction against the exact set") {
    val exact = Seq((1L, 1L, 10L), (1L, 2L, 11L), (2L, 1L, 20L),
      (2L, 2L, 21L)).toDF("query_id", "rank", "neighbor_id")
    val approx = Seq((1L, 1L, 10L), (1L, 2L, 99L), (2L, 1L, 21L),
      (2L, 2L, 20L)).toDF("query_id", "rank", "neighbor_id")
    val r = Similarity.recallAudit(exact, approx)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 1L, 0.5)), r.toString)  // one of two recovered
    assert(r(2L) == ((2L, 2L, 1.0)), r.toString)  // order doesn't matter
  }

  test("removeDuplicateRuns: keep-first excision of shared spans") {
    val run = "one two three four five six seven eight nine ten"  // 10 w
    val docs = Seq(
      (1L, s"alpha beta $run gamma delta"),   // first occurrence: kept
      (2L, s"intro words here $run tail end"),// later copy: run excised
      (3L, "totally unrelated text with no shared span at all okay"),
      (4L, s"$run"))                          // exact copy of the run
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateRuns(docs, "doc_id", "text", w = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"no all-pairs:\n$plan")
    val r = out.collect().map(x => x.getLong(0) ->
      ((x.getString(1), x.getInt(2), x.getInt(3)))).toMap
    // doc 1 is globally first for every window of the run: untouched
    assert(r(1L)._1 == s"alpha beta $run gamma delta", r(1L).toString)
    // docs 2/4: every word of the run is covered; the rest survives
    assert(r(2L)._1 == "intro words here tail end", r(2L).toString)
    assert(r(4L) == (("", 10, 0)), r(4L).toString)
    assert(r(3L)._2 == r(3L)._3, "untouched doc keeps all words")
  }

  test("removeDuplicateRunsAgainst: corpus spans excised, index probed " +
      "by broadcast") {
    val run = "one two three four five six seven eight nine ten"
    val corpus = Seq((1L, s"corpus doc holds $run inside itself fine"))
      .toDF("doc_id", "text")
    val idx = Dedup.buildRunIndex(corpus, "doc_id", "text", w = 8)
    val batch = Seq(
      (10L, s"batch copy of $run plus new words"),  // corpus span: excised
      (11L, "entirely novel batch content nothing shared here at all"),
      (12L, s"unrelated preamble text $run closing remark words"))
      .toDF("doc_id", "text")          // corpus span: also excised
    // the result is eagerly checkpointed (cache release), so the probe
    // plan is asserted via the warn guard: with auto-broadcast disabled,
    // only the operator's explicit broadcast hint prevents the
    // index-shuffle warning — its absence proves the broadcast probe
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val out =
      try Dedup.removeDuplicateRunsAgainst(batch, idx,
        "doc_id", "text", w = 8)
      finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        System.setErr(old)
      }
    assert(!buf.toString("UTF-8").contains("re-shuffle per batch"),
      s"broadcast probe must not trigger the index-shuffle warning: " +
        buf.toString("UTF-8"))
    val r = out.collect().map(x => x.getLong(0) ->
      ((x.getString(1), x.getInt(2), x.getInt(3)))).toMap
    assert(r(10L)._1 == "batch copy of plus new words", r(10L).toString)
    assert(r(11L)._2 == r(11L)._3, "novel doc untouched")
    // doc 12 shares the run with BOTH corpus and doc 10: corpus match
    // wins, both batch copies are excised (no batch-first exemption)
    assert(r(12L)._1 == "unrelated preamble text closing remark words",
      r(12L).toString)
    // batch-internal-only repeats keep the batch-first occurrence
    val b2 = Seq((20L, "fresh span alpha beta gamma delta epsilon zeta " +
        "eta theta close"),
      (21L, "later copy alpha beta gamma delta epsilon zeta eta theta " +
        "end here")).toDF("doc_id", "text")
    val r2 = Dedup.removeDuplicateRunsAgainst(b2, idx, "doc_id", "text",
        w = 8).collect()
      .map(x => x.getLong(0) -> x.getInt(3)).toMap
    assert(r2(20L) == 11 && r2(21L) == 4,
      s"keep batch-first among batch-only repeats: $r2")
  }

  test("filterFunnel: cumulative stage counts in one scan, no joins") {
    val en = "the quick brown fox and the lazy dog walk to the old town " +
      "with many other animals in that green field of grass and flowers " +
      "that is wide and open with room to run and play in the summer sun"
    val docs = Seq(
      (1L, en),                                  // passes everything
      (2L, "der hund und die katze mit dem ball"), // fails lang
      (3L, "the of and to is in that with"))      // en but fails Gopher
      .toDF("doc_id", "text")
    val out = TextAnalysis.filterFunnel(docs, "text", lang = "en",
      minWords = 20, maxRepetition = 0.5, minQuality = 0.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"funnel must not join the stages:\n$plan")
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"one scan + the single-row exchange only:\n$plan")
    val r = out.collect()(0)
    assert(r.getAs[Long]("n_total") == 3L)
    assert(r.getAs[Long]("n_lang") == 2L)
    assert(r.getAs[Long]("n_gopher") == 1L)
    assert(r.getAs[Long]("n_quality") == 1L)
    assert(r.getAs[Double]("keep_frac") == 1.0 / 3.0)
  }

  test("hashedClassifierScore: hand-computed score, zero exchanges") {
    // dim 1, weight {7}: every feature hits bucket 0 -> raw = n_feats * 7
    val docs = Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    val one = TextAnalysis.hashedClassifierScore(docs, "doc_id", "text",
      Seq(7))
    val plan = one.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"classifier scoring is a pure projection, no shuffle:\n$plan")
    val r = one.collect().map(x => x.getLong(0) ->
      ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getBoolean(4))))
      .toMap
    // "a b c": 3 unigrams + 2 bigrams = 5 feats; "solo": 1 + 0
    assert(r(1L) == ((5L, 35L, 7.0, true)))
    assert(r(2L) == ((1L, 7L, 7.0, true)))
    // negative-weight vector flips keep at threshold 0
    val neg = TextAnalysis.hashedClassifierScore(docs, "doc_id", "text",
      Seq(-3)).collect().map(x => x.getBoolean(4))
    assert(neg.forall(_ == false))
  }

  test("nbTrainHashed: trained weights separate labeled slices") {
    // positive docs speak one vocabulary, negative another; the trained
    // scorer must rank every held-out positive above every negative
    val docs = Seq(
      (1L, "good fine great", true), (2L, "fine good good", true),
      (3L, "bad awful spam", false), (4L, "spam bad bad", false),
      (5L, "great fine", true), (6L, "awful spam", false))
      .toDF("doc_id", "text", "pos")
    val dim = 64
    val trained = TextAnalysis.nbTrainHashed(docs, col("pos"), "text", dim)
    val rows = trained.collect()
    // weights live in [-scale, scale] and counts are exact
    assert(rows.forall(r => math.abs(r.getLong(3)) <= 1000L))
    // positive feature instances: (3+2) + (3+2) + (2+1) uni+bi = 13
    assert(rows.map(r => r.getLong(1)).sum == 13L)
    val w = TextAnalysis.nbWeightsArray(trained, dim)
    val scored = TextAnalysis.hashedClassifierScore(docs, "doc_id",
      "text", w).collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val posMin = Seq(1L, 2L, 5L).map(scored).min
    val negMax = Seq(3L, 4L, 6L).map(scored).max
    assert(posMin > 0 && negMax < 0 && posMin > negMax,
      s"trained classifier failed to separate: posMin=$posMin negMax=$negMax")
    // partitioning invariance: exact integer counts
    val re = TextAnalysis.nbTrainHashed(docs.repartition(7), col("pos"),
      "text", dim).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(re.toSeq == rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted.toSeq)
  }

  test("oovRate: vocab misses counted per instance, vocab broadcast") {
    // vocab size 2 -> {"aa", "bb"} (counts 3, 2); "zz"/"qq" are OOV
    val docs = Seq((1L, "aa aa bb"), (2L, "aa bb zz"), (3L, "zz qq"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", vocabSize = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab probe must broadcast, not shuffle the instances:\n$plan")
    val r = out.collect().map(x => x.getLong(0) ->
      (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((3L, 0L, 0.0)))
    assert(r(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(r(3L) == ((2L, 2L, 1.0)))
  }

  test("GreedyTokenCount: longest match wins, UNK falls back to chars") {
    import graft.functions.GreedyTokenCount
    val vocab = Seq("abc", "ab", "cd", "x")
    val rows = Seq(
      ("abcd", 2L),     // "abc" (longest beats "ab") + "d" UNK
      ("abcd abcd", 4L),
      ("xcdx", 3L),     // "x" + "cd" + "x"
      ("zzz", 3L),      // all UNK chars
      ("", 0L),         // empty word contributes nothing
      ("   ", 0L),
      ("ab\tcd\nx", 3L) // whitespace-split like the other text ops
    ).toDF("t", "expected")
    val bad = rows.select(
        GreedyTokenCount.tokenCount(col("t"), vocab).as("got"),
        col("expected"))
      .filter(col("got") =!= col("expected")).count()
    assert(bad == 0, rows.select(col("t"),
      GreedyTokenCount.tokenCount(col("t"), vocab)).collect().mkString(","))
  }

  test("GreedyTokenCount rejects non-string input at analysis time") {
    import graft.functions.GreedyTokenCount
    val e = intercept[Exception] {
      Seq(1L).toDF("n")
        .select(GreedyTokenCount.tokenCount(col("n"), Seq("a")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"),
      s"expected an analysis-time type error, got: ${e.getMessage}")
  }

  test("trainUnitVocab: words + bigrams, count-desc/lexicographic order") {
    // instances: "aa" x3, "ab" x1; bigrams per instance: aa->"aa",
    // ab->"ab". Counts: "aa" unit 3+3=6, "ab" unit 1+1=2
    val docs = Seq((1L, "aa aa"), (2L, "aa ab")).toDF("doc_id", "text")
    val v = TextAnalysis.trainUnitVocab(docs, "text", vocabSize = 2).toSeq
    assert(v == Seq("aa", "ab"), s"got $v")
  }

  test("vocabTokenCounts is a zero-exchange, whole-stage-codegen projection") {
    // a real file scan: local relations constant-fold to LocalTableScan,
    // which would vacuously pass the no-Exchange assert and dodge codegen
    val dir = java.nio.file.Files.createTempDirectory("tok-plan").toString
    Seq((1L, "ab cd zz"), (2L, "abab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val out = TextAnalysis.vocabTokenCounts(spark.read.parquet(dir),
      "doc_id", "text", Seq("ab", "cd"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"encode must not shuffle or join:\n$plan")
    // the encode participates in whole-stage codegen (no interpreted
    // CodegenFallback boundary): the Project carrying the tokenizer
    // must print starred, i.e. inside a WholeStageCodegen stage
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).nonEmpty,
      s"tokenizer projection fell out of whole-stage codegen:\n$plan")
    val r = out.collect().map(x => x.getLong(0) ->
      (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == ((3L, 4L)))  // ab + cd + z,z
    assert(r(2L) == ((1L, 2L)))  // ab + ab
  }

  test("mixturePlan and packPlan budget on learned token counts") {
    import graft.functions.GreedyTokenCount
    val vocab = Seq("ab")
    val docs = Seq(
      (1L, "s1", "ab ab"),   // 2 vocab tokens (ws: 2)
      (2L, "s1", "zzzz"),    // 4 UNK tokens  (ws: 1)
      (3L, "s2", "ab"))      // 1 vocab token (ws: 1)
      .toDF("doc_id", "source", "text")
    val toks = GreedyTokenCount.tokenCount(col("text"), vocab)
    val mix = Sampling.mixturePlan(docs, "source", "text",
        Map("s1" -> 1.0, "s2" -> 1.0), tokensCol = Some(toks))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(mix == Map("s1" -> 6L, "s2" -> 1L),
      s"learned counts must flow into the budget: $mix")
    val pack = Sampling.packPlan(docs, "doc_id", "text", seqLen = 4,
        numShards = 1, tokensCol = Some(toks))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pack == Map(1L -> 2L, 2L -> 4L, 3L -> 1L), s"got $pack")
  }

  test("AHash64 matches a reference implementation on random payloads") {
    import graft.functions.AHash64
    def ref(bytes: Array[Byte]): Long = {
      val n = bytes.length
      if (n == 0) return 0L
      val total = bytes.map(b => (b & 0xff).toLong).sum
      (0 until 64).foldLeft(0L) { (h, k) =>
        val lo = ((k.toLong * n) / 64).toInt
        val hi = (((k + 1).toLong * n) / 64).toInt
        val sum = (lo until hi).map(j => (bytes(j) & 0xff).toLong).sum
        if (sum * n > total * (hi - lo)) h | (1L << k) else h
      }
    }
    val rnd = new scala.util.Random(42)
    // sizes straddle the blocks-per-byte boundaries: n < 64 has empty
    // blocks, n = 64 exact, larger exercises uneven block widths
    val payloads = Seq(Array.emptyByteArray,
      Array.fill[Byte](7)(42), Array.fill[Byte](100)(7)) ++
      Seq(3, 63, 64, 65, 1000).map(n =>
        { val a = new Array[Byte](n); rnd.nextBytes(a); a })
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
    val got = df.select(col("id"), AHash64.aHash(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    payloads.zipWithIndex.foreach { case (p, i) =>
      assert(got(i.toLong) == ref(p), s"payload $i (${p.length} bytes)")
    }
    // constant payloads: no block exceeds the mean -> all bits unset
    assert(got(1L) == 0L && got(2L) == 0L && got(0L) == 0L)
  }

  test("phashNearDups: banded pairs match brute force, no cross join") {
    // two payloads differing in ONE byte are near-dups; a third is noise
    val base = (0 until 256).map(i => ((i * 37) % 251).toByte).toArray
    val tweaked = base.clone(); tweaked(100) = (tweaked(100) ^ 0x7f).toByte
    val noise = (0 until 256).map(i => ((i * 113 + 55) % 241).toByte).toArray
    val media = Seq((1L, base), (2L, tweaked), (3L, noise))
      .toDF("media_id", "payload")
    val out = Multimodal.phashNearDups(media, "media_id", "payload",
      maxHamming = 12)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"banded join must not degenerate to all-pairs:\n$plan")
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"noise payload must not pair: $pairs")
  }

  test("phashNearDupsDecoded bandBits=16: exact subset of 8-bit pairs, " +
      "ham<=3 certainty kept") {
    // real P5 payloads so the DECODED path runs: 8x8 rasters, so each
    // aHash block is one pixel. Pairs: (base, one-pixel tweak) per
    // cluster -> tiny hamming; independent rasters -> noise
    def pgm(seed: Int, tweak: Boolean): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      val px = new Array[Byte](64); rnd.nextBytes(px)
      if (tweak) px(17) = (px(17) ^ 0x7f).toByte
      ("P5\n8 8\n255\n").getBytes("ISO-8859-1") ++ px
    }
    val media = (0 until 8).flatMap(s => Seq(
        (s * 2L, pgm(s, tweak = false)), (s * 2L + 1, pgm(s, tweak = true))))
      .toDF("media_id", "payload")
    def pairsOf(bb: Int) = Multimodal.phashNearDupsDecoded(
        media, "media_id", "payload", maxHamming = 12, bandBits = bb)
      .as[(Long, Long, Int)].collect().toSet
    val (narrow, wide) = (pairsOf(8), pairsOf(16))
    // a shared 16-bit band means both its 8-bit halves are shared: the
    // wide candidate set (hence verified pair set) can never mint a
    // pair the 8-bit spelling missed
    assert(wide.subsetOf(narrow),
      s"wide-band pairs must be a subset: ${wide.diff(narrow)}")
    // pigeonhole over 4 bands: every pair within hamming 3 shares some
    // 16-bit band untouched -> certainty range survives the scale knob
    val certain = narrow.filter(_._3 <= 3)
    assert(certain.nonEmpty, "fixture must plant hamming<=3 pairs")
    assert(certain.subsetOf(wide),
      s"ham<=3 pairs lost by wide bands: ${certain.diff(wide)}")
  }

  test("validateEmbeddings flags dim, NaN and zero-norm vectors") {
    val emb = Seq(
      (1L, Array(1.0f, 2.0f)),                 // valid (dim 2)
      (2L, Array(1.0f, Float.NaN)),            // NaN
      (3L, Array(0.0f, 0.0f)),                 // zero norm
      (4L, Array(1.0f, 2.0f, 3.0f)))           // wrong dim
      .toDF("vec_id", "embedding")
    val r = Similarity.validateEmbeddings(emb, "vec_id", "embedding",
        expectedDim = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getInt(1), x.getBoolean(2), x.getBoolean(3), x.getBoolean(4)))
      .toMap
    assert(r(1L) == ((2, false, false, true)))
    assert(r(2L) == ((2, true, false, false)))
    assert(r(3L) == ((2, false, true, false)))
    assert(r(4L) == ((3, false, false, false)))
  }

  test("wordChunks matches the transform/sequence formulation on edges") {
    import graft.functions.TextShingles
    // trailing/leading TAB and NEWLINE are the divergence traps: SQL
    // trim strips spaces only, and split(-1) keeps trailing empty
    // tokens — the one-pass expression must reproduce both
    val rows = Seq("", "   ", "one", "one two", "one two three",
      "a b c d e f g h i", "  pad  ded   runs\tand\nlines  ",
      "héllo wörld 漢字 MIXED Case",
      "foo bar\n", "\tfoo bar", "foo bar\t\n", "a\nb ")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    for (w <- Seq(1, 2, 4)) {
      val ws = split(trim(lower(col("t"))), "\\s+")
      val nChunks = ceil(size(ws).cast("double") / w).cast("int")
      val composed = transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(ws, i * lit(w) + 1, lit(w)), " "))
      val bad = rows.select(
          TextShingles.wordChunks(col("t"), w).as("fast"),
          composed.as("slow"))
        .filter(not(col("fast") === col("slow"))).count()
      assert(bad == 0, s"w=$w: fast chunking diverges from composed")
    }
  }

  test("stress: boilerplate removal + DSIR at 100k docs") {
    // 100k ~16-word docs; every doc shares one planted boilerplate
    // chunk (df=100k) plus a unique tail. Checks the corpus-sized
    // window paths complete and conserve invariants at 200x the oracle
    // scale.
    val docs = spark.range(100000L).selectExpr("id AS doc_id",
      """concat('click here to accept all cookies now ok ',
        |'tail', id, ' ', 'w', id % 97, ' w', id % 89, ' w', id % 83,
        |' w', id % 79, ' w', id % 73, ' w', id % 71, ' w', id % 67)
        |""".stripMargin.replaceAll("\n", "") + " AS text")
    val boiler = Dedup.removeBoilerplateChunks(docs, "doc_id", "text",
      w = 8, minDf = 2)
    val agg = boiler.agg(
      count(lit(1)), sum(col("total_chunks")), sum(col("kept_chunks")))
      .collect().head
    assert(agg.getLong(0) == 100000L)
    // 2 chunks per doc (16 words, w=8); the planted chunk always drops
    assert(agg.getLong(1) == 200000L)
    assert(agg.getLong(2) <= 100000L, "shared chunk must be cut")
    // DSIR over the same corpus: target = 1% of docs; score bounds
    val scored = TextAnalysis.importanceWeights(docs, "doc_id", "text",
      col("doc_id") % 100 === 0, scale = 10000L)
    val s = scored.agg(count(lit(1)), min(col("dsir_score")),
      max(col("dsir_score"))).collect().head
    assert(s.getLong(0) == 100000L)
    assert(s.getLong(1) >= 0L)
    // per-token contrib <= scale, docs have 16 tokens
    assert(s.getLong(2) <= 16L * 10000L)
  }

  test("stress: vocab tokenizer + perceptual hash at 100k rows") {
    val docs = spark.range(100000L).selectExpr("id AS doc_id",
      "concat('alpha beta gamma tail', id, ' w', id % 97, ' w', id % 89," +
        " ' w', id % 83, ' w', id % 79) AS text")
    // training plan must top-k with TakeOrderedAndProject, not a global
    // sort of the unit counts
    val vocabDf = TextAnalysis.trainUnitVocabDf(docs, "text", 32)
    val trainPlan = vocabDf.queryExecution.executedPlan.toString
    assert(trainPlan.contains("TakeOrderedAndProject"),
      s"vocab training must not global-sort:\n$trainPlan")
    val vocab = vocabDf.collect().map(_.getString(0)).toIndexedSeq
    assert(vocab.size == 32 && vocab.contains("alpha"))
    // encode the full corpus: conservation bounds hold at scale
    // (tokens >= words when every word is non-empty; <= total chars)
    val enc = TextAnalysis.vocabTokenCounts(docs, "doc_id", "text", vocab)
      .join(docs, "doc_id")
      .agg(count(lit(1)),
        sum(when(col("n_tokens") >= col("n_words"), 0L).otherwise(1L)),
        sum(when(col("n_tokens") <=
          length(regexp_replace(col("text"), "\\s+", "")), 0L)
          .otherwise(1L)))
      .collect().head
    assert(enc.getLong(0) == 100000L)
    assert(enc.getLong(1) == 0L, "n_tokens >= n_words must hold per doc")
    assert(enc.getLong(2) == 0L, "n_tokens <= non-ws chars must hold")

    // perceptual hashing 100k DIVERSE payloads (md5-derived bytes — a
    // 100k-identical-template corpus would rightly collapse into a few
    // hash classes and pair quadratically, which is near-dup semantics,
    // not a scale defect): distinct-rate sanity + the banded pair path
    // completes without a cross join
    val media = spark.range(100000L).selectExpr("id AS media_id",
      "CAST(concat(md5(CAST(id AS STRING)), md5(CAST(id AS STRING) || 'a')," +
        " md5(CAST(id AS STRING) || 'b'), md5(CAST(id AS STRING) || 'c'))" +
        " AS BINARY) AS payload")
    val hashed = media.select(
      graft.functions.AHash64.aHash(col("payload")).as("h"))
    assert(hashed.select(countDistinct(col("h"))).head().getLong(0)
      > 90000L, "aHash must spread diverse payloads")
    val pairs = Multimodal.phashNearDups(media, "media_id", "payload",
      maxHamming = 2)
    // tight threshold at 100k rows: completes and returns a bounded set
    assert(pairs.count() < 100000L)
  }

  test("stress: snapshot diff + gram moments + vocab drift at 100k rows") {
    // same membership/change derivation as the registry queries, at
    // 200x the oracle scale; expected status counts replayed exactly
    // by a driver loop over the id space
    val docs = spark.range(100000L).selectExpr("id AS doc_id",
      "concat('base text w', id % 97, ' w', id % 89, ' tail', id) AS text")
    val oldSnap = docs.filter(col("doc_id") % 10 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v1"))).otherwise(col("text")))
    val newSnap = docs.filter(col("doc_id") % 9 =!= 0)
    val got = CorpusDiff.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var (added, removed, changed, unchanged) = (0L, 0L, 0L, 0L)
    (0L until 100000L).foreach { id =>
      val inOld = id % 10 != 0
      val inNew = id % 9 != 0
      if (!inOld && inNew) added += 1
      else if (inOld && !inNew) removed += 1
      else if (inOld && inNew) {
        if (id % 7 == 0) changed += 1 else unchanged += 1
      }
    }
    assert(got == Map("added" -> added, "removed" -> removed,
      "changed" -> changed, "unchanged" -> unchanged), got.toString)

    // gram moments over 100k 8-dim vectors with values in [-127, 127]
    // (global scale exactly 1 -> lossless codes, driver-replayable)
    val emb = spark.range(100000L).selectExpr("id AS vec_id",
      ("array(" + (0 until 8).map(k =>
        s"CAST((id + $k) % 255 - 127 AS FLOAT)").mkString(", ") +
        ") AS embedding"))
    val m = Pca.momentRows(emb, "embedding", 8).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def q(id: Long, k: Int): Long = (id + k) % 255 - 127
    var (s0, p00, p01) = (0L, 0L, 0L)
    (0L until 100000L).foreach { id =>
      s0 += q(id, 0); p00 += q(id, 0) * q(id, 0)
      p01 += q(id, 0) * q(id, 1)
    }
    assert(m((-1, -1)) == 100000L)
    assert(m((0, -1)) == s0, s"sum0 ${m((0, -1))} vs $s0")
    assert(m((0, 0)) == p00)
    assert(m((0, 1)) == p01)

    // vocab drift between the two snapshots: bounded output, valid ranks
    val drift = TextAnalysis.vocabDrift(oldSnap, newSnap, "text",
      k = 3, topN = 50).collect()
    assert(drift.length >= 50 && drift.length <= 100, drift.length)
    assert(drift.forall { r =>
      val or = Option(r.get(1)).map(_.asInstanceOf[Long])
      val nr = Option(r.get(2)).map(_.asInstanceOf[Long])
      or.forall(v => v >= 1 && v <= 50) && nr.forall(v => v >= 1 && v <= 50)
    })
  }

  test("trainBpeUnits: classic merge order on the Sennrich toy corpus") {
    import spark.implicits._
    // word frequencies: low×5, lower×2, newest×6, widest×3 — the
    // canonical BPE example; expected merges hand-computed:
    // (e,s)=9 ties (s,t)=9 -> lexicographic 'es'; then (es,t)=9 ->
    // 'est'; then (l,o)=7 ties (o,w)=7 -> 'lo'; then (lo,w)=7 -> 'low'
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val units = TextAnalysis.trainBpeUnits(docs, "text",
      maxWords = 100, merges = 4)
    val mergedInOrder = units.filter(_.length > 1)
    assert(mergedInOrder == Seq("es", "est", "lo", "low"),
      units.toString)
    // the greedy encoder consumes the BPE vocab unchanged:
    // "newest" -> n|e|w|est (4 tokens), "low" -> low (1 token)
    val enc = TextAnalysis.vocabTokenCounts(docs, "doc_id", "text", units)
      .join(docs, "doc_id").select(col("text"), col("n_tokens"))
      .distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enc("newest") == 4L, enc.toString)
    assert(enc("low") == 1L)
    assert(enc("lower") == 3L, "expected low|e|r: " + enc.toString)
    // merge exhaustion: more rounds than pairs terminates cleanly
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val u2 = TextAnalysis.trainBpeUnits(tiny, "text", 10, 50)
    assert(u2 == Seq("a", "b", "ab"))
  }

  test("maintainSumCount: delta algebra, group birth/death, bad deletes") {
    import spark.implicits._
    val facts = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0))
      .toDF("k", "v")
    val base = IncrementalAgg.sumCountRollup(facts, Seq("k"), col("v"))
    // insert into a NEW group c and existing a; delete ALL of b
    val ins = Seq(("a", 4.0), ("c", 7.0)).toDF("k", "v")
    val del = Seq(("b", 5.0)).toDF("k", "v")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.getDecimal(3)).map(_.doubleValue())))).toMap
    val out = asMap(IncrementalAgg.maintainSumCount(base, ins, del,
      Seq("k"), col("v")))
    // a: 2 rows +1 = 3, sum 3+4=7; b: vanished; c: born with 1 row
    assert(out == Map("a" -> ((3L, 3L, Some(7.0))),
      "c" -> ((1L, 1L, Some(7.0)))), out.toString)
    // maintained result equals a from-scratch rollup of the final set
    val finalFacts = Seq(("a", 1.0), ("a", 2.0), ("a", 4.0), ("c", 7.0))
      .toDF("k", "v")
    val scratch = asMap(IncrementalAgg.sumCountRollup(finalFacts, Seq("k"),
      col("v")))
    assert(scratch == out)
    // NULL discipline: a group whose surviving rows are all NULL-valued
    // yields sum_val = NULL (recompute semantics), not the delta
    // algebra's cancelled 0 — and counts still track every row
    val nBase = IncrementalAgg.sumCountRollup(
      Seq(("n", Some(3.0)), ("n", None)).toDF("k", "v"), Seq("k"),
      col("v"))
    val nOut = asMap(IncrementalAgg.maintainSumCount(nBase,
      Seq(("n", Option.empty[Double])).toDF("k", "v"),
      Seq(("n", Some(3.0))).toDF("k", "v"), Seq("k"), col("v")))
    assert(nOut == Map("n" -> ((2L, 0L, None))), nOut.toString)
    val nScratch = asMap(IncrementalAgg.sumCountRollup(
      Seq(("n", Option.empty[Double]), ("n", Option.empty[Double]))
        .toDF("k", "v"), Seq("k"), col("v")))
    assert(nScratch == nOut)
    // a non-null measure that cannot fit decimal(18,2) fails loudly
    // instead of silently dropping from the sum while being counted
    val big = intercept[Exception] {
      IncrementalAgg.sumCountRollup(
        Seq(("x", "99999999999999999999")).toDF("k", "v"), Seq("k"),
        col("v")).collect()
    }
    // under ANSI (the default) the cast itself raises; under non-ANSI
    // the explicit checkedVal guard does — either way it is loud
    def loud(m: String) = m.contains("decimal(18,2)") ||
      m.contains("Decimal(18, 2)")
    assert(loud(big.getMessage) ||
      Option(big.getCause).exists(c => loud(c.getMessage)), big.toString)
    // deleting more rows than the base holds must fail loudly
    val bad = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 1.0))
      .toDF("k", "v")
    def overDelete(e: Exception): Boolean =
      e.getMessage.contains("over-delete") ||
        Option(e.getCause).exists(_.getMessage.contains("over-delete"))
    val ex = intercept[Exception] {
      IncrementalAgg.maintainSumCount(base, ins.limit(0), bad,
        Seq("k"), col("v")).collect()
    }
    assert(overDelete(ex), ex.toString)
    // ...even when co-arriving inserts net the count back >= 0
    val masked = intercept[Exception] {
      IncrementalAgg.maintainSumCount(base,
        Seq(("a", 9.0), ("a", 9.0)).toDF("k", "v"),
        Seq(("a", 1.0), ("a", 1.0), ("a", 2.0)).toDF("k", "v"),
        Seq("k"), col("v")).collect()
    }
    assert(overDelete(masked), masked.toString)
  }

  test("property: snapshotDiff statuses match a reference model") {
    import spark.implicits._
    import org.scalacheck.Gen
    // small key/value spaces force every status to occur
    val kv = for {
      k <- Gen.choose(0L, 30L)
      v <- Gen.oneOf("a", "b", "c", "shared dup text")
    } yield (k, v)
    def sample() = Gen.listOfN(40, kv).sample.getOrElse(Nil)
      .distinctBy(_._1)
    val oldRows = sample()
    val newRows = sample()
    val oldDf = oldRows.toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    val newDf = newRows.toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    val diff = CorpusDiff.snapshotDiff(oldDf, newDf, "doc_id", "text",
      carry = Seq("source"))
    val got = diff.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val om = oldRows.toMap
    val nm = newRows.toMap
    val expected = (om.keySet ++ nm.keySet).map { k =>
      k -> ((om.get(k), nm.get(k)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a != b => "changed"
        case _ => "unchanged"
      })
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
    // rollup conservation: Σ delta_chars over every status equals the
    // corpus-wide character delta
    val total = CorpusDiff.diffSummary(diff, "source")
      .agg(sum(col("delta_chars"))).head().getLong(0)
    val charDelta = nm.values.map(_.length.toLong).sum -
      om.values.map(_.length.toLong).sum
    assert(total == charDelta, s"$total vs $charDelta")
  }

  test("property: chunk family invariants on random word streams") {
    import org.scalacheck.Gen
    // small vocab forces chunk collisions within and across docs
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val text = Gen.choose(0, 40)
      .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val docs = Gen.listOfN(60, text).sample.getOrElse(Nil)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val w = 3
    def referenceChunks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.grouped(w)
        .map(_.mkString(" ")).toSeq
    val dropped = Dedup.dropRepeatedChunks(docs, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    docs.collect().foreach { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      val ch = referenceChunks(t)
      val (clean, total, kept) = dropped(id)
      assert(total == ch.length, s"doc $id chunk count")
      assert(kept == ch.distinct.length, s"doc $id kept count")
      // reassembly = first occurrences in order
      assert(clean == ch.distinct.mkString(" "), s"doc $id text")
    }
    // chunkDupStats total matches the same tiling on every doc
    val stats = Dedup.chunkDupStats(docs, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.collect().foreach { r =>
      assert(stats(r.getLong(0)) == referenceChunks(r.getString(1)).length)
    }
  }

  test("removeBoilerplateChunks cuts cross-doc chunks, keeps in-doc ones") {
    // w=2: "nav bar" appears in docs 1 and 2 (df=2 -> cut everywhere);
    // "own own" repeats only WITHIN doc 3 (df=1 -> kept, both copies)
    val docs = Seq(
      (1L, "nav bar alpha beta"),
      (2L, "nav bar gamma delta"),
      (3L, "own own own own epsilon")).toDF("doc_id", "text")
    val r = Dedup.removeBoilerplateChunks(docs, "doc_id", "text",
        w = 2, minDf = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getInt(2), x.getInt(3))).toMap
    assert(r(1L) == (("alpha beta", 2, 1)))
    assert(r(2L) == (("gamma delta", 2, 1)))
    assert(r(3L) == (("own own own own epsilon", 3, 3)))
  }

  test("exactAgainst flags batch docs colliding with the corpus index") {
    val corpus = Seq((10L, "known text"), (11L, "other text"))
      .toDF("doc_id", "text")
    val batch = Seq((100L, "known text"), (101L, "novel text"))
      .toDF("doc_id", "text")
    val idx = Dedup.exact(corpus, "doc_id", "text")
    val r = Dedup.exactAgainst(batch, idx, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(2)) None else Some(x.getLong(2)))).toMap
    assert(r(100L) == Some(10L), "collides with corpus keep-id")
    assert(r(101L).isEmpty, "novel text has no dup_of")
  }

  test("exactAgainst over a bucketed index never shuffles the index side") {
    val t = "graft_exact_idx_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val corpus = (1 to 200).map(i => (i.toLong, s"corpus doc number $i"))
      .toDF("doc_id", "text")
    graft.sink.MergeSink.publishBucketed(
      Dedup.exact(corpus, "doc_id", "text"), t, Seq("text_hash"),
      numBuckets = 4)
    val batch = Seq((1000L, "corpus doc number 7"), (1001L, "novel"))
      .toDF("doc_id", "text")
    // force the SMJ path (the 100 TB shape): a broadcast of the tiny test
    // index would hide whether the index side is exchange-free
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = Dedup.exactAgainst(batch, spark.table(t), "doc_id", "text")
      val plan = out.queryExecution.executedPlan.toString
      val exchanges =
        "Exchange hashpartitioning".r.findAllMatchIn(plan).size
      assert(plan.contains("Bucketed: true"),
        s"expected bucketed index scan in plan:\n$plan")
      assert(exchanges == 1,
        s"only the batch side may exchange, saw $exchanges:\n$plan")
      assert(out.filter(col("dup_of").isNotNull).count() == 1)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("exactAgainstBloomed matches exactAgainst exactly") {
    val corpus = (1 to 200).map(i => (i.toLong, s"corpus text $i"))
      .toDF("doc_id", "text")
    val batch = ((1 to 30).map(i => (1000L + i, s"novel text $i")) ++
      Seq((2000L, "corpus text 7"), (2001L, "corpus text 150")))
      .toDF("doc_id", "text")
    val idx = Dedup.exact(corpus, "doc_id", "text")
    val bloom = Dedup.buildIndexBloom(idx, "text_hash", k = 4, m = 2048)
    val plain = Dedup.exactAgainst(batch, idx, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val bloomed = Dedup.exactAgainstBloomed(batch, idx, "doc_id", "text",
        bloom, bloomK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(bloomed == plain,
      "the Bloom short-circuit must never change results")
    assert(plain.count(_._3 >= 0) == 2, "fixture sanity: two collisions")
  }

  test("minhashNearDupsAgainstBloomed matches the unbloomed probe") {
    // near-dup text needs shared shingles: corpus docs repeat a phrase,
    // two batch docs echo it (true hits), the rest are novel
    val phrase = "the quick brown fox jumps over the lazy sleeping dog " +
      "again and again in the long green meadow"
    val corpus = (1 to 60).map(i => (i.toLong, s"$phrase corpus tail $i"))
      .toDF("doc_id", "text")
    val batch = ((1 to 40).map(i =>
      (1000L + i, s"completely novel unrelated words number $i nothing " +
        s"shared here at all with index content $i")) ++
      Seq((2000L, s"$phrase corpus tail 7"),
        (2001L, s"$phrase corpus tail 33")))
      .toDF("doc_id", "text")
    val idx = Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 12)
    val bloom = Dedup.buildMinhashBandBloom(idx, numHashes = 12,
      rowsPerBand = 3, bloomK = 5, bloomM = 1 << 14)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val plain = Dedup.minhashNearDupsAgainst(batch, idx, "doc_id", "text")
      .collect().map(key).toSet
    val bloomed = Dedup.minhashNearDupsAgainstBloomed(batch, idx,
      "doc_id", "text", bloom, bloomK = 5).collect().map(key).toSet
    assert(bloomed == plain,
      "the band-key Bloom must never drop a true collision")
    assert(plain.nonEmpty, "fixture sanity: the echoed docs must collide")

    // published-index round trip: write sigs + bloom sidecar, read
    // back, probe — identical result, parameters travel with the index
    val dir = java.nio.file.Files.createTempDirectory("sigidx").toString
    Dedup.writeSignatureIndex(idx, dir, numHashes = 12, rowsPerBand = 3,
      bloomK = 5, bloomM = 1 << 14)
    val restored = Dedup.readSignatureIndex(spark, dir)
    assert(restored.bloomBits.sameElements(bloom) &&
      restored.bloomK == 5 && restored.numHashes == 12 &&
      restored.rowsPerBand == 3)
    val served = Dedup.minhashNearDupsAgainstIndex(batch, restored,
      "doc_id", "text").collect().map(key).toSet
    assert(served == plain,
      "probe through the published index must equal the direct probe")
  }

  test("banded-postings index prunes shard files and serves the probe") {
    val phrase = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = ((1 to 40).map(i => (i.toLong, s"$phrase corpus tail $i")) ++
      (1 to 20).map(i => (100L + i,
        s"wholly different content number $i sharing nothing at all")))
      .toDF("doc_id", "text")
    val batch = Seq((1000L, s"$phrase corpus tail 7"),
      (1001L, "novel unrelated text with zero overlap anywhere here"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bandidx").toString
    Dedup.writeBandedSignatureIndex(sigs, "doc_id", dir, shards = 16)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val direct = Dedup.minhashNearDupsAgainst(batch, sigs,
      "doc_id", "text").collect().map(key).toSet
    assert(direct.nonEmpty, "fixture sanity: the echoed doc must collide")
    val served = Dedup.minhashNearDupsAgainstBandedIndex(batch, dir,
      "doc_id", "text").collect().map(key).toSet
    assert(served == direct,
      s"banded-postings probe must equal the flat probe: " +
        s"$served vs $direct")
    // the manifest prune must actually skip shards for a narrow probe:
    // one batch doc brings <= numBands points; with 16 range shards
    // over 60 docs x 4 bands of postings, most files have no match
    val oneDoc = Dedup.minhashSignatures(
        batch.filter(col("doc_id") === 1000L), "doc_id", "text")
      .select(posexplode(graft.functions.ProbeFunctions.minhashBands(
        array((0 until 12).map(i => col(s"sig_$i")): _*), 12, 3))
        .as(Seq("band_no", "bk")))
      .select(graft.functions.StableHash.hash60(
        concat_ws("_", col("band_no"), col("bk"))).as("bh"))
      .collect().map(_.getLong(0)).toIndexedSeq
    val total = graft.sink.Sinks
      .rangeManifest(spark, s"$dir/postings").size
    val kept = graft.sink.Sinks
      .rangePointFiles(spark, s"$dir/postings", oneDoc).size
    assert(kept < total,
      s"a 4-point probe must prune shards: kept $kept of $total")
    // point-list contract (r15): a batch whose distinct band keys
    // exceed maxPoints must fall back to the flat postings scan —
    // output-identical, no unbounded driver collect
    val capped = Dedup.minhashNearDupsAgainstBandedIndex(batch, dir,
      "doc_id", "text", maxPoints = 1).collect().map(key).toSet
    assert(capped == direct,
      s"over-cap probe must fall back oracle-identically: " +
        s"$capped vs $direct")
  }

  test("indexShuffleFindings flags a both-sides shuffle join that a " +
      "broadcast join elsewhere used to mask") {
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    val dim = Seq((1L, "d")).toDF("k", "vd")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // planted: a sort-merge join shuffling BOTH sides, plus a hinted
      // broadcast join in the SAME plan. The pre-r15 whole-plan string
      // check (`!plan.contains("BroadcastHashJoin")`) was masked by the
      // broadcast and reported nothing — the r14 verdict's finding.
      val planted = a.join(b, "k").join(broadcast(dim), "k")
      val plan = planted.queryExecution.executedPlan
      assert(plan.toString.contains("BroadcastHashJoin"),
        s"fixture must carry the masking broadcast join:\n$plan")
      val findings = Dedup.indexShuffleFindings(plan)
      assert(findings.nonEmpty,
        s"the both-sides shuffle join must be flagged despite the " +
          s"broadcast elsewhere:\n$plan")
      // healthy broadcast probe: nothing to flag
      val healthy = a.join(broadcast(b), "k")
      assert(Dedup.indexShuffleFindings(
          healthy.queryExecution.executedPlan).isEmpty,
        "a broadcast probe plan must stay clean")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("published Jaccard index round-trips and serves the probe") {
    val phrase = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = ((1 to 30).map(i => (i.toLong, s"$phrase corpus tail $i")) ++
      (1 to 10).map(i => (100L + i,
        s"totally different words over here number $i with nothing shared")))
      .toDF("doc_id", "text")
    val batch = Seq((1000L, s"$phrase corpus tail 7"),
      (1001L, "novel unrelated content nothing in common whatsoever here"))
      .toDF("doc_id", "text")
    val idx = Dedup.buildJaccardIndex(corpus, "doc_id", "text",
      k = 3, threshold = 0.5)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val direct = Dedup.ngramJaccardAgainst(batch, idx, "doc_id", "text")
      .collect().map(key).toSet
    assert(direct.nonEmpty, "fixture sanity: the echoed doc must match")
    val dir = java.nio.file.Files.createTempDirectory("jacidx").toString
    Dedup.writeJaccardIndex(idx, dir, bloomK = 5, bloomM = 1 << 14)
    val restored = Dedup.readJaccardIndex(spark, dir)
    assert(restored.k == 3 && restored.threshold == 0.5 &&
      restored.bloom.exists(_._2 == 5),
      "parameters must travel with the index")
    val served = Dedup.ngramJaccardAgainst(batch, restored,
      "doc_id", "text").collect().map(key).toSet
    assert(served == direct,
      "probe through the published index (with its Bloom prefilter) " +
        s"must equal the direct probe: $served vs $direct")
    // the path-served probe prunes dfreq/prefix shard files by the
    // batch's gram hashes and must still be output-identical
    val pathServed = Dedup.ngramJaccardAgainstPath(batch, dir,
      "doc_id", "text").collect().map(key).toSet
    assert(pathServed == direct,
      s"manifest-pruned probe must equal the direct probe: " +
        s"$pathServed vs $direct")
    // and the prune must actually skip files for the narrow batch
    val gs = Dedup.buildJaccardIndex(batch, "doc_id", "text",
        k = 3, threshold = 0.5)
      .sets.select(explode(col("gs")).as("g")).distinct()
      .collect().map(_.getLong(0)).toIndexedSeq
    val total = graft.sink.Sinks.rangeManifest(spark, s"$dir/prefix").size
    val kept = graft.sink.Sinks
      .rangePointFiles(spark, s"$dir/prefix", gs).size
    assert(kept < total,
      s"the batch's grams must prune prefix shards: kept $kept of $total")
    // r15: the stored sets publish range-sorted by doc id, so the
    // exact verification fetches only candidate ids' shards — and a
    // single candidate id must prune set shards
    assert(graft.sink.Sinks.hasRangeManifest(spark, s"$dir/sets"),
      "integral-id sets must publish with a range manifest")
    val stotal = graft.sink.Sinks.rangeManifest(spark, s"$dir/sets").size
    val skept = graft.sink.Sinks
      .rangePointFiles(spark, s"$dir/sets", Seq(1L)).size
    assert(skept < stotal,
      s"one candidate id must prune set shards: kept $skept of $stotal")
    // point-list contract (r15): over-cap batches fall back to the
    // flat scans of the same files, output-identical
    val capped = Dedup.ngramJaccardAgainstPath(batch, dir,
      "doc_id", "text", maxPoints = 1).collect().map(key).toSet
    assert(capped == direct,
      s"over-cap probe must fall back oracle-identically: " +
        s"$capped vs $direct")
  }

  test("jaccard viral-gram guard answers over-cap grams with the hub") {
    // the AllPairs worst case: every corpus doc shares the SAME gram
    // set, so each "rare" prefix gram carries a corpus-scale posting
    // list and the candidate join is quadratic. The guard answers
    // over-cap grams with their min-id hub posting only.
    val viral = "same viral boilerplate mirrored verbatim across every " +
      "single host in the farm with nothing changed at all anywhere"
    val corpus = (1L to 200L).map(i => (i, viral)).toDF("doc_id", "text")
    val batch = Seq((1000L, viral)).toDF("doc_id", "text")
    val idx = Dedup.buildJaccardIndex(corpus, "doc_id", "text",
      k = 3, threshold = 0.8)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val exact = Dedup.ngramJaccardAgainst(batch, idx, "doc_id", "text")
      .collect().map(key).toSet
    assert(exact.size == 200, s"uncapped default stays exact: $exact")
    val guarded = Dedup.ngramJaccardAgainst(batch, idx, "doc_id",
        "text", maxGramPostings = 10)
      .collect().map(key).toSet
    assert(guarded == Set((1000L, 1L)),
      s"over-cap grams must answer with the min-id hub only, " +
        s"exactly verified: $guarded")
    assert(guarded.subsetOf(exact), "the guard may only drop pairs")
  }

  test("path-served probes accept non-long integral ids (r16: the " +
      "driver point-list collect casts before getLong)") {
    // writeRangeSorted accepts any integral id; the id-pruned
    // verification fetch collects candidate ids on the driver and
    // previously did Row.getLong on the raw column — an INT id made
    // it throw ClassCastException at probe time.
    val vecs = ((1 to 20).map(i => (i, Seq(1.0f + i * 0.001f, 0.5f))) ++
      (21 to 30).map(i => (i, Seq(-1.0f, 0.2f + i * 0.01f))))
      .toDF("vec_id", "embedding") // Int ids, not Long
    val batch = Seq((1000, Seq(1.0f, 0.5f))).toDF("vec_id", "embedding")
    val idx = Dedup.buildEmbeddingIndex(vecs, "vec_id", "embedding",
      numPlanes = 8, bandBits = 4)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
    val direct = Dedup.embeddingNearDupsAgainst(batch, vecs, idx,
      "vec_id", "embedding", threshold = 0.95).collect().map(key).toSet
    assert(direct.nonEmpty, "fixture sanity: the near-dup must hit")
    val bdir = java.nio.file.Files
      .createTempDirectory("embband-int").toString
    Dedup.writeBandedEmbeddingIndex(idx, bdir, shards = 8)
    Dedup.writeIndexVectors(vecs, bdir, "vec_id", "embedding",
      shards = 8)
    val idPruned = Dedup.embeddingNearDupsAgainstBandedIndexOpt(batch,
      None, bdir, "vec_id", "embedding", 0.95,
      Dedup.DefaultMaxProbePoints, None).collect().map(key).toSet
    assert(idPruned == direct,
      s"int-id id-pruned probe must equal direct: $idPruned vs $direct")
    // the Jaccard path probe's set fetch shares the same collect
    val phrase = "alpha beta gamma delta epsilon zeta eta theta iota"
    val corpus = (1 to 20).map(i => (i, s"$phrase tail $i"))
      .toDF("doc_id", "text") // Int ids
    val jbatch = Seq((1000, s"$phrase tail 7")).toDF("doc_id", "text")
    val jidx = Dedup.buildJaccardIndex(corpus, "doc_id", "text",
      k = 3, threshold = 0.5)
    val jdirect = Dedup.ngramJaccardAgainst(jbatch, jidx, "doc_id",
      "text").collect().map(key).toSet
    val jdir = java.nio.file.Files
      .createTempDirectory("jacidx-int").toString
    Dedup.writeJaccardIndex(jidx, jdir, bloomK = 5, bloomM = 1 << 14)
    val jpath = Dedup.ngramJaccardAgainstPath(jbatch, jdir, "doc_id",
      "text").collect().map(key).toSet
    assert(jpath == jdirect && jdirect.nonEmpty,
      s"int-id path probe must equal direct: $jpath vs $jdirect")
  }

  test("published embedding index round-trips and serves the probe") {
    val vecs = ((1L to 20L).map(i =>
      (i, Seq(1.0f + i * 0.001f, 0.5f, 0.25f))) ++
      (21L to 30L).map(i => (i, Seq(-1.0f, 0.2f + i * 0.01f, 0.9f))))
      .toDF("vec_id", "embedding")
    val batch = Seq((1000L, Seq(1.0f, 0.5f, 0.25f)),
      (1001L, Seq(0.0f, -1.0f, 0.4f))).toDF("vec_id", "embedding")
    val idx = Dedup.buildEmbeddingIndex(vecs, "vec_id", "embedding",
      numPlanes = 8, bandBits = 4)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val direct = Dedup.embeddingNearDupsAgainst(batch, vecs, idx,
      "vec_id", "embedding", threshold = 0.95).collect().map(key).toSet
    assert(direct.nonEmpty, "fixture sanity: the near-dup vector must hit")
    val dir = java.nio.file.Files.createTempDirectory("embidx").toString
    Dedup.writeEmbeddingIndex(idx, dir, bloomK = 5, bloomM = 1 << 14)
    val restored = Dedup.readEmbeddingIndex(spark, dir)
    assert(restored.numPlanes == 8 && restored.bandBits == 4 &&
      restored.bloom.exists(_._2 == 5),
      "parameters must travel with the index")
    val served = Dedup.embeddingNearDupsAgainst(batch, vecs, restored,
      "vec_id", "embedding", threshold = 0.95).collect().map(key).toSet
    assert(served == direct,
      "probe through the published index (with its band-key Bloom) " +
        s"must equal the direct probe: $served vs $direct")
    // banded-postings twin: manifest-pruned candidate read, identical
    // output; a single batch vector's <= numBands points must prune
    val bdir = java.nio.file.Files.createTempDirectory("embband").toString
    Dedup.writeBandedEmbeddingIndex(idx, bdir, shards = 16)
    val banded = Dedup.embeddingNearDupsAgainstBandedIndex(batch, vecs,
      bdir, "vec_id", "embedding", threshold = 0.95)
      .collect().map(key).toSet
    assert(banded == direct,
      s"banded-postings probe must equal the direct probe: " +
        s"$banded vs $direct")
    // r15: with the corpus vector table published beside the index,
    // exact-cosine verification reads only candidate ids' shards —
    // output must not change, and a single id must prune shards
    Dedup.writeIndexVectors(vecs, bdir, "vec_id", "embedding",
      shards = 16)
    val idPruned = Dedup.embeddingNearDupsAgainstBandedIndex(batch,
      // poisoned corpusEmb: with vectors published the probe must NOT
      // touch this frame — wrong answers here prove the path taken
      vecs.withColumn("embedding",
        array(lit(0.0f), lit(0.0f), lit(0.0f))),
      bdir, "vec_id", "embedding", threshold = 0.95)
      .collect().map(key).toSet
    assert(idPruned == direct,
      s"id-pruned verification must equal the direct probe (and must " +
        s"source vectors from the published layout): $idPruned vs $direct")
    val vtotal = graft.sink.Sinks
      .rangeManifest(spark, s"$bdir/vectors").size
    val vkept = graft.sink.Sinks
      .rangePointFiles(spark, s"$bdir/vectors", Seq(1L)).size
    assert(vkept < vtotal,
      s"one candidate id must prune vector shards: kept $vkept of $vtotal")
    // point-list contract (r15): over-cap batches fall back to flat
    // scans of the published postings AND vectors, output-identical
    val capped = Dedup.embeddingNearDupsAgainstBandedIndex(batch,
      vecs.withColumn("embedding",
        array(lit(0.0f), lit(0.0f), lit(0.0f))),
      bdir, "vec_id", "embedding", threshold = 0.95, maxPoints = 1)
      .collect().map(key).toSet
    assert(capped == direct,
      s"over-cap probe must fall back oracle-identically: " +
        s"$capped vs $direct")
  }

  test("simhashNearDupsAgainst equals the all-pairs cross-section") {
    val base = "the quick brown fox jumps over the lazy dog near the " +
      "river bank while birds sing in tall green trees every morning"
    // doc pairs (i, 1000+i) share text => near-identical fingerprints;
    // unrelated docs use disjoint word sets
    val docs = ((1 to 10).map(i => (i.toLong, s"$base variant $i")) ++
      (1 to 10).map(i => (1000L + i, s"$base variant $i")) ++
      (1 to 10).map(i => (2000L + i,
        s"zug wort nummer $i anders inhalt ganz verschieden hier")))
      .toDF("doc_id", "text")
    val isBatch = (id: Long) => id >= 1000L && id < 2000L
    val corpus = docs.filter(!col("doc_id").between(1000L, 1999L))
    val batch = docs.filter(col("doc_id").between(1000L, 1999L))
    val against = Dedup.simhashNearDupsAgainst(batch,
        Dedup.simhash(corpus, "doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: full all-pairs run, restricted to one-from-each pairs
    val full = Dedup.simhashNearDups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect {
        case (a, b) if isBatch(a) && !isBatch(b) => (a, b)
        case (a, b) if isBatch(b) && !isBatch(a) => (b, a)
      }.toSet
    assert(against == full && against.nonEmpty,
      s"incremental probe must equal the cross-section: $against vs $full")
  }

  test("wide Hamming bands keep the pigeonhole guarantee (band knob)") {
    // 64-bit fingerprints; maxHamming=3 <= nBands-1 for BOTH 8-bit
    // (8 bands) and 16-bit (4 bands) configurations, so each catches
    // every ham<=3 pair with certainty — the verified sets must be
    // IDENTICAL while the 16-bit buckets are 256x more selective
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra"
    val docs = ((1 to 12).map(i => (i.toLong, s"$base tail $i")) ++
      (1 to 12).map(i => (100L + i, s"$base tail $i")) ++
      (1 to 6).map(i => (200L + i, s"wholly different words $i here")))
      .toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 100L ||
      col("doc_id") >= 200L)
    val batch = docs.filter(col("doc_id").between(100L, 199L))
    val fps = Dedup.simhash(corpus, "doc_id", "text", bits = 64)
    def probe(bandBits: Int) =
      Dedup.hammingNearDupsAgainst(
        Dedup.simhash(batch, "doc_id", "text", bits = 64), fps,
        "doc_id", "simhash", bits = 64, maxHamming = 3,
        bandBits = bandBits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = probe(8)
    val wide = probe(16)
    assert(wide == narrow && wide.nonEmpty,
      s"band width must not change the ham<=3 result: $wide vs $narrow")
  }

  test("hamming probe viral-bucket guard answers with the cluster hub") {
    // 50 corpus docs with IDENTICAL text -> identical fingerprints, one
    // mega-cluster; 3 distinct docs form small clusters
    val viral = "same exact content repeated across the whole mirror " +
      "farm again and again for every single crawled copy we fetched"
    val docs = ((1 to 50).map(i => (i.toLong, viral)) ++
      Seq((200L, "unique little document alpha beta gamma delta"),
        (201L, "unique little document alpha beta gamma delta"),
        (300L, "completely different other text here now")))
      .toDF("doc_id", "text")
    val fps = Dedup.simhash(docs, "doc_id", "text")
    val batch = Seq((1000L, viral),
      (1001L, "unique little document alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = Dedup.hammingNearDupsAgainst(
        Dedup.simhash(batch, "doc_id", "text"), fps,
        "doc_id", "simhash", maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the viral batch doc maps ONLY to the cluster hub (min id = 1);
    // the small-cluster doc keeps its full answers (ids 200, 201)
    assert(out((1000L, 1L)), s"hub pair missing: $out")
    assert(!out.exists { case (n, c) => n == 1000L && c > 1L && c <= 50L },
      s"capped cluster must answer with the hub only: $out")
    assert(out((1001L, 200L)) && out((1001L, 201L)),
      s"small clusters must keep full answers: $out")
  }

  test("minhash probe viral-bucket guard answers with the cluster hub") {
    // probe-flavor parity with the hamming guard: 50 identical corpus
    // docs share every LSH band; the guarded probe answers with the
    // MIN-id hub only, small clusters answer in full, and an under-cap
    // maxBucket is output-identical to the unguarded default
    val viral = "same exact content repeated across the whole mirror " +
      "farm again and again for every single crawled copy we fetched"
    val docs = ((1 to 50).map(i => (i.toLong, viral)) ++
      Seq((200L, "unique little document alpha beta gamma delta"),
        (201L, "unique little document alpha beta gamma delta"),
        (300L, "completely different other text here now")))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val batch = Seq((1000L, viral),
      (1001L, "unique little document alpha beta gamma delta"))
      .toDF("doc_id", "text")
    def probe(cap: Int) =
      Dedup.minhashNearDupsAgainst(batch, sigs, "doc_id", "text",
          maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = probe(10)
    assert(out((1000L, 1L)), s"hub pair missing: $out")
    assert(!out.exists { case (n, c) => n == 1000L && c > 1L && c <= 50L },
      s"capped cluster must answer with the hub only: $out")
    assert(out((1001L, 200L)) && out((1001L, 201L)),
      s"small clusters must keep full answers: $out")
    // under-cap guard is a no-op: identical to the unguarded probe
    val unguarded = Dedup.minhashNearDupsAgainst(batch, sigs,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(1000) == unguarded,
      "an under-cap maxBucket must not change the output")
  }

  test("embedding probe viral-bucket guard answers with the cluster hub") {
    // 50 identical corpus vectors collapse into one hyperplane-sig
    // bucket; the distinct pair (+ one decoy) signs into its own
    // under-cap bucket. Guarded probe: viral batch vector answers with
    // the min-id hub only; the pair answers in full.
    val viral = Seq(1.0f, 0.5f, 0.25f)
    val other = Seq(-1.0f, 0.2f, 0.9f)
    val vecs = ((1L to 50L).map(i => (i, viral)) ++
      Seq((200L, other), (201L, other), (300L, Seq(-0.5f, -1.0f, 0.3f))))
      .toDF("vec_id", "embedding")
    val idx = Dedup.buildEmbeddingIndex(vecs, "vec_id", "embedding",
      numPlanes = 8, bandBits = 4)
    val batch = Seq((1000L, viral), (1001L, other))
      .toDF("vec_id", "embedding")
    def probe(cap: Int) =
      Dedup.embeddingNearDupsAgainst(batch, vecs, idx, "vec_id",
          "embedding", threshold = 0.95, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = probe(10)
    assert(out((1000L, 1L)), s"hub pair missing: $out")
    assert(!out.exists { case (n, c) => n == 1000L && c > 1L && c <= 50L },
      s"capped cluster must answer with the hub only: $out")
    assert(out((1001L, 200L)) && out((1001L, 201L)),
      s"small clusters must keep full answers: $out")
    val unguarded = Dedup.embeddingNearDupsAgainst(batch, vecs, idx,
        "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(1000) == unguarded,
      "an under-cap maxBucket must not change the output")
  }

  test("exactAgainst warns when an unbucketed index re-shuffles per batch") {
    val corpus = (1 to 50).map(i => (i.toLong, s"doc $i"))
      .toDF("doc_id", "text")
    val batch = Seq((99L, "doc 1")).toDF("doc_id", "text")
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try Dedup.exactAgainst(batch, Dedup.exact(corpus, "doc_id", "text"),
      "doc_id", "text")
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      System.setErr(old)
    }
    assert(buf.toString("UTF-8").contains("re-shuffle per batch"),
      s"expected index-shuffle warning, got: ${buf.toString("UTF-8")}")
  }

  test("overlapMatrix rolls near-dup pairs up to unordered group pairs") {
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L), (2L, 6L))
      .toDF("id_a", "id_b")
    val docs = Seq((1L, "sA"), (2L, "sB"), (3L, "sA"), (4L, "sC"),
      (5L, "sC"), (6L, "sA")).toDF("doc_id", "source")
    val m = Dedup.overlapMatrix(pairs, docs, "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // (1,2)=(A,B), (1,3)=(A,A), (4,5)=(C,C), (2,6)=(B,A)->(A,B)
    assert(m == Map(("sA", "sB") -> 2L, ("sA", "sA") -> 1L,
      ("sC", "sC") -> 1L))
  }

  test("importanceWeights: target-like docs score higher, exact ratios") {
    // corpus vocabulary: "aa" only in target docs, "zz" only elsewhere,
    // "mm" shared everywhere
    val docs = Seq(
      (1L, "aa mm", true), (2L, "aa aa", true),
      (3L, "zz mm", false), (4L, "zz zz mm", false))
      .toDF("doc_id", "text", "is_t")
    val out = TextAnalysis.importanceWeights(docs, "doc_id", "text",
      col("is_t"), scale = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // counts: aa r=3 t=3 (contrib 100); mm r=3 t=1 (33); zz r=3 t=0 (0)
    assert(out(1L) == ((2L, 133L)))
    assert(out(2L) == ((2L, 200L)))
    assert(out(3L) == ((2L, 33L)))
    assert(out(4L) == ((3L, 33L)))
  }

  test("snapshotDiff: statuses + carry; text pruned before the join") {
    import spark.implicits._
    val oldSnap = Seq((1L, "same", "a"), (2L, "before", "a"),
      (3L, "gone", "b")).toDF("doc_id", "text", "source")
    val newSnap = Seq((1L, "same", "a"), (2L, "after!", "a"),
      (4L, "fresh", "b")).toDF("doc_id", "text", "source")
    val diff = CorpusDiff.snapshotDiff(oldSnap, newSnap, "doc_id", "text",
      carry = Seq("source"))
    val r = diff.collect().map(x => x.getLong(0) ->
      ((x.getString(1), Option(x.get(2)), Option(x.get(3)),
        x.getString(4)))).toMap
    assert(r(1L) == (("unchanged", Some(4L), Some(4L), "a")))
    assert(r(2L) == (("changed", Some(6L), Some(6L), "a")))
    assert(r(3L) == (("removed", Some(4L), None, "b")))
    assert(r(4L) == (("added", None, Some(5L), "b")))
    // 100 TB contract: only (key, hash, len, carry) reach the full-outer
    // join — the text column is projected away below it on both sides
    val joins = diff.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val names = (j.left.output ++ j.right.output).map(_.name)
      assert(!names.contains("text"),
        s"text must not ride the diff shuffle: $names")
    }
    val summary = CorpusDiff.diffSummary(diff, "source").collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    assert(summary(("removed", "b")) == ((1L, -4L)))
    assert(summary(("added", "b")) == ((1L, 5L)))
    assert(summary(("changed", "a")) == ((1L, 0L)))
  }

  test("Pca: exact integer moments, eigen recovery, no-exchange project") {
    import spark.implicits._
    // corpus with dominant variance along (1,1,0,0)/√2 and a weaker
    // orthogonal mode along (0,0,1,-1)/√2. max|x| = 127 makes the global
    // scale exactly 1.0 (lossless integer quantization); b = |t| % 3 is
    // an even function of t, so the a-b cross moment is exactly 0 and
    // the two eigenmodes stay orthogonal
    val rows = (-127 to 127).map { t =>
      val a = t.toFloat
      val b = (math.abs(t) % 3).toFloat
      (t.toLong, Array(a, a, b, -b))
    }
    val df = rows.toDF("vec_id", "embedding")
    val moments = Pca.momentRows(df, "embedding", 4).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(moments((-1, -1)) == 255L)
    // Σt over -127..127 = 0; Σt² = 2*(127*128*255)/6 = 1,381,760
    assert(moments((0, -1)) == 0L)
    assert(moments((0, 0)) == 1381760L)
    assert(moments((0, 1)) == 1381760L)
    assert(moments((0, 2)) == 0L)
    assert(moments((2, 3)) == -moments((2, 2)))
    val (stats, gscale) = Pca.gramStats(df, "embedding", 4)
    assert(gscale == 1.0)
    val cov = Pca.covariance(stats, gscale, 4)
    val (vals, vecs) = Pca.topComponents(cov, 2)
    assert(vals(0) > vals(1) && vals(1) > 0.0)
    // top component aligns with (1,1,0,0)/√2 up to sign
    val align0 = math.abs((vecs(0)(0) + vecs(0)(1)) / math.sqrt(2.0))
    assert(align0 > 0.999, vecs(0).mkString(","))
    val align1 = math.abs((vecs(1)(2) - vecs(1)(3)) / math.sqrt(2.0))
    assert(align1 > 0.999, vecs(1).mkString(","))
    // projection is a pure scan: no exchange in the plan
    val proj = df.select(col("vec_id"),
      Pca.projectCol(col("embedding"), vecs).as("pc"))
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"PCA projection must be a zero-exchange scan:\n$plan")
    val p = proj.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    // vec (126,126,0,0) projects to ±126√2 on pc0 and ~0 on pc1
    assert(math.abs(math.abs(p(126L)(0)) - 126.0 * math.sqrt(2.0)) < 0.1)
    assert(math.abs(p(126L)(1)) < 0.1)
    // whitening: each component's norm² becomes 1/λ (unit variance
    // after projection); a zero eigenvalue keeps its direction unscaled
    val white = Pca.whitenedComponents(vals, vecs)
    assert(math.abs(white(0).map(x => x * x).sum - 1.0 / vals(0)) < 1e-12)
    val z = Pca.whitenedComponents(Array(0.0), Array(Array(0.5, 0.5)))
    assert(z(0).toSeq == Seq(0.5, 0.5))
  }

  test("topComponents escapes a basis-start fixed point") {
    // block-diagonal with exact zeros: largest diagonal (5, index 0) is
    // NOT on the dominant eigenpair (λ=7, v=(0,1,1)/√2) and A·e0 = 5·e0
    // is a fixed point — a single basis start would return [5, 7]
    val a = Array(
      Array(5.0, 0.0, 0.0),
      Array(0.0, 4.0, 3.0),
      Array(0.0, 3.0, 4.0))
    val (vals, vecs) = Pca.topComponents(a, 2)
    assert(math.abs(vals(0) - 7.0) < 1e-9, vals.mkString(","))
    assert(math.abs(vals(1) - 5.0) < 1e-9, vals.mkString(","))
    assert(math.abs((vecs(0)(1) + vecs(0)(2)) / math.sqrt(2.0)) > 0.999)
  }

  test("snapshotDiff: null text and null key classify safely") {
    import spark.implicits._
    val oldSnap = Seq((java.lang.Long.valueOf(1L), null: String),
      (java.lang.Long.valueOf(2L), "kept"),
      (null: java.lang.Long, "null-key old"))
      .toDF("doc_id", "text")
    val newSnap = Seq((java.lang.Long.valueOf(1L), "filled in"),
      (java.lang.Long.valueOf(2L), "kept"))
      .toDF("doc_id", "text")
    val r = CorpusDiff.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect()
      .map(x => Option(x.get(0)) -> x.getString(1)).toMap
    // old text NULL, new text present -> changed (null-safe compare)
    assert(r(Some(1L)) == "changed", r.toString)
    assert(r(Some(2L)) == "unchanged")
    // a null-KEY old row is a removed old doc, never 'added'
    assert(r(None) == "removed", r.toString)
  }

  test("correlationMatrix: nulls yield NULL corr, not a wrong value") {
    import spark.implicits._
    val df = Seq((Some(1.0), 2.0, 1.0), (Some(2.0), 4.0, 2.0),
      (None, 6.0, 3.0)).toDF("x", "y", "z")
    val r = Profiling.correlationMatrix(df, Seq("x", "y", "z"))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        Option(x.get(2))).toMap
    assert(r(("x", "y")).isEmpty, "nullable pair must yield NULL corr")
    assert(r(("x", "z")).isEmpty)
    // the non-null pair is linear: y = 2z -> corr 1.0 (up to the final
    // fixed-order double combination)
    val yz = r(("y", "z"))
    assert(yz.exists(v =>
      math.abs(v.asInstanceOf[Double] - 1.0) < 1e-12), r.toString)
  }

  test("pcaPrefilterTopK: lossless on subspace data, matches brute force") {
    import spark.implicits._
    // all vectors live in span{(1,1,0,0), (0,0,1,-1)} with pairwise
    // distinct directions — projection onto the 2 principal components
    // preserves cosines, so the prefiltered search must reproduce the
    // exact brute-force ranking
    val dirs = Seq((1, 1), (2, 1), (3, 1), (1, 2), (3, 2), (1, 3),
      (2, 3), (5, 1), (1, 5), (4, 3), (3, 4), (5, 4))
    val corpus = dirs.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, Array(a.toFloat, a.toFloat, b.toFloat, -b.toFloat))
    }.toDF("vec_id", "embedding")
    val (stats, gscale) = Pca.gramStats(corpus, "embedding", 4)
    val (_, comps) = Pca.topComponents(
      Pca.covariance(stats, gscale, 4), 2)
    val queries = corpus.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 3).collect().toSet
    val pre = Similarity.pcaPrefilterTopK(corpus, queries,
      "vec_id", "embedding", comps, m = 6, k = 3).collect().toSet
    assert(pre == exact,
      s"prefilter must be lossless on subspace data:\n$pre\nvs\n$exact")
    val audit = Similarity.recallAudit(
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 3),
      Similarity.pcaPrefilterTopK(corpus, queries, "vec_id", "embedding",
        comps, 6, 3))
      .collect().map(_.getAs[Double]("recall"))
    assert(audit.forall(_ == 1.0))
  }

  test("pq: encode/lut/adc agree with hand math (cosine space)") {
    import graft.functions.PqOps
    // dim 4, m 2 subspaces of 2. Codebook {zeros, ones}: ones normalizes
    // to (.5,.5,.5,.5); zeros stays (zero-norm guard)
    val cb = PqOps.PqCodebook(2, 2,
      Array(Array(0.0, 0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0, 1.0)))
    val df = Seq((1L, Seq(0.9f, 0.9f, 0.1f, 0.1f)),
      (2L, Seq(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val enc = df.select($"vec_id",
      PqOps.encode($"embedding", cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // vec 1 normalizes to ~(.70,.70,.08,.08): front half nearer the
    // normalized ones, back half nearer zeros
    assert(enc(1L) == Seq(1, 0))
    // vec 2 IS the normalized ones -> exact match on both subspaces
    assert(enc(2L) == Seq(1, 1))
    val lut = df.filter($"vec_id" === 2L)
      .select(PqOps.lut($"embedding", cb)).collect()(0).getSeq[Double](0)
    // lut(j*ksub + r): dist²((.5,.5), zeros)=0.5, vs normalized ones=0
    assert(lut == Seq(0.5, 0.0, 0.5, 0.0))
    val adc = df.filter($"vec_id" === 2L)
      .select(PqOps.adc(
        typedLit(Seq(1, 0)), PqOps.lut($"embedding", cb), cb))
      .collect()(0).getDouble(0)
    assert(adc == 0.5) // 0.0 + 0.5
  }

  test("pqEncode is a zero-exchange whole-stage-codegen projection") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = Similarity.pqTrainSampled(emb, "vec_id", "embedding", 32, 32)
    val out = Similarity.pqEncode(emb, cb, "vec_id", "embedding")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).nonEmpty,
      s"PQ encode fell out of whole-stage codegen:\n$plan")
  }

  test("ivf+pq probing every cluster equals brute-force pq ranking") {
    import graft.functions.PqOps
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = Similarity.pqTrainSampled(emb, "vec_id", "embedding", 32, 32)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.pqTopK(
      Similarity.pqEncode(emb, cb, "vec_id", "embedding"), cb,
      queries, "vec_id", "embedding", 5).collect().toSet
    val centroids = Similarity.seedCentroids(emb, "vec_id", "embedding",
      every = 100)
    val assignedCodes = Similarity
      .ivfAssign(emb, centroids, "vec_id", "embedding")
      .select(col("vec_id"), col("cluster"),
        PqOps.encode(col("embedding"), cb).as("codes"))
    val viaIvf = Similarity.ivfTopKPq(assignedCodes, centroids, queries,
      cb, "vec_id", "embedding", k = 5, nprobe = 10000).collect().toSet
    assert(viaIvf == brute)
  }

  test("pq recall@10 clears a stated floor on the fixture") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = Similarity.pqTrainSampled(emb, "vec_id", "embedding", 32, 32)
    val queries = emb.filter(col("vec_id") < 20)
    val recall = Similarity.recallAudit(
        Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10),
        Similarity.pqTopK(
          Similarity.pqEncode(emb, cb, "vec_id", "embedding"), cb,
          queries, "vec_id", "embedding", 10))
      .agg(avg(col("recall"))).collect()(0).getDouble(0)
    // 32x32 codes over dim 64: measured ~0.55 on this fixture; the floor
    // states the contract (and catches sign/indexing/normalization
    // regressions, which crater recall toward chance: k/N ≈ 0.02)
    assert(recall >= 0.4, s"mean PQ recall@10 = $recall")
  }

  test("banded-Hamming luck-range warn fires once per geometry, " +
      "never inside the certainty range") {
    import spark.implicits._
    val fps = Seq((1L, 7L), (2L, 7L)).toDF("id", "fp")
    def captured(f: => Unit): String = {
      val old = System.err
      val buf = new java.io.ByteArrayOutputStream()
      System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
      try f finally System.setErr(old)
      buf.toString("UTF-8")
    }
    // 2 x 32-bit bands, maxHamming 9 > bands-1 = 1: luck-range — warned,
    // and only on the FIRST call with this geometry
    val first = captured {
      graft.operators.Dedup.bandedHammingPairs(fps, "id", "fp",
        bits = 64, maxHamming = 9, bandBits = 32).count()
    }
    assert(first.contains("luck-range") && first.contains("hamming <= 1"),
      s"expected the recall-contract warn, got: $first")
    val second = captured {
      graft.operators.Dedup.bandedHammingPairs(fps, "id", "fp",
        bits = 64, maxHamming = 9, bandBits = 32).count()
    }
    assert(!second.contains("luck-range"),
      "the warn must fire once per geometry per JVM")
    // 64 x 1-bit bands, maxHamming 9 <= bands-1 = 63: full certainty —
    // silent
    val certain = captured {
      graft.operators.Dedup.bandedHammingPairs(fps, "id", "fp",
        bits = 64, maxHamming = 9, bandBits = 1).count()
    }
    assert(!certain.contains("luck-range"),
      s"certainty-range geometry must not warn: $certain")
  }
}
