package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** SQL function surface: runtime registration, build-time extension
  * injection, and SQL-vs-DataFrame parity (one implementation).
  */
class GraftFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("registered SQL scalars match the DataFrame implementations") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "The quick brown fox and the lazy dog"),
      (2L, "el que de la los una por y")).toDF("id", "text")
    df.createOrReplaceTempView("gfs_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_stable_hash60(text) AS h, graft_bucket(id) AS b,
        |  size(graft_word_shingles(text, 3)) AS ns,
        |  graft_lang_id(text) AS lang, graft_quality_score(text) AS q
        |FROM gfs_docs""".stripMargin)
    val viaDf = df.select(col("id"),
      StableHash.hash60(col("text")).as("h"),
      graft.operators.Sampling.bucket(col("id")).as("b"),
      size(TextShingles.wordShingles(col("text"), 3)).as("ns"),
      graft.operators.TextAnalysis.langId(col("text")).as("lang"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
    assert(viaSql.except(viaDf).isEmpty && viaDf.except(viaSql).isEmpty)
  }

  test("graft_bounded_topk in SQL matches BoundedTopK.topK") {
    GraftFunctions.register(spark)
    val df = (1L to 100L).map(i => (s"g${i % 4}", i, (i % 17).toDouble))
      .toDF("g", "id", "score")
    df.createOrReplaceTempView("gfs_topk")
    val viaSql = spark.sql(
      """SELECT g, graft_bounded_topk(score, id, 5) AS topk
        |FROM gfs_topk GROUP BY g""".stripMargin)
    val viaDf = df.groupBy(col("g"))
      .agg(BoundedTopK.topK(col("score"), col("id"), 5).as("topk"))
    assert(viaSql.except(viaDf).isEmpty && viaDf.except(viaSql).isEmpty)
  }

  test("graft_ahash in SQL matches AHash64") {
    GraftFunctions.register(spark)
    val payload = "some moderately long payload with byte variety 0123456789"
    val viaSql = spark.sql(
      s"SELECT graft_ahash(CAST('$payload' AS BINARY))").head().getLong(0)
    val viaDf = Seq(payload).toDF("t")
      .select(AHash64.aHash(col("t").cast("binary"))).head().getLong(0)
    assert(viaSql == viaDf && viaSql != 0L)
  }

  test("graft_token_count in SQL matches GreedyTokenCount") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_token_count('abcd xcdx zzz', array('abc','ab','cd','x'))")
      .head().getLong(0)
    assert(got == 8L) // abc+d, x+cd+x, z+z+z

    val e = intercept[Exception] {
      spark.sql("SELECT graft_token_count('a', array(1, 2))").collect()
    }
    assert(e.getMessage.contains("array<string>"), e.getMessage)
  }

  test("graft_gram in SQL matches GramAgg / Pca.momentRows layout") {
    GraftFunctions.register(spark)
    val df = Seq(Array(1, 2), Array(3, 4), Array(-1, 0))
      .toDF("q")
    df.createOrReplaceTempView("gfs_codes")
    val viaSql = spark.sql(
      "SELECT graft_gram(q, 2) AS st FROM gfs_codes")
      .head().getSeq[Long](0)
    // layout [n, s0, s1, g00, g01, g11]
    assert(viaSql == Seq(3L, 3L, 6L, 11L, 14L, 20L))
    val viaDf = df.agg(GramAgg.gram(col("q"), 2).as("st"))
      .head().getSeq[Long](0)
    assert(viaSql == viaDf)
  }

  test("k arguments must be integer literals") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles('a b c', 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("graft_word_counts in SQL matches TextShingles.wordTermCounts") {
    val viaSql = spark.sql(
      "SELECT inline(graft_word_counts('b a b')) ")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == Seq(("a", 1L), ("b", 2L)))
  }

  // Slow (r21, 16s): every sql_*_probe_tvf registry row is hash-checked
  // against the oracle by the driver's verify on the same round; the
  // twin-parity assertion runs under SPARK_GRAFT_SLOW_TESTS=1
  test("probe TVFs match their DataFrame twins", graft.tags.SlowTag) {
    import graft.operators.Dedup
    GraftFunctions.register(spark)
    val phrase = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = (1L to 30L).map(i => (i, s"$phrase corpus tail $i"))
      .toDF("doc_id", "text")
    val batch = Seq((1000L, s"$phrase corpus tail 7"),
      (1001L, "novel unrelated content with nothing shared at all"))
      .toDF("doc_id", "text")
    batch.createOrReplaceTempView("gfs_probe_batch")
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val sdir = java.nio.file.Files.createTempDirectory("tvf-sig").toString
    Dedup.writeSignatureIndex(
      Dedup.minhashSignatures(corpus, "doc_id", "text"), sdir)
    val mhSql = spark.sql(s"SELECT * FROM graft_minhash_probe(" +
      s"'gfs_probe_batch', '$sdir', 'doc_id', 'text', 0.5)")
    val mhDf = Dedup.minhashNearDupsAgainstIndex(batch,
      Dedup.readSignatureIndex(spark, sdir), "doc_id", "text", 0.5)
    assert(keys(mhSql).nonEmpty && keys(mhSql) == keys(mhDf),
      "graft_minhash_probe must equal the DataFrame probe")

    val jdir = java.nio.file.Files.createTempDirectory("tvf-jac").toString
    Dedup.writeJaccardIndex(
      Dedup.buildJaccardIndex(corpus, "doc_id", "text", 3, 0.5), jdir)
    val jSql = spark.sql(s"SELECT * FROM graft_jaccard_probe(" +
      s"'gfs_probe_batch', '$jdir', 'doc_id', 'text')")
    val jDf = Dedup.ngramJaccardAgainst(batch,
      Dedup.readJaccardIndex(spark, jdir), "doc_id", "text")
    assert(keys(jSql).nonEmpty && keys(jSql) == keys(jDf),
      "graft_jaccard_probe must equal the DataFrame probe")

    val vecs = ((1L to 20L).map(i =>
      (i, Seq(1.0f + i * 0.001f, 0.5f, 0.25f))) ++
      (21L to 30L).map(i => (i, Seq(-1.0f, 0.2f + i * 0.01f, 0.9f))))
      .toDF("vec_id", "embedding")
    val vbatch = Seq((1000L, Seq(1.0f, 0.5f, 0.25f)),
      (1001L, Seq(0.0f, -1.0f, 0.4f))).toDF("vec_id", "embedding")
    vecs.createOrReplaceTempView("gfs_probe_corpus_vecs")
    vbatch.createOrReplaceTempView("gfs_probe_batch_vecs")
    val edir = java.nio.file.Files.createTempDirectory("tvf-emb").toString
    Dedup.writeEmbeddingIndex(Dedup.buildEmbeddingIndex(vecs, "vec_id",
      "embedding", numPlanes = 8, bandBits = 4), edir)
    val eSql = spark.sql(s"SELECT * FROM graft_embedding_probe(" +
      s"'gfs_probe_batch_vecs', 'gfs_probe_corpus_vecs', '$edir', " +
      s"'vec_id', 'embedding', 0.95)")
    val eDf = Dedup.embeddingNearDupsAgainst(vbatch, vecs,
      Dedup.readEmbeddingIndex(spark, edir), "vec_id", "embedding",
      threshold = 0.95)
    assert(keys(eSql).nonEmpty && keys(eSql) == keys(eDf),
      "graft_embedding_probe must equal the DataFrame probe")

    // the hamming family's "index" is the persisted fingerprint
    // TABLE, so both relation args are view names
    Dedup.simhash(corpus, "doc_id", "text", 32)
      .createOrReplaceTempView("gfs_probe_fps")
    val shSql = spark.sql(s"SELECT * FROM graft_simhash_probe(" +
      s"'gfs_probe_batch', 'gfs_probe_fps', 'doc_id', 'text', 32, 3)")
    val shDf = Dedup.simhashNearDupsAgainst(batch,
      Dedup.simhash(corpus, "doc_id", "text", 32), "doc_id", "text",
      32, 3)
    assert(keys(shSql).nonEmpty && keys(shSql) == keys(shDf),
      "graft_simhash_probe must equal the DataFrame probe")

    // TVFs compose inside larger SQL (CTE + aggregate over the TVF)
    val n = spark.sql(s"SELECT count(*) AS n FROM graft_minhash_probe(" +
      s"'gfs_probe_batch', '$sdir', 'doc_id', 'text', 0.5)")
      .head().getLong(0)
    assert(n == keys(mhDf).size.toLong)
    // parameters must be literals, loudly
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_minhash_probe(" +
        "'gfs_probe_batch', '/nope', 'doc_id', 'text', 0.5)").collect()
    }
    assert(err != null)
  }

  test("graft_jaccard_probe expands lazily: EXPLAIN launches zero " +
      "Spark jobs (r16)") {
    import graft.operators.Dedup
    GraftFunctions.register(spark)
    val phrase = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = (1L to 30L).map(i => (i, s"$phrase corpus tail $i"))
      .toDF("doc_id", "text")
    val batch = Seq((1000L, s"$phrase corpus tail 7"),
      (1001L, "novel unrelated content with nothing shared at all"))
      .toDF("doc_id", "text")
    batch.createOrReplaceTempView("gfs_lazy_batch")
    val dir = java.nio.file.Files
      .createTempDirectory("tvf-lazyjac").toString
    Dedup.writeJaccardIndex(
      Dedup.buildJaccardIndex(corpus, "doc_id", "text", 3, 0.5), dir)
    // count jobs NOT in the marker group; the marker job (run after
    // the EXPLAIN) flushes the ordered listener queue, so when it is
    // visible every job the EXPLAIN launched would be too. (AQE runs
    // one job per query stage, so the marker itself may be 2+ jobs —
    // hence the group filter rather than exact counting.)
    val explainJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val markerSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (grp == "gfs-lazyjac-marker") markerSeen.set(true)
        else {
          explainJobs.incrementAndGet()
          System.err.println(s"[lazyjac] unexpected job ${js.jobId}: " +
            js.stageInfos.map(_.name).mkString(" | "))
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val plan = spark.sql("EXPLAIN FORMATTED SELECT * FROM " +
          s"graft_jaccard_probe('gfs_lazy_batch', '$dir', 'doc_id', " +
          "'text')")
        .collect().map(_.getString(0)).mkString("\n")
      assert(plan.contains("Physical Plan"), plan.take(200))
      spark.sparkContext.setJobGroup("gfs-lazyjac-marker", "flush")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.currentTimeMillis + 30000
      while (!markerSeen.get && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(markerSeen.get, "marker job never reached the listener")
      assert(explainJobs.get == 0,
        s"EXPLAIN of graft_jaccard_probe must launch zero Spark jobs " +
          s"(saw ${explainJobs.get})")
    } finally spark.sparkContext.removeSparkListener(l)
    // and the lazy expansion still answers exactly like the eager
    // DataFrame probe when the query RUNS
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sqlK = keys(spark.sql("SELECT * FROM graft_jaccard_probe(" +
      s"'gfs_lazy_batch', '$dir', 'doc_id', 'text')"))
    val dfK = keys(Dedup.ngramJaccardAgainst(batch,
      Dedup.readJaccardIndex(spark, dir), "doc_id", "text"))
    assert(sqlK.nonEmpty && sqlK == dfK,
      s"lazy TVF must stay row-identical: $sqlK vs $dfK")
  }

  test("retrieval TVFs match their DataFrame twins (r16)") {
    import graft.operators.{Similarity, TextSearch}
    GraftFunctions.register(spark)
    val docs = ((1L to 20L).map(i =>
      (i, s"spark merge window doc $i with filler words number $i")) ++
      (21L to 30L).map(i => (i, s"unrelated prose entry $i")))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("gfs_ret_docs")
    val terms = Seq("spark", "merge", "window")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq

    val tsSql = spark.sql("SELECT * FROM graft_text_search(" +
      "'gfs_ret_docs', 'doc_id', 'text', 'spark,merge,window', 5)")
    val tsDf = TextSearch.searchTopK(docs, "doc_id", "text", terms, 5)
    assert(rows(tsSql).nonEmpty && rows(tsSql) == rows(tsDf),
      "graft_text_search must equal searchTopK")

    val bmSql = spark.sql("SELECT * FROM graft_bm25_search(" +
      "'gfs_ret_docs', 'doc_id', 'text', 'spark,merge,window', 5)")
    val bmDf = TextSearch.searchTopKBm25(docs, "doc_id", "text",
      terms, 5)
    assert(rows(bmSql).nonEmpty && rows(bmSql) == rows(bmDf),
      "graft_bm25_search must equal searchTopKBm25 (float scores " +
        "bit-identical)")

    val vecs = ((1L to 20L).map(i =>
      (i, Seq(1.0f + i * 0.001f, 0.5f, 0.25f))) ++
      (21L to 30L).map(i => (i, Seq(-1.0f, 0.2f + i * 0.01f, 0.9f))))
      .toDF("vec_id", "embedding")
    vecs.createOrReplaceTempView("gfs_ret_emb")
    vecs.filter(col("vec_id") <= 2L)
      .createOrReplaceTempView("gfs_ret_emb_q")
    val annSql = spark.sql("SELECT * FROM graft_ann_probe(" +
      "'gfs_ret_emb', 'gfs_ret_emb_q', 'vec_id', 'embedding', 4)")
    val annDf = Similarity.bruteForceTopK(vecs,
      vecs.filter(col("vec_id") <= 2L), "vec_id", "embedding", 4)
    assert(rows(annSql).nonEmpty &&
      rows(annSql).toSet == rows(annDf).toSet,
      "graft_ann_probe must equal bruteForceTopK")

    // index-served ANN TVF (r17): assigned/centroids views = the index
    val cents = Similarity.seedCentroidsK(vecs, "vec_id", "embedding", 3)
    val assigned = Similarity.ivfAssign(vecs, cents, "vec_id",
      "embedding")
    assigned.createOrReplaceTempView("gfs_ret_ivf_asg")
    cents.createOrReplaceTempView("gfs_ret_ivf_cent")
    val ivfSql = spark.sql("SELECT * FROM graft_ivf_probe(" +
      "'gfs_ret_ivf_asg', 'gfs_ret_ivf_cent', 'gfs_ret_emb_q', " +
      "'vec_id', 'embedding', 4, 2)")
    val ivfDf = Similarity.ivfTopK(assigned, cents,
      vecs.filter(col("vec_id") <= 2L), "vec_id", "embedding", 4, 2)
    assert(rows(ivfSql).nonEmpty &&
      rows(ivfSql).toSet == rows(ivfDf).toSet,
      "graft_ivf_probe must equal ivfTopK")
    // default nprobe (4) spelled and unspelled agree
    assert(rows(spark.sql("SELECT * FROM graft_ivf_probe(" +
        "'gfs_ret_ivf_asg', 'gfs_ret_ivf_cent', 'gfs_ret_emb_q', " +
        "'vec_id', 'embedding', 4)")).toSet ==
      rows(Similarity.ivfTopK(assigned, cents,
        vecs.filter(col("vec_id") <= 2L), "vec_id", "embedding",
        4, 4)).toSet,
      "graft_ivf_probe default nprobe must be 4")

    Similarity.rankTopK(tsDf.select(lit(1L).as("query_id"),
        col("doc_id").cast("long").as("neighbor_id"),
        col("score").cast("double").as("sim")), 5)
      .createOrReplaceTempView("gfs_ret_lex")
    annDf.filter(col("query_id") === 1L)
      .createOrReplaceTempView("gfs_ret_vec")
    val hySql = spark.sql("SELECT * FROM graft_hybrid_rrf(" +
      "'gfs_ret_lex', 'gfs_ret_vec', 5, 60)")
    val hyDf = Similarity.rrfFuse(Seq(
      spark.table("gfs_ret_lex"), spark.table("gfs_ret_vec")), 5, 60)
    assert(rows(hySql).nonEmpty && rows(hySql) == rows(hyDf),
      "graft_hybrid_rrf must equal rrfFuse")

    // a blank terms list fails loudly, not with an empty result
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_text_search(" +
        "'gfs_ret_docs', 'doc_id', 'text', ' , ,', 5)").collect()
    }
    assert(err.getMessage.contains("no non-blank terms") ||
      err.getCause != null)

    // index-SERVED retrieval TVFs (r16): the index/stats are views
    val idx = TextSearch.invertedIndex(docs, "doc_id", "text", 16)
    idx.createOrReplaceTempView("gfs_ret_idx")
    val isSql = spark.sql("SELECT * FROM graft_index_search(" +
      "'gfs_ret_idx', 'gfs_ret_docs', 'doc_id', 'text', " +
      s"'${terms.mkString(",")}', 5)")
    val isDf = TextSearch.searchTopKFromIndex(idx, docs, "doc_id",
      "text", terms, 5)
    assert(rows(isSql).nonEmpty && rows(isSql) == rows(isDf),
      "graft_index_search must equal searchTopKFromIndex")
    TextSearch.bm25CorpusStats(docs, "doc_id", "text")
      .createOrReplaceTempView("gfs_ret_stats")
    val ibSql = spark.sql("SELECT * FROM graft_index_bm25(" +
      "'gfs_ret_idx', 'gfs_ret_stats', 'gfs_ret_docs', 'doc_id', " +
      s"'text', '${terms.mkString(",")}', 5)")
    val ibDf = TextSearch.searchTopKBm25FromIndex(idx,
      TextSearch.bm25CorpusStats(docs, "doc_id", "text"), docs,
      "doc_id", "text", terms, 5)
    assert(rows(ibSql).nonEmpty && rows(ibSql) == rows(ibDf),
      "graft_index_bm25 must equal searchTopKBm25FromIndex " +
        "(float scores bit-identical)")
  }

  test("graft_curate runs lazy recipes from SQL, rejects eager " +
      "stages, and EXPLAIN launches zero jobs (r16)") {
    import graft.operators.Curation
    GraftFunctions.register(spark)
    val en = "the cat and the dog went to the house with the garden " +
      "and they played in that green field all day long with joy too"
    val docs = Seq(
      (1L, en + " cat", "pos"), (2L, en + " cat cat", "neg"),
      (3L, en + " cat dog", "pos"), (4L, en + " dog", "neg"),
      (5L, "der hund und die katze cat", "neg"))
      .toDF("doc_id", "text", "source")
    docs.createOrReplaceTempView("gfs_cur_docs")
    val recipe = """{"stages": [
      {"stage": "lang", "lang": "en"},
      {"stage": "retrieve", "terms": ["cat"], "k": 4,
       "scorer": "bm25", "query_id": 9},
      {"stage": "hard_negatives", "label_col": "source",
       "label_value": "pos", "k": 2}
    ]}"""
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // EXPLAIN must launch no jobs (the TVF invariant) — measured with
    // the marker-group listener pattern of the lazy-jaccard spec
    val explainJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val markerSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (grp == "gfs-curate-marker") markerSeen.set(true)
        else explainJobs.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val plan = spark.sql("EXPLAIN FORMATTED SELECT * FROM " +
          s"graft_curate('gfs_cur_docs', 'doc_id', 'text', '$recipe')")
        .collect().map(_.getString(0)).mkString("\n")
      assert(plan.contains("Physical Plan"), plan.take(200))
      spark.sparkContext.setJobGroup("gfs-curate-marker", "flush")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.currentTimeMillis + 30000
      while (!markerSeen.get && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(markerSeen.get, "marker job never reached the listener")
      assert(explainJobs.get == 0,
        s"EXPLAIN of graft_curate must launch zero Spark jobs " +
          s"(saw ${explainJobs.get})")
    } finally spark.sparkContext.removeSparkListener(l)

    // and the SQL spelling equals the DataFrame recipe run
    val sqlRows = rows(spark.sql("SELECT * FROM graft_curate(" +
      s"'gfs_cur_docs', 'doc_id', 'text', '$recipe')"))
    val dfRows = rows(Curation.run(docs, "doc_id", "text",
      Curation.fromJson(recipe)))
    assert(sqlRows.nonEmpty && sqlRows.sorted == dfRows.sorted,
      s"graft_curate must equal Curation.run: $sqlRows vs $dfRows")

    // recipe table names resolve as views: the hybrid stage's
    // embeddings table
    Seq((1L, Seq(1.0f, 0.1f)), (2L, Seq(0.9f, 0.2f)),
        (3L, Seq(0.1f, 1.0f)), (9L, Seq(1.0f, 0.05f)))
      .toDF("vec_id", "embedding")
      .createOrReplaceTempView("gfs_cur_emb")
    val hyRecipe = """{"stages": [
      {"stage": "lang", "lang": "en"},
      {"stage": "hybrid", "terms": ["cat"], "k": 3,
       "embeddings": "gfs_cur_emb", "query_id": 9}
    ]}"""
    // the hybrid recipe (lexical + cosine + RRF) plans job-free too
    val hyJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val hyMarker = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hl = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (grp == "gfs-curate-hy-marker") hyMarker.set(true)
        else hyJobs.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(hl)
    try {
      spark.sql("EXPLAIN FORMATTED SELECT * FROM graft_curate(" +
        s"'gfs_cur_docs', 'doc_id', 'text', '$hyRecipe')").collect()
      spark.sparkContext.setJobGroup("gfs-curate-hy-marker", "flush")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val dl = System.currentTimeMillis + 30000
      while (!hyMarker.get && System.currentTimeMillis < dl)
        Thread.sleep(50)
      assert(hyMarker.get, "hybrid marker job never reached listener")
      assert(hyJobs.get == 0,
        s"EXPLAIN of a hybrid graft_curate recipe must launch zero " +
          s"Spark jobs (saw ${hyJobs.get})")
    } finally spark.sparkContext.removeSparkListener(hl)
    val hySql = spark.sql("SELECT * FROM graft_curate(" +
      s"'gfs_cur_docs', 'doc_id', 'text', '$hyRecipe')")
    assert(rows(hySql).nonEmpty)

    // eager set-resolution stages fail loudly at planning with the
    // DataFrame-API pointer, not with an EXPLAIN-time job storm
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_curate('gfs_cur_docs', " +
        """'doc_id', 'text', '{"stages": [{"stage": "near_dedup", """ +
        """"k": 3, "num_hashes": 12, "rows_per_band": 3, """ +
        """"threshold": 0.5}]}')""").collect()
    }
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgChain(err).contains("DataFrame API"), msgChain(err))
  }

  test("graft_bm25_search expands lazily: EXPLAIN launches zero " +
      "Spark jobs (r16)") {
    GraftFunctions.register(spark)
    Seq((1L, "spark merges the window"), (2L, "unrelated text here"))
      .toDF("doc_id", "text")
      .createOrReplaceTempView("gfs_bm25_lazy_docs")
    val explainJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val markerSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (grp == "gfs-bm25-marker") markerSeen.set(true)
        else explainJobs.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val plan = spark.sql("EXPLAIN FORMATTED SELECT * FROM " +
          "graft_bm25_search('gfs_bm25_lazy_docs', 'doc_id', 'text', " +
          "'spark,window', 5)")
        .collect().map(_.getString(0)).mkString("\n")
      assert(plan.contains("Physical Plan"), plan.take(200))
      spark.sparkContext.setJobGroup("gfs-bm25-marker", "flush")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.currentTimeMillis + 30000
      while (!markerSeen.get && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(markerSeen.get, "marker job never reached the listener")
      assert(explainJobs.get == 0,
        s"EXPLAIN of graft_bm25_search must launch zero Spark jobs " +
          s"(saw ${explainJobs.get})")
    } finally spark.sparkContext.removeSparkListener(l)
    // the lazy spelling still scores bit-identically to the eager one
    val lz = graft.operators.TextSearch.searchTopKBm25Lazy(
        spark.table("gfs_bm25_lazy_docs"), "doc_id", "text",
        Seq("spark", "window"), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val eg = graft.operators.TextSearch.searchTopKBm25(
        spark.table("gfs_bm25_lazy_docs"), "doc_id", "text",
        Seq("spark", "window"), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(lz.nonEmpty && lz == eg)
  }

  test("graft_ivf_probe expands lazily: EXPLAIN launches zero Spark " +
      "jobs (r17)") {
    import graft.operators.Similarity
    GraftFunctions.register(spark)
    val vecs = (1L to 40L).map(i =>
        (i, Seq((i % 7).toFloat, 1f, (i % 3).toFloat)))
      .toDF("vec_id", "embedding")
    // the whole index chain is lazy: hash-rank seeding (r17 — no
    // driver aggregate at plan build), broadcast assignment, probe
    val cents = Similarity.seedCentroidsK(vecs, "vec_id", "embedding", 4)
    Similarity.ivfAssign(vecs, cents, "vec_id", "embedding")
      .createOrReplaceTempView("gfs_ivf_lazy_asg")
    cents.createOrReplaceTempView("gfs_ivf_lazy_cent")
    vecs.filter(col("vec_id") <= 2L)
      .createOrReplaceTempView("gfs_ivf_lazy_q")
    val explainJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val markerSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (grp == "gfs-ivf-marker") markerSeen.set(true)
        else explainJobs.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val plan = spark.sql("EXPLAIN FORMATTED SELECT * FROM " +
          "graft_ivf_probe('gfs_ivf_lazy_asg', 'gfs_ivf_lazy_cent', " +
          "'gfs_ivf_lazy_q', 'vec_id', 'embedding', 4, 2)")
        .collect().map(_.getString(0)).mkString("\n")
      assert(plan.contains("Physical Plan"), plan.take(200))
      spark.sparkContext.setJobGroup("gfs-ivf-marker", "flush")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.currentTimeMillis + 30000
      while (!markerSeen.get && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(markerSeen.get, "marker job never reached the listener")
      assert(explainJobs.get == 0,
        s"EXPLAIN of graft_ivf_probe must launch zero Spark jobs " +
          s"(saw ${explainJobs.get})")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("graft_pq_probe / graft_ivfpq_probe equal their DataFrame twins " +
      "bit-for-bit, and EXPLAIN launches zero Spark jobs (r18)") {
    import graft.operators.Similarity
    GraftFunctions.register(spark)
    val vecs = (1L to 40L).map(i =>
        (i, Seq((i % 7).toFloat + 0.1f, 1f, (i % 3).toFloat - 0.5f,
          (i % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val m = 2
    val ksub = 6
    val cb = Similarity.pqTrainSampled(vecs, "vec_id", "embedding",
      m, ksub)
    val encoded = Similarity.pqEncode(vecs, cb, "vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") <= 3L)
    // the codebook VIEW: hash-rank order as code_id (the
    // pqTrainSampled selection rule, spelled lazily)
    val cbView = graft.operators.BoundedRank.packedIndex(
      vecs.filter(col("embedding").isNotNull)
        .select(StableHash.hash60(col("vec_id").cast("string"))
            .as("__h"),
          col("vec_id").as("__id"), col("embedding"))
        .orderBy(col("__h").asc, col("__id").asc)
        .limit(ksub),
      Seq(col("__h"), col("__id")),
      Seq("embedding" -> col("embedding")), "code_id")
    cbView.createOrReplaceTempView("gfs_pq_cb")
    encoded.createOrReplaceTempView("gfs_pq_codes")
    queries.createOrReplaceTempView("gfs_pq_q")

    def rows3(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    val pqSql = spark.sql("SELECT * FROM graft_pq_probe('gfs_pq_cb', " +
      s"'gfs_pq_codes', 'gfs_pq_q', 'vec_id', 'embedding', $m, 4)")
    val pqDf = Similarity.pqTopK(encoded, cb, queries, "vec_id",
      "embedding", 4)
    assert(rows3(pqSql).nonEmpty && rows3(pqSql) == rows3(pqDf),
      "graft_pq_probe must equal pqTopK (HOF vs expression ADC " +
        "bit-identical)")

    val cents = Similarity.seedCentroidsK(vecs, "vec_id", "embedding", 4)
    val assignedCodes = Similarity
      .ivfAssign(vecs, cents, "vec_id", "embedding")
      .select(col("vec_id"), col("cluster"),
        graft.functions.PqOps.encode(col("embedding"), cb).as("codes"))
    assignedCodes.createOrReplaceTempView("gfs_ivfpq_asg")
    cents.createOrReplaceTempView("gfs_ivfpq_cent")
    val ivfPqSqlDf = spark.sql("SELECT * FROM graft_ivfpq_probe(" +
      "'gfs_ivfpq_asg', 'gfs_ivfpq_cent', 'gfs_pq_cb', 'gfs_pq_q', " +
      s"'vec_id', 'embedding', $m, 4, 2)")
    val ivfPqDf = Similarity.ivfTopKPq(assignedCodes, cents, queries,
      cb, "vec_id", "embedding", 4, 2)
    assert(rows3(ivfPqSqlDf).nonEmpty &&
      rows3(ivfPqSqlDf) == rows3(ivfPqDf),
      "graft_ivfpq_probe must equal ivfTopKPq")

    // EXPLAIN of both must launch zero jobs: the codebook folds as a
    // lazy one-row aggregate, never a collect at plan build
    val explainJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val markerSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (grp == "gfs-pq-marker") markerSeen.set(true)
        else explainJobs.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val p1 = spark.sql("EXPLAIN FORMATTED SELECT * FROM " +
          "graft_pq_probe('gfs_pq_cb', 'gfs_pq_codes', 'gfs_pq_q', " +
          s"'vec_id', 'embedding', $m, 4)")
        .collect().map(_.getString(0)).mkString("\n")
      assert(p1.contains("Physical Plan"), p1.take(200))
      val p2 = spark.sql("EXPLAIN FORMATTED SELECT * FROM " +
          "graft_ivfpq_probe('gfs_ivfpq_asg', 'gfs_ivfpq_cent', " +
          s"'gfs_pq_cb', 'gfs_pq_q', 'vec_id', 'embedding', $m, 4, 2)")
        .collect().map(_.getString(0)).mkString("\n")
      assert(p2.contains("Physical Plan"), p2.take(200))
      spark.sparkContext.setJobGroup("gfs-pq-marker", "flush")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.currentTimeMillis + 30000
      while (!markerSeen.get && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(markerSeen.get, "marker job never reached the listener")
      assert(explainJobs.get == 0,
        s"EXPLAIN of the PQ probe TVFs must launch zero Spark jobs " +
          s"(saw ${explainJobs.get})")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("graft_semdedup_probe equals its DataFrame twin bit-for-bit, " +
      "and EXPLAIN launches zero Spark jobs (r18)") {
    import graft.operators.{Dedup, Similarity}
    GraftFunctions.register(spark)
    // two tight directions; batch rows (id % 10 == 0) are near-copies
    // of corpus members
    val vecs = ((1L to 20L).map(i =>
        (i, Seq(1.0f + i * 0.001f, 0.5f, 0.25f))) ++
      (21L to 30L).map(i =>
        (i, Seq(-1.0f, 0.2f + i * 0.01f, 0.9f))))
      .toDF("vec_id", "embedding")
    val corp = vecs.filter(col("vec_id") % 10 =!= 0)
    val batch = vecs.filter(col("vec_id") % 10 === 0)
    val idx = Similarity.buildHierarchyIndex(corp, "vec_id",
      "embedding", k1 = 2, k2 = 2)
    idx.assigned.createOrReplaceTempView("gfs_sem_asg")
    idx.centroids.createOrReplaceTempView("gfs_sem_cent")
    idx.subSeeds.createOrReplaceTempView("gfs_sem_seeds")
    batch.createOrReplaceTempView("gfs_sem_batch")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSql = pairs(spark.sql("SELECT new_id, corpus_id FROM " +
      "graft_semdedup_probe('gfs_sem_asg', 'gfs_sem_cent', " +
      "'gfs_sem_seeds', 'gfs_sem_batch', 'vec_id', 'embedding', 0.9)"))
    val viaDf = pairs(Dedup.semanticNearDupsAgainst(
      Similarity.assignToHierarchy(batch, idx, "vec_id", "embedding"),
      idx.assigned, "vec_id", "embedding", "cluster", threshold = 0.9))
    assert(viaSql.nonEmpty && viaSql == viaDf,
      "graft_semdedup_probe must equal the eager DataFrame probe " +
        "(the any_value lazy assign changes nothing)")

    val explainJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val markerSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (grp == "gfs-sem-marker") markerSeen.set(true)
        else explainJobs.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val plan = spark.sql("EXPLAIN FORMATTED SELECT * FROM " +
          "graft_semdedup_probe('gfs_sem_asg', 'gfs_sem_cent', " +
          "'gfs_sem_seeds', 'gfs_sem_batch', 'vec_id', 'embedding', " +
          "0.9)")
        .collect().map(_.getString(0)).mkString("\n")
      assert(plan.contains("Physical Plan"), plan.take(200))
      spark.sparkContext.setJobGroup("gfs-sem-marker", "flush")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.currentTimeMillis + 30000
      while (!markerSeen.get && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(markerSeen.get, "marker job never reached the listener")
      assert(explainJobs.get == 0,
        s"EXPLAIN of graft_semdedup_probe must launch zero Spark " +
          s"jobs (saw ${explainJobs.get})")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("GraftExtensions injects at session build time") {
    val base = spark // force shared-session init before clearing
    val expected = base.range(1)
      .select(StableHash.hash60(lit("extension probe")))
      .head().getLong(0)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base, "a fresh session must be built for the test")
      val got = s2.sql(
        "SELECT graft_stable_hash60('extension probe') AS h")
        .head().getLong(0)
      assert(got == expected)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
