package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus text-search surface: inverted index build, per-document
  * tf-idf keyword extraction, and conjunctive ranked retrieval.
  *
  * A training-data engine needs to answer "which documents contain X"
  * without a full-corpus scan per question — for contamination triage
  * (which shards carry a leaked benchmark string), corpus QA (what does
  * the crawl say about a topic), and per-doc keyword reports on dataset
  * cards. The reference delegates all search to the destination
  * warehouse; these operators make the capability engine-native, the
  * same way the dedup/sketch families do.
  *
  * Determinism contract (shared with the rest of the repo): every score
  * is either exact integer arithmetic or a SINGLE fixed-order chain of
  * correctly-rounded IEEE ops, so DuckDB oracles hash-match bit-exactly.
  * Tokenization is the corpus-wide standard `split(trim(lower(text)),
  * '\s+')` via [[graft.functions.TextShingles.wordShingles]] with k=1,
  * identical to the dedup shingle pipeline's word stage.
  */
object TextSearch {

  /** Fixed-point scale for integer idf weights: `idfW(term) =
    * (N * IdfScale) div df(term)` — floor division of exact longs, so
    * weights (and every score summed from them) are bit-identical in any
    * engine. 1e6 gives 6 decimal digits of idf resolution; N * IdfScale
    * stays far inside long range even at 10^11 documents.
    */
  val IdfScale = 1000000L

  /** Distinct (doc, term) pairs with the in-doc term frequency,
    * computed ROW-LOCALLY by [[graft.functions.WordTermCounts]] — the
    * corpus' word instances never reach an exchange; only the already-
    * collapsed (doc, distinct-term, tf) rows do (a `groupBy(doc, term)`
    * formulation would shuffle every word instance first). Empty-string
    * terms (blank documents tokenize to [""]) are dropped symmetrically
    * with the oracle's `term <> ''` predicate.
    */
  private def docTermTf(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(graft.functions.TextShingles.wordTermCounts(
          col(textCol))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"),
        col("tc.tf").as("tf"))
      .filter(col("term") =!= "")

  /** Build an inverted index: one row per (term, posting slot), with the
    * EXACT document frequency and the first `maxPostings` doc ids
    * (ascending) as the stored posting list.
    *
    * Scale shape: terms are the canonical few-huge-groups skew case — a
    * stopword's posting list is the corpus. The cap therefore runs as a
    * [[graft.functions.BoundedTopK]] TypedImperativeAggregate (constant
    * score ⇒ ties break id-ascending ⇒ k SMALLEST doc ids): each map
    * task ships at most `maxPostings` candidates per term, the term
    * exchange carries bounded buffers, and no reducer ever materializes
    * a full stopword posting list. `df` stays exact (plain count over
    * the same partial-aggregated pairs). One shuffle total.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int): DataFrame = {
    require(maxPostings > 0, s"maxPostings ($maxPostings) must be > 0")
    docTermTf(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        graft.functions.BoundedTopK.topK(
          lit(0.0), col("doc_id"), maxPostings).as("postings"))
      .select(col("term"), col("df"),
        posexplode(col("postings")).as(Seq("slot", "doc_id")))
      .select(col("term"), col("df"), col("slot").cast("long").as("slot"),
        col("doc_id"))
  }

  /** Merge a NEW document batch into a stored inverted index without
    * re-scanning the indexed corpus — the search twin of the dedup
    * `...Against` family. `index` is the (term, df, slot, doc_id) shape
    * [[invertedIndex]] emits; `batch` documents must be DISJOINT from
    * the indexed ones (dedup upstream — a re-indexed doc would double
    * its df contribution).
    *
    * Exactness: the k-smallest of `A ∪ B` are all either in B or among
    * the k-smallest of A (anything the old cap dropped was larger than
    * k kept ids), so re-capping `capped(A) ∪ B` equals capping the full
    * union — the incremental result is BIT-IDENTICAL to a from-scratch
    * rebuild over the combined corpus, and the rebuild SQL is its
    * oracle. df adds exactly; the stored df rides slot 0 so capped
    * terms (df > kept postings) keep their true count.
    *
    * Scale shape: only `O(terms × cap)` index rows and the batch's
    * (doc, term) pairs move — one term-keyed shuffle, the indexed
    * corpus text is never touched.
    */
  def invertedIndexAppend(index: DataFrame, batch: DataFrame,
                          idCol: String, textCol: String,
                          maxPostings: Int): DataFrame = {
    require(maxPostings > 0, s"maxPostings ($maxPostings) must be > 0")
    val indexPairs = index.select(col("term"),
      when(col("slot") === 0, col("df")).otherwise(lit(0L)).as("w"),
      col("doc_id"))
    val batchPairs = docTermTf(batch, idCol, textCol)
      .select(col("term"), lit(1L).as("w"), col("doc_id"))
    indexPairs.unionByName(batchPairs)
      .groupBy(col("term"))
      .agg(sum(col("w")).as("df"),
        graft.functions.BoundedTopK.topK(
          lit(0.0), col("doc_id"), maxPostings).as("postings"))
      .select(col("term"), col("df"),
        posexplode(col("postings")).as(Seq("slot", "doc_id")))
      .select(col("term"), col("df"), col("slot").cast("long").as("slot"),
        col("doc_id"))
  }

  /** Integer idf weight over the fixed `n_docs`/`df` columns:
    * `(n_docs * IdfScale) div df` — Spark's IntegralDivide on longs,
    * bit-identical to the oracle's `//`.
    */
  private val idfWeightExpr = s"(n_docs * ${IdfScale}L) div df"

  /** Per-document top-k keywords by tf·idf.
    *
    * Score = `tf * ((N * IdfScale) div df)` — exact longs end to end
    * (idf quantized to [[IdfScale]]), rank ties broken term-ascending,
    * so ranks are a total order any engine reproduces. N counts ALL
    * documents (including blank ones), matching the oracle's bare
    * `count(*)`.
    *
    * Scale shape: df is `groupBy(term).count` + a join back — NOT a
    * count window by term. The window formulation co-locates every row
    * of a term on one reducer with no partial aggregation, which under
    * stopword skew (a term held by most of the corpus) is a one-task
    * funnel; the groupBy gets map-side combine (the df table shrinks to
    * |vocab| rows before any exchange), AQE broadcasts it when small
    * and skew-splits the join when it isn't — a window can do neither.
    * The top-k rank stays a window partitioned by doc_id: the OPPOSITE
    * skew regime — billions of tiny groups, each bounded by a
    * document's distinct-word count, spread uniformly by the hash
    * partitioning. N is a one-row broadcast (the Pca.scala threshold
    * pattern).
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    // persisted: the df aggregate and the join both consume this frame,
    // and the planner never reuses the subtree across the two references
    // (the LSH signature-persist finding) — without it the corpus is
    // scanned and tokenized twice
    val dt0 = docTermTf(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // release dt0 with the result (r21, the tfidfKeywordsOver contract:
    // whoever persists the term stream releases it) — the eager
    // checkpoint means a caller that wants a per-doc SLIVER of the
    // keyword table (and relies on pushing its doc filter below the
    // rank window) should filter `docs` first or compose via
    // tfidfKeywordsOver with its own persist/release
    Dedup.releaseAfter(tfidfKeywordsOver(docs, dt0, k), dt0)
  }

  /** [[tfidfKeywords]] over a caller-provided `(doc_id, term, tf)`
    * frame (the caller persists and releases it) — so a composition
    * that needs BOTH the keywords and another pass over the same term
    * stream ([[searchTopKBatchOver]]: the more-like-this panel)
    * tokenizes the corpus exactly once (r20; the composed spelling
    * tokenized twice, once per operator).
    */
  private[graft] def tfidfKeywordsOver(docs: DataFrame, dt0: DataFrame,
                    k: Int): DataFrame = {
    require(k > 0, s"k ($k) must be > 0")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val dfTbl = dt0.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dt = dt0.join(dfTbl, "term")
    val scored = dt.crossJoin(broadcast(n))
      .withColumn("score", expr(s"tf * ($idfWeightExpr)"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
  }

  /** The `(doc_id, term, tf)` term stream, for callers composing
    * several term-level operators over one persisted pass.
    */
  private[graft] def docTerms(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    docTermTf(docs, idCol, textCol)

  /** Serve a conjunctive ranked query from a PREBUILT inverted index
    * ([[invertedIndex]] / [[invertedIndexAppend]] output) instead of
    * scanning and tokenizing the corpus: candidate doc ids come from
    * the query terms' posting lists, so the per-doc tokenize runs ONLY
    * on candidates; df comes from the index (slot-0 rows carry the
    * exact global count even for capped terms); N is the corpus row
    * count. Scoring is the same exact integer tf·idf as [[searchTopK]].
    *
    * Recall contract: posting lists are capped at build time, so a term
    * with df > cap contributes only its first `cap` doc ids — results
    * are EXACT (identical to searchTopK) when every query term has
    * df ≤ cap, and bounded-recall otherwise (deterministic and
    * engine-identical either way; the oracle replays the same capped
    * candidate set). Production sizes the cap for its query class or
    * shards hot terms; the candidate set is always ≤ cap × |terms|
    * rows, which is what makes serving O(candidates) instead of
    * O(corpus).
    *
    * Scale shape: the postings filter is an index sliver; candidates
    * broadcast into a hash join against the corpus so only matching
    * rows are tokenized (WordTermCounts runs post-join); df and N are
    * broadcast one-row/|terms|-row artifacts.
    */
  def searchTopKFromIndex(index: DataFrame, docs: DataFrame,
                          idCol: String, textCol: String,
                          terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k > 0, s"k ($k) must be > 0")
    val qTerms = terms.map(_.toLowerCase).distinct
    val post = index.filter(col("term").isin(qTerms: _*))
    val cand = post.select(col("doc_id")).distinct()
    val dfTbl = post.filter(col("slot") === 0)
      .select(col("term"), col("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val candDocs = docs.join(broadcast(cand),
      docs(idCol).cast("long") === cand("doc_id")).drop(cand("doc_id"))
    docTermTf(candDocs, idCol, textCol)
      .filter(col("term").isin(qTerms: _*))
      .join(broadcast(dfTbl), "term")
      .crossJoin(broadcast(n))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"),
        sum(expr(s"tf * ($idfWeightExpr)")).as("score"))
      .filter(col("n_matched") === qTerms.size)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("score"))
  }

  /** Exact phrase search: documents containing `phrase` as a
    * consecutive word sequence, with the occurrence count. A phrase of
    * n words is precisely an n-shingle, so this is a zero-exchange scan
    * filter over the SAME one-pass [[graft.functions.WordShingles]]
    * kernel the dedup family uses — no index, no shuffle, no join; at
    * 100 TB it runs at parquet scan speed with the text column the only
    * thing read. This is the decontamination-triage primitive: "which
    * shards contain this benchmark string, verbatim?"
    *
    * The phrase is normalized with the corpus tokenization rule
    * (lowercase, whitespace-split) so "Batch  BATCH" matches
    * "batch batch".
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: String): DataFrame = {
    val words = phrase.toLowerCase.trim.split("\\s+").toSeq
    require(words.nonEmpty && words.head.nonEmpty,
      "phrase must contain at least one word")
    val needle = words.mkString(" ")
    val hits = size(filter(
      graft.functions.TextShingles.wordShingles(col(textCol), words.size),
      _ === lit(needle)))
    docs.select(col(idCol).cast("long").as("doc_id"),
        hits.cast("long").as("n_hits"))
      .filter(col("n_hits") > 0)
  }

  /** Conjunctive (AND) ranked retrieval: documents containing EVERY
    * query term, ranked by `Σ_t tf_t * idfW_t` (exact longs — the sum
    * is order-insensitive, unlike float tf-idf), ties doc-id-ascending,
    * top `k` only.
    *
    * Scale shape: the query-term filter lands directly on the exploded
    * term stream — the corpus collapses to O(docs × |terms|) rows
    * BEFORE the first exchange, and everything downstream runs on that
    * sliver. df collapses to ≤|terms| rows via map-side combine and is
    * explicitly broadcast, so the matched rows shuffle exactly once (the
    * per-doc rollup). The final top-k compiles to TakeOrderedAndProject
    * (bounded per-partition heaps + one driver merge), never a global
    * sort. df is computed over the full corpus' occurrences of the
    * query terms — the same value the inverted index stores, so serving
    * from a prebuilt [[invertedIndex]] is a drop-in.
    */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k: Int): DataFrame =
    searchTopKImpl(docs, idCol, textCol, terms, k, lazyPlan = false)

  /** [[searchTopK]] with a PURE LAZY plan — no sliver persist; the
    * query-term sliver re-derives per consumer. The SQL TVF expansion
    * uses this: the eager spelling's persist is plan-lazy (no jobs at
    * planning) but pins a NEW cache entry per invocation for the
    * session's lifetime — a long-lived SQL session issuing many
    * `graft_text_search`/`graft_curate` calls would accumulate them
    * unboundedly (the `searchTopKBm25Lazy` sibling's rationale).
    */
  private[graft] def searchTopKLazy(docs: DataFrame, idCol: String,
      textCol: String, terms: Seq[String], k: Int): DataFrame =
    searchTopKImpl(docs, idCol, textCol, terms, k, lazyPlan = true)

  private def searchTopKImpl(docs: DataFrame, idCol: String,
      textCol: String, terms: Seq[String], k: Int,
      lazyPlan: Boolean): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k > 0, s"k ($k) must be > 0")
    val qTerms = terms.map(_.toLowerCase).distinct
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // the persisted frame is only the query-term sliver — tiny, and it
    // spares the second full corpus scan its two consumers would cost
    val dt1 = docTermTf(docs, idCol, textCol)
      .filter(col("term").isin(qTerms: _*))
    // lazy spelling: plain re-derivation per consumer. An r21 attempt
    // pinned the sliver behind repartition(term) hoping ReuseExchange
    // would share it — it cannot: column pruning dives below the
    // repartition and projects each branch differently (df agg keeps
    // only `term`), so the subtrees never canonical-match, the scoring
    // branch gains an exchange its broadcast join never needed, and
    // the df branch loses map-side partial aggregation (raw instances
    // on the wire instead of per-task partials). Reverted on plan
    // evidence: plans/r21/sql_text_search_tvf_{before,after}.txt.
    val dt0 =
      if (lazyPlan) dt1
      else dt1.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfTbl = dt0.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dt = dt0.join(broadcast(dfTbl), "term")
    val out = dt.crossJoin(broadcast(n))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"),
        sum(expr(s"tf * ($idfWeightExpr)")).as("score"))
      .filter(col("n_matched") === qTerms.size)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("score"))
    // the eager spelling release-checkpoints like bm25Impl: without
    // it every DataFrame-API invocation pins one sliver cache entry
    // for the session's lifetime
    if (lazyPlan) out else Dedup.releaseAfter(out, dt0)
  }

  /** BM25-flavor disjunctive ranked retrieval (single query): classic
    * BM25 term-frequency saturation and document-length normalization,
    *
    *   score(d) = Σ_t idfW(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    *
    * with ONE deliberate deviation: `idfW` is this engine's exact
    * integer idf weight (`(N·IdfScale) div df`) instead of the
    * ln-based Robertson idf — natural-log implementations are not
    * bit-identical across engines, and this repo's determinism
    * contract (scores reproducible against the DuckDB oracle) wins
    * over formula orthodoxy. Rank order matches ln-idf closely since
    * both are monotone decreasing in df.
    *
    * Float determinism: each per-term score is a single fixed-order
    * IEEE chain (spelled identically in the oracle SQL), and the
    * per-doc sum folds the terms in SORTED term order
    * (`aggregate(array_sort(collect_list(...)))` ≡ DuckDB
    * `list_sum(list(s ORDER BY term))` — the PQ/ADC precedent), so
    * the double is bit-identical regardless of task order.
    *
    * Scale shape: tokenize + doc-length are row-local (dl rides each
    * exploded term row — no corpus self-join); the query-term filter
    * collapses the corpus to a sliver before any exchange; df and the
    * corpus totals broadcast; global top-k compiles to
    * TakeOrderedAndProject. Emits `(doc_id, score)` top k.
    */
  def searchTopKBm25(docs: DataFrame, idCol: String, textCol: String,
                     terms: Seq[String], k: Int,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Impl(docs, idCol, textCol, terms, k, k1, b, lazyPlan = false)

  /** [[searchTopKBm25]] with a PURE LAZY plan — no persist, no eager
    * release checkpoint; the query-term sliver re-derives per consumer
    * (df aggregate + score join) instead of caching. The SQL TVF
    * expansion uses this: planning — including EXPLAIN — must launch
    * zero Spark jobs (the `ngramJaccardAgainstLazy` precedent; the
    * r16 TVF surface initially shipped the eager spelling here, which
    * ran the probe's jobs at analysis time).
    */
  private[graft] def searchTopKBm25Lazy(docs: DataFrame, idCol: String,
      textCol: String, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Impl(docs, idCol, textCol, terms, k, k1, b, lazyPlan = true)

  private def bm25Impl(docs: DataFrame, idCol: String, textCol: String,
                       terms: Seq[String], k: Int,
                       k1: Double, b: Double,
                       lazyPlan: Boolean): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k > 0, s"k ($k) must be > 0")
    requireBm25Params(k1, b)
    require(terms.forall(_.trim.nonEmpty),
      "terms must be non-blank (blank tokens are not corpus terms)")
    val qTerms = terms.map(_.toLowerCase).distinct
    val withTc = docsWithTermCounts(docs, idCol, textCol)
    val rows0 = explodeWithDl(withTc)
      .filter(col("term").isin(qTerms: _*))
    // lazy spelling: plain re-derivation per consumer (see
    // searchTopKImpl — the r21 repartition(term) ReuseExchange attempt
    // was reverted on plan evidence: pruning differentiates the
    // branches below the repartition, so nothing is ever reused and
    // both branches get strictly worse exchanges).
    val rows =
      if (lazyPlan) rows0
      else rows0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfTbl = rows.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val out = rows.join(broadcast(dfTbl), "term")
      .crossJoin(broadcast(corpusDlTotals(withTc)))
      .withColumn("s", expr(bm25ScoreExpr(k1, b)))
      .groupBy(col("doc_id"))
      .agg(sortedTermScoreSum.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("score"))
    if (lazyPlan) out else Dedup.releaseAfter(out, rows)
  }

  private def requireBm25Params(k1: Double, b: Double): Unit =
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"k1 ($k1) must be >= 0 and b ($b) in [0, 1]")

  /** `(doc_id, __tc)` — row-local term counts, the shared first stage
    * of the BM25 family.
    */
  private def docsWithTermCounts(docs: DataFrame, idCol: String,
                                 textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      graft.functions.TextShingles.wordTermCounts(col(textCol))
        .as("__tc"))

  /** Document length from a row-local term-count array (blank-token
    * entries excluded, matching the oracle's `term <> ''`).
    */
  private def dlOf(tcCol: org.apache.spark.sql.Column) =
    aggregate(tcCol, lit(0L), (acc, x) =>
      acc + when(x.getField("term") === "", lit(0L))
        .otherwise(x.getField("tf")))

  /** `(doc_id, dl, term, tf)` rows — dl rides each exploded term row,
    * so length normalization never needs a corpus self-join.
    */
  private def explodeWithDl(withTc: DataFrame): DataFrame =
    withTc
      .select(col("doc_id"), dlOf(col("__tc")).as("dl"),
        explode(col("__tc")).as("tcx"))
      .select(col("doc_id"), col("dl"),
        col("tcx.term").as("term"), col("tcx.tf").as("tf"))
      .filter(col("term") =!= "")

  /** One-row `(sumdl, n_docs)` corpus totals (broadcast by callers). */
  private def corpusDlTotals(withTc: DataFrame): DataFrame =
    withTc.select(dlOf(col("__tc")).as("dl"))
      .agg(sum(col("dl")).as("sumdl"), count(lit(1)).as("n_docs"))

  /** The per-term BM25 chain — the oracle spells it
    * CHARACTER-IDENTICALLY; any re-association changes the rounded
    * double.
    */
  private def bm25ScoreExpr(k1: Double, b: Double): String =
    s"(CAST(($idfWeightExpr) AS DOUBLE) * tf * " +
      s"CAST(${k1 + 1.0} AS DOUBLE)) / " +
      s"(tf + CAST($k1 AS DOUBLE) * (CAST(${1.0 - b} AS DOUBLE) + " +
      s"CAST($b AS DOUBLE) * dl * n_docs / sumdl))"

  /** Deterministic float fold: per-group sum of `s` in SORTED term
    * order (`aggregate(array_sort(collect_list(...)))` ≡ DuckDB
    * `list_sum(list(s ORDER BY term))`) — bit-identical regardless of
    * task order.
    */
  private def sortedTermScoreSum: org.apache.spark.sql.Column =
    aggregate(
      array_sort(collect_list(struct(col("term"), col("s")))),
      lit(0.0), (acc, x) => acc + x.getField("s"))

  /** The BM25 corpus statistics `(sumdl, n_docs)` as a one-row frame —
    * the piece of BM25 that is a CORPUS aggregate rather than a
    * per-candidate computation, published beside an inverted index so
    * [[searchTopKBm25FromIndex]] never re-scans the corpus at query
    * time (tf and dl are row-local to the candidates; df is stored in
    * the index; only these totals would otherwise force a full pass).
    * Maintained incrementally by [[graft.streaming.StreamingIndex]]
    * (totals ADD exactly across disjoint batches).
    */
  def bm25CorpusStats(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    corpusDlTotals(docsWithTermCounts(docs, idCol, textCol))

  /** Serve a BM25-flavor disjunctive query from a PREBUILT inverted
    * index plus published [[bm25CorpusStats]]: candidate doc ids come
    * from the query terms' posting lists; tf AND dl are computed
    * row-locally on the candidates only; df comes from the index
    * (slot-0 rows carry the exact global count even for capped
    * terms); `(sumdl, n_docs)` come from `stats` — so query time
    * touches O(candidates) corpus rows, never the corpus.
    *
    * Recall contract: identical to [[searchTopKFromIndex]]'s —
    * results equal [[searchTopKBm25]] exactly when every query term
    * has df ≤ the index's posting cap (candidate scores are ALWAYS
    * the exact BM25 values; only the candidate set is capped), and
    * bounded-recall otherwise. Float determinism: the same
    * character-identical chain + sorted-term fold.
    */
  def searchTopKBm25FromIndex(index: DataFrame, stats: DataFrame,
                              docs: DataFrame, idCol: String,
                              textCol: String, terms: Seq[String],
                              k: Int, k1: Double = 1.2,
                              b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k > 0, s"k ($k) must be > 0")
    requireBm25Params(k1, b)
    val qTerms = terms.map(_.toLowerCase).distinct
    val post = index.filter(col("term").isin(qTerms: _*))
    val cand = post.select(col("doc_id")).distinct()
    val dfTbl = post.filter(col("slot") === 0)
      .select(col("term"), col("df"))
    val candDocs = docs.join(broadcast(cand),
      docs(idCol).cast("long") === cand("doc_id")).drop(cand("doc_id"))
    explodeWithDl(docsWithTermCounts(candDocs, idCol, textCol))
      .filter(col("term").isin(qTerms: _*))
      .join(broadcast(dfTbl), "term")
      .crossJoin(broadcast(stats.select(col("sumdl"), col("n_docs"))))
      .withColumn("s", expr(bm25ScoreExpr(k1, b)))
      .groupBy(col("doc_id"))
      .agg(sortedTermScoreSum.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("score"))
  }

  /** BM25-scored disjunctive retrieval for a PANEL of queries in ONE
    * corpus pass — [[searchTopKBatch]]'s serving shape with
    * [[searchTopKBm25]]'s scorer: `queryTerms` is `(query_id, term)`
    * rows, and a doc scores `Σ` of the per-term BM25 chain over
    * whichever query terms it contains. Emits
    * `(query_id, rank, neighbor_id)` (score desc, id asc, top k per
    * query) — the ranked-list shape [[Similarity.rrfFuse]] consumes,
    * making BM25 the standard lexical arm of a hybrid configuration.
    *
    * Float determinism: the per-term chain and the sorted-term fold
    * are the single-query operator's (oracle spells both identically);
    * the ranking consumes the resulting bit-exact double.
    *
    * Scale shape: identical to [[searchTopKBatch]] — the corpus'
    * row-local term stream semi-joins the BROADCAST distinct panel
    * term set before any exchange; df over that sliver is the exact
    * corpus-wide df; dl rides each term row; corpus totals broadcast;
    * the per-(query, doc) rollup and BoundedTopK ranking move
    * sliver-sized rows only.
    */
  def searchTopKBatchBm25(docs: DataFrame, idCol: String,
                          textCol: String, queryTerms: DataFrame,
                          k: Int, k1: Double = 1.2,
                          b: Double = 0.75): DataFrame = {
    require(k > 0, s"k ($k) must be > 0")
    requireBm25Params(k1, b)
    val qt = queryTerms.select(col("query_id"),
        lower(col("term")).as("term")).distinct()
      .filter(col("term") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termSet = qt.select(col("term")).distinct()
    val withTc = docsWithTermCounts(docs, idCol, textCol)
    val rows = explodeWithDl(withTc)
      .join(broadcast(termSet), "term")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfTbl = rows.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = rows.join(broadcast(dfTbl), "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(corpusDlTotals(withTc)))
      .withColumn("s", expr(bm25ScoreExpr(k1, b)))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sortedTermScoreSum.as("score"))
    val out = graft.operators.Similarity.rankTopK(
      scored.select(col("query_id"),
        col("doc_id").as("neighbor_id"),
        col("score").as("sim")), k)
    Dedup.releaseAfterAll(out, qt, rows)
  }

  /** Search-result snippets: the ±`window` word context around the
    * FIRST occurrence of any query term, with the 1-based word
    * position of that hit. The result-page companion to
    * [[searchTopK]]/[[phraseSearch]] — and the triage view for
    * decontamination hits ("show me the leaked string in context").
    *
    * Scale shape: a zero-exchange scan — tokenize row-locally (the
    * corpus tokenization rule), per-term `array_position`, `least`
    * across terms, one slice + join. No shuffle, no join; at 100 TB it
    * runs at parquet-scan speed with the text column the only thing
    * read. Emits `(doc_id, pos, snippet)` for matching docs only.
    */
  def searchSnippets(docs: DataFrame, idCol: String, textCol: String,
                     terms: Seq[String], window: Int = 5): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.forall(_.trim.nonEmpty),
      "terms must be non-blank (blank tokens are not corpus terms)")
    require(window >= 0, s"window ($window) must be >= 0")
    val miss = Long.MaxValue
    val wsC = col("__ws")
    val posCols = terms.map(_.toLowerCase).distinct.map { t =>
      val p = array_position(wsC, lit(t))
      when(p === 0L, lit(miss)).otherwise(p)
    }
    val minPos = if (posCols.size == 1) posCols.head
      else least(posCols: _*)
    val from = greatest(lit(1L), col("pos") - window)
    docs.select(col(idCol).cast("long").as("doc_id"),
        graft.functions.TextShingles.wordShingles(col(textCol), 1)
          .as("__ws"))
      .withColumn("pos", minPos)
      .filter(col("pos") =!= miss)
      .select(col("doc_id"), col("pos"),
        array_join(slice(wsC, from.cast("int"),
          (col("pos") + window - from + 1).cast("int")), " ")
          .as("snippet"))
  }

  /** Disjunctive (OR) ranked retrieval for a PANEL of queries in ONE
    * corpus pass — the "more-like-this" serving shape: `queryTerms` is
    * (query_id, term) rows (e.g. a per-doc [[tfidfKeywords]] slice),
    * and a doc scores `Σ tf·idfW` over whichever query terms it
    * contains — OR semantics, unlike [[searchTopK]]'s every-term AND.
    * Emits `(query_id, rank, neighbor_id)` (score desc, id asc, top k
    * per query — the ranked-list shape [[Similarity.rrfFuse]] and
    * [[Similarity.recallAudit]] consume). The exact integer score is
    * ranked through a double cast — lossless while total scores stay
    * under 2^53, which holds up to corpora of ~10^9 docs (a df=1 term
    * at n_docs ≥ ~9·10^9 pushes idfW alone past 2^53, where distinct
    * integer scores could collapse to one double and ties break by id
    * instead of exact score); beyond that regime rank from the exact
    * long scores directly.
    *
    * Scale shape: the corpus' row-local term stream semi-joins the
    * BROADCAST distinct query-term set before any exchange, so the
    * corpus collapses to the matched (doc, term, tf) sliver; df over
    * that sliver is the exact corpus-wide df (every doc containing the
    * term survives the semi-join); the per-(query, doc) rollup and the
    * BoundedTopK ranking move sliver-sized rows only. `queryTerms` is
    * panel-sized by contract and persists across its two consumers
    * (the term set and the scoring pair join).
    */
  def searchTopKBatch(docs: DataFrame, idCol: String, textCol: String,
                      queryTerms: DataFrame, k: Int): DataFrame =
    searchTopKBatchOver(docs, docTermTf(docs, idCol, textCol),
      queryTerms, k)

  /** [[searchTopKBatch]] over a caller-provided `(doc_id, term, tf)`
    * frame; `alsoRelease` frames unpersist with the result's eager
    * materialization (the caller's shared term-stream persist).
    */
  private[graft] def searchTopKBatchOver(docs: DataFrame, dtAll: DataFrame,
                      queryTerms: DataFrame, k: Int,
                      alsoRelease: Seq[DataFrame] = Nil): DataFrame = {
    require(k > 0, s"k ($k) must be > 0")
    // blank terms are dropped, matching docTermTf's term <> ''
    // contract — otherwise an empty-string "term" would match the
    // blank-token entries empty docs tokenize to
    val qt = queryTerms.select(col("query_id"),
        lower(col("term")).as("term")).distinct()
      .filter(col("term") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termSet = qt.select(col("term")).distinct()
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val dt0 = dtAll
      .join(broadcast(termSet), "term")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfTbl = dt0.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = dt0.join(broadcast(dfTbl), "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(n))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr(s"tf * ($idfWeightExpr)")).as("score"))
    val out = graft.operators.Similarity.rankTopK(
      scored.select(col("query_id"),
        col("doc_id").as("neighbor_id"),
        col("score").cast("double").as("sim")), k)
    Dedup.releaseAfterAll(out, (Seq(qt, dt0) ++ alsoRelease): _*)
  }
}
