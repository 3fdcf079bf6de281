package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableHash._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All pure Catalyst
  * expressions (regexp_count / length arithmetic) — they run at scan
  * speed inside whole-stage codegen, and each has an exact DuckDB oracle.
  */
object TextAnalysis {

  /** FastText-style hashed linear classifier — the SERVING path of a
    * trained quality/topic classifier (Joulin et al. 2016, "Bag of Tricks
    * for Efficient Text Classification"); the reference pipeline has no
    * classifier stage, but corpus curation at 100 TB does (CCNet /
    * FineWeb-Edu-style quality filtering). Features are the word unigrams
    * plus word bigrams of the normalized text (multiset, as fastText
    * sums them), hashed into `weights.length` buckets (the hashing
    * trick); the document score is the mean bucket weight. `weights` IS
    * the model artifact: training happens offline on a sample with any
    * trainer, and the learned vector is what ships — supplied as integer
    * weights (fixed-point, so sums are exact and cross-engine
    * reproducible; scale fractional weights by 1000 upstream).
    *
    * Scale shape: a ZERO-exchange codegen projection — the weight vector
    * rides the plan as a literal array (the tokenizer-vocab pattern),
    * features never leave their row, no shuffle at any corpus size.
    * Emits `(<id>, n_feats, raw_score, score, keep)` with
    * `keep = score >= threshold`.
    */
  def hashedClassifierScore(docs: DataFrame, idCol: String, textCol: String,
                            weights: Seq[Int], threshold: Double = 0.0)
      : DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    // single-pass codegen kernel (no feature-array materialization, no
    // per-feature interpreted md5 chain) — semantics identical to the
    // composed concat(unigrams, bigrams) + hash-bucket-sum form, which
    // remains the shape of the DuckDB oracle
    docs.select(col(idCol),
        graft.functions.HashedBagScore.score(col(textCol), weights)
          .as("__s"))
      .select(col(idCol),
        col("__s").getField("n_feats").as("n_feats"),
        col("__s").getField("raw_score").as("raw_score"))
      .withColumn("score", col("raw_score").cast("double") /
        greatest(col("n_feats"), lit(1L)).cast("double"))
      .withColumn("keep", col("score") >= threshold)
  }

  /** Count-based trainer for [[hashedClassifierScore]] — the piece that
    * closes the quality-classifier loop INSIDE the engine (the serving
    * path above ships externally-trained weights; curation practice
    * trains on labeled slices of the corpus itself, CCNet/FineWeb-Edu
    * style). Features are the scorer's, verbatim (word unigrams + word
    * bigrams, multiset, hashed into `dim` buckets), labels come from
    * `labelCol` (e.g. `col("source") === "wiki"` for
    * "target-domain-like"). Each bucket's weight is its smoothed
    * class posterior in fixed point, centered at zero:
    * `w = (2*scale*(pos+1)) div (pos+neg+2) - scale` — the
    * posterior-mean flavor of naive Bayes (per-feature P(pos|f),
    * averaged by the scorer), kept in EXACT integer arithmetic so the
    * learned weights are bit-reproducible cross-engine (a log-odds
    * formulation would ride on ln(), whose last ulp differs across
    * libms). Unseen buckets score 0 (= posterior 1/2, uninformative).
    *
    * Scale shape: one map-side-partial groupBy over (bucket) — the
    * shuffle carries at most `dim` rows per task; the trained table is
    * a `dim`-row model artifact. [[nbWeightsArray]] collects it for the
    * scorer's literal-array serving path.
    */
  def nbTrainHashed(docs: DataFrame, label: Column, textCol: String,
                    dim: Int, scale: Long = 1000L): DataFrame = {
    require(dim > 0 && scale > 0, "dim and scale must be positive")
    val uni = split(trim(lower(col(textCol))), "\\s+")
    val bi = Dedup.shingles(col(textCol), 2)
    docs.select(label.as("__pos"), concat(uni, bi).as("__f"))
      .select(col("__pos"), explode(col("__f")).as("f"))
      .select(col("__pos"), (hash60(col("f")) % dim).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("pos_n"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("neg_n"))
      .transform(withNbWeight(_, scale))
  }

  /** The fixed-point posterior weight from (pos_n, neg_n) counts —
    * shared by the batch trainer and the streaming count-maintenance
    * twin (counts are additive, so the maintained table re-derives
    * weights identical to a full retrain).
    */
  def withNbWeight(counts: DataFrame, scale: Long = 1000L): DataFrame =
    counts.withColumn("weight",
      expr(s"(2 * $scale * (pos_n + 1)) div (pos_n + neg_n + 2)")
        - lit(scale))

  /** The classifier as a SCAN PREDICATE — the shape curation pipelines
    * compose (the round-12 finding: filter stages should be predicates,
    * not keep-list joins). `minScore` is an integer score bound applied
    * exactly: `raw >= minScore * n_feats` is the integer form of
    * `score >= minScore` with no float comparison at the boundary.
    */
  def classifierKeep(text: Column, weights: Seq[Int],
                     minScore: Long): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    val s = graft.functions.HashedBagScore.score(text, weights)
    s.getField("raw_score") >= lit(minScore) * s.getField("n_feats")
  }

  /** The trained model as the scorer's literal weight vector: bucket ->
    * weight, unseen buckets 0. A `dim`-int driver artifact (the
    * PQ-codebook/vocab pattern), NOT corpus-sized data.
    */
  def nbWeightsArray(trained: DataFrame, dim: Int): Seq[Int] = {
    val m = trained.select(col("bucket"), col("weight")).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1).toInt).toMap
    (0 until dim).map(b => m.getOrElse(b, 0))
  }

  /** Stopword marker lists per language for the n-gram/stopword heuristic
    * language identifier. Public knowledge (common function words).
    */
  val StopwordPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|in|that|with)\\b",
    "de" -> "\\b(der|die|und|das|ist|nicht|ein|mit)\\b",
    "es" -> "\\b(el|la|de|que|y|los|una|por)\\b",
    "fr" -> "\\b(le|la|les|et|des|est|une|dans)\\b")

  val CjkPattern = "[\\x{4e00}-\\x{9fff}]"

  /** Word lists backing the patterns above (same tokens), consumed by the
    * one-pass [[graft.functions.TokenSetCounts]] counter.
    */
  val StopwordLists: Seq[(String, Seq[String])] = StopwordPatterns.map {
    case (lang, p) =>
      lang -> p.stripPrefix("\\b(").stripSuffix(")\\b").split('|').toSeq
  }

  /** Predicted language: CJK characters -> zh; otherwise the language with
    * the highest stopword-hit count (ties broken by list order above;
    * no hits at all -> "und" for undetermined). Counting is a single
    * tokenize pass (TokenSetCounts) — semantically identical to the
    * regexp_count formulation the DuckDB oracle uses, minus the per-row
    * regex-engine cost.
    */
  def langId(text: Column): Column = {
    import graft.functions.TextCounters
    val counts = TextCounters.tokenSetCounts(lower(text),
      StopwordLists.map(_._2))
    val cs = StopwordLists.map(_._1).zipWithIndex.map {
      case (lang, i) => lang -> counts.getItem(i)
    }
    val best = cs.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = cs.reverse.foldLeft(lit("und")) { case (acc, (lang, c)) =>
      when(c === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(TextCounters.charClassCounts(text).getItem(1) > 0, lit("zh"))
      .otherwise(pick)
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token estimate: word-piece + punctuation split
    * (`\w+` runs count 1 per ceil(len/4) chars, punctuation chars count 1
    * each) — a deterministic, cluster-cheap stand-in for a real tokenizer.
    */
  def bpeTokenEstimate(text: Column): Column = {
    val punct = graft.functions.TextCounters.charClassCounts(text).getItem(0)
    // sum over words of ceil(len/4): total word chars/4 rounded up per word
    val words = filter(split(lower(text), "[^\\w]+"), w => length(w) > 0)
    val wordTokens = aggregate(
      transform(words, w => ((length(w) + 3) / 4).cast("long")),
      lit(0L), (acc, x) => acc + x)
    (wordTokens + punct).cast("long")
  }

  /** Quality-score components and composite, mirroring the classic
    * pre-training quality filters (length / punctuation density / stopword
    * density). Composite in [0,1]; deterministic arithmetic only.
    */
  /** Scrub common PII patterns from free text — the corpus-prep
    * counterpart of the column-level masking transforms
    * ([[graft.transform.Masking]] handles structured columns; this
    * handles PII embedded INSIDE a text/document column). Emails, URLs
    * with credentials or query strings, bare IPv4s, and long digit runs
    * (phone/card shaped) are replaced with stable tags so token counts
    * stay sane and the text remains trainable. Pure `regexp_replace`
    * chain — codegen'd, order-sensitive (emails before bare domains is
    * not attempted; URL first so its userinfo never half-matches email).
    */
  def scrubPii(text: Column): Column = {
    val url = regexp_replace(text,
      "(?i)\\bhttps?://[^\\s]+", "<URL>")
    val email = regexp_replace(url,
      "(?i)\\b[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}\\b", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
    // phone/card shaped = at least 9 ACTUAL digits (8 repeats + final),
    // each digit followed by at most 3 separator chars. Counting digits
    // rather than total run length keeps ISO dates (8 digits), dotted
    // versions, and numeric ranges out of the scrub — a "2024-01-01"
    // must not become <NUMBER> in training text.
    regexp_replace(ip, "(?<!\\w)\\+?(?:\\d[ ()+.-]{0,3}){8,}\\d\\b",
      "<NUMBER>")
  }

  /** Extract readable text from raw HTML — the crawl-ingest front door
    * (WET-style extraction): drops script/style payloads and comments,
    * turns block-closing tags into newlines (so words across paragraph
    * boundaries never fuse), strips remaining markup, decodes the six
    * ubiquitous entities (`&amp;` LAST so `&amp;lt;` cannot
    * double-decode), and collapses whitespace. Deliberately a pure
    * `regexp_replace`/`replace` chain: codegen'd, zero-shuffle, and the
    * IDENTICAL chain runs in the DuckDB oracle (patterns restricted to
    * the Java∩RE2 common subset — no backreferences, no lookbehind).
    * A heuristic extractor by design — malformed nesting degrades
    * gracefully (identically in both engines), which is the honest
    * contract for crawl data; DOM-accurate extraction needs a parser
    * the 100 TB hot path cannot afford per row.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)<(br|/p|/div|/li|/tr|/h[1-6]|/blockquote|/pre)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** URL decomposition for crawl corpora — host, registrable domain,
    * and path as plain regex extractions (Java∩RE2 subset, identical in
    * the oracle). `domain` is the last-two-labels heuristic: correct
    * for generic TLDs, one label short on ccSLDs like `co.uk` — the
    * honest scan-speed contract without shipping the public-suffix
    * list as a data dependency (a production deployment broadcasts the
    * PSL and maps hosts through it; the grouping machinery downstream —
    * [[Sampling.capPerGroup]] on `domain` — is unchanged either way).
    * Hosts lowercase (DNS case-insensitivity); userinfo and port are
    * excluded from the host.
    */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

  def urlDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([^.]+\\.[^.]+)$", 1)

  def urlPath(url: Column): Column =
    regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Fraction of repeated word k-grams in [0,1] — the boilerplate /
    * spam / template-page signal pre-training filters cut on
    * (0 = all shingles unique, →1 = the same phrase over and over).
    * `1 - distinct/total` in plain double arithmetic so the oracle SQL
    * is bit-identical.
    */
  def repetitionRatio(text: Column, k: Int = 3): Column = {
    val sh = graft.functions.TextShingles.wordShingles(text, k)
    val total = size(sh).cast("double")
    when(total <= 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(sh)).cast("double") / total)
  }

  def qualityScore(text: Column): Column = {
    import graft.functions.TextCounters
    val nChars = length(text).cast("double")
    val nWords = wsTokenCount(text).cast("double")
    val meanWordLen = nChars / greatest(nWords, lit(1.0))
    val punctRatio = TextCounters.charClassCounts(text).getItem(0)
      .cast("double") / greatest(nChars, lit(1.0))
    val stopRatio = TextCounters.tokenSetCounts(lower(text),
      Seq(StopwordLists.head._2)).getItem(0).cast("double") /
      greatest(nWords, lit(1.0))
    val lenOk = when(nChars >= 100 && nChars <= 20000, 1.0).otherwise(0.5)
    val wordLenOk = when(meanWordLen >= 3 && meanWordLen <= 12, 1.0)
      .otherwise(0.5)
    val punctOk = when(punctRatio <= 0.2, 1.0).otherwise(0.5)
    // plain left-associated double arithmetic — the oracle SQL mirrors the
    // exact expression tree, so the doubles are bit-identical (no rounding)
    lenOk * 0.4 + wordLenOk * 0.3 + punctOk * 0.2 +
      least(stopRatio * lit(2.0), lit(1.0)) * 0.1
  }

  /** Order-independent document fingerprint: XOR-aggregate of
    * position-salted word hashes (rolling-hash analogue that stays
    * commutative, hence shuffle-friendly: map-side partial XOR).
    */
  /** Deduplication-oriented text normalization (the CCNet-style pre-hash
    * canonicalization): lowercase, strip punctuation/symbols (keep
    * letters, digits, whitespace), collapse whitespace runs to single
    * spaces, trim. Two near-identical documents differing only in
    * casing/punctuation/spacing normalize to the same string, so
    * `Dedup.exact(docs.withColumn("text", normalizeForHash(col("text"))))`
    * catches them. Pure codegen'd regexp expressions — runs at scan
    * speed; apply once and reuse for every downstream hash.
    */
  def normalizeForHash(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]+", " "),
      "\\s+", " "))

  /** Corpus-wide top-N most frequent word k-grams — the vocabulary /
    * boilerplate-phrase report curation teams pull before writing filter
    * rules (and the raw input to BPE-style merge induction). Counts gram
    * INSTANCES (term frequency, not document frequency), totally ordered
    * by `(count desc, gram asc)` so the cut is deterministic.
    *
    * Scale shape: map-side partial counts -> one exchange on the gram ->
    * final counts, then `orderBy(...).limit(n)` compiles to
    * TakeOrderedAndProject — per-partition bounded heaps and a single
    * driver merge of n-row partials, NO global sort of the gram table.
    */
  def topNgrams(docs: DataFrame, textCol: String, k: Int = 3,
                topN: Int = 100): DataFrame =
    docs.select(explode(
        graft.functions.TextShingles.wordShingles(col(textCol), k))
        .as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(topN)

  /** Corpus-relative bigram rarity — the exact-arithmetic stand-in for a
    * perplexity filter: per document, over its DISTINCT word bigrams,
    * report how many are corpus-unique (`n_hapax`, document frequency 1)
    * and the mean document frequency (`mean_df`). Low `mean_df` / high
    * hapax fraction flags novel-or-noisy text; very high `mean_df` flags
    * boilerplate — the two tails pre-training filters cut. Chosen over a
    * log-prob LM score because every statistic here is integer counting
    * plus ONE final division of exact longs, so the result is
    * bit-identical across engines (float log-sums are summation-order
    * dependent and cannot be oracle-hashed).
    *
    * Scale shape (r21, the [[TextSearch.tfidfKeywords]] df-table
    * pattern): document frequency is `groupBy(h).count` + a join back —
    * NOT a count window over the hash partitioning. The window
    * formulation co-locates every instance of a bigram on one reducer
    * with no partial aggregation, so a stopword bigram ("of the": a
    * constant fraction of any natural corpus) is a one-reducer funnel
    * at 100 TB; the groupBy gets map-side combine (the df table shrinks
    * to |distinct grams| rows before its exchange), AQE broadcasts it
    * when small and skew-splits the join when it isn't — a window can
    * do neither. The instance stream is persisted for its two consumers
    * (df aggregate + join back; the planner never reuses the subtree)
    * and released with the result. Hash collisions merge gram counts
    * identically in both engines. Documents with fewer than two words
    * have no bigrams and are absent from the output (consistently in
    * both engines).
    */
  def bigramRarity(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val inst = docs.select(col(idCol),
        explode(array_distinct(
          graft.functions.TextShingles.wordShingles(col(textCol), 2)))
          .as("g"))
      .select(col(idCol), hash60(col("g")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfTbl = inst.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val out = inst.join(dfTbl, "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"),
        (sum(col("df")).cast("double") / count(lit(1))).as("mean_df"))
    Dedup.releaseAfter(out, inst)
  }

  def fingerprint(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val words = docs.select(col(idCol),
      posexplode(split(trim(lower(col(textCol))), "\\s+"))
        .as(Seq("pos", "w")))
    words.groupBy(col(idCol)).agg(
      bit_xor(hash60(concat_ws("#", col("pos"), col("w"))))
        .as("fingerprint"))
  }

  /** Default thresholds for [[gopherRules]] — the word-level subset of
    * the Gopher/MassiveText repetition-and-quality filter family (Rae et
    * al. 2021, arXiv:2112.11446 Table A1). Kept as named constants so the
    * DuckDB oracle SQL is generated from the SAME numbers.
    */
  object GopherDefaults {
    val MinWords = 50
    val MaxWords = 100000
    val MinMeanWordLen = 3.0
    val MaxMeanWordLen = 10.0
    val MinAlphaWordFrac = 0.8
    val MinStopwordHits = 2
  }

  /** Gopher-style document quality rules (word-level subset): per-doc
    * metrics plus the composite `keep` verdict. Rules applied:
    *
    *  - word count within `[minWords, maxWords]`;
    *  - mean word length within `[minMeanWordLen, maxMeanWordLen]`;
    *  - fraction of words containing at least one ASCII letter
    *    >= `minAlphaWordFrac`;
    *  - at least `minStopwordHits` English-stopword occurrences (the
    *    "contains real sentences" proxy).
    *
    * The line-shape rules of the original (bullet-prefix and
    * ellipsis-suffix line fractions) belong to line-structured corpora;
    * they compose the same way (`split("\n")` + the same fraction
    * arithmetic) and are omitted here rather than faked on single-line
    * input. Mean word length divides total non-whitespace characters by
    * the word count — one subtraction and one division of exact longs, so
    * the doubles hash-match the oracle.
    *
    * All metrics are single-pass codegen'd expressions over the text
    * column — the report runs at scan speed; no shuffle at all (the
    * output is row-per-document, same partitioning as the input).
    */
  /** The four word-level metric expressions behind [[gopherRules]] /
    * [[gopherKeep]]: (n_words, mean_word_len, alpha_word_frac,
    * stopword_hits), all stateless Column expressions.
    */
  private def gopherMetrics(text: Column)
      : (Column, Column, Column, Column) = {
    import graft.functions.TextCounters
    // one-pass [n_words, non_ws_chars, alpha_words] — semantically equal
    // to split/regexp_replace/rlike (the formulation the DuckDB oracle
    // uses) at a third of the string passes and zero array allocations
    val st = TextCounters.wordStats(text)
    val nWords = st.getItem(0)
    val meanWordLen = st.getItem(1).cast("double") /
      greatest(nWords, lit(1L)).cast("double")
    val alphaFrac = st.getItem(2).cast("double") /
      greatest(nWords, lit(1L)).cast("double")
    val stopHits = TextCounters.tokenSetCounts(lower(trim(text)),
      Seq(StopwordLists.head._2)).getItem(0).cast("long")
    (nWords, meanWordLen, alphaFrac, stopHits)
  }

  /** Composite Gopher keep verdict as a single boolean Column —
    * streaming-safe (stateless), so the same batch-verified rule set
    * gates a `readStream` (see
    * [[graft.streaming.StreamingCurate]]).
    */
  def gopherKeep(text: Column,
                 minWords: Int = GopherDefaults.MinWords,
                 maxWords: Int = GopherDefaults.MaxWords,
                 minMeanWordLen: Double = GopherDefaults.MinMeanWordLen,
                 maxMeanWordLen: Double = GopherDefaults.MaxMeanWordLen,
                 minAlphaWordFrac: Double = GopherDefaults.MinAlphaWordFrac,
                 minStopwordHits: Int = GopherDefaults.MinStopwordHits)
      : Column = {
    val (nWords, meanWordLen, alphaFrac, stopHits) = gopherMetrics(text)
    nWords >= minWords && nWords <= maxWords &&
      meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen &&
      alphaFrac >= minAlphaWordFrac && stopHits >= minStopwordHits
  }

  /** Single-pass curation-funnel audit: survivor counts of the staged
    * lang → Gopher → repetition → quality filter chain as ONE conditional
    * aggregation over ONE corpus scan. Running the four filters as
    * separate jobs to get per-stage attrition (the number every curation
    * report leads with) would scan the corpus four times; here each
    * stage's predicate is ANDed cumulatively into a `sum(when(...))`
    * column, so at 100 TB the audit costs exactly one scan and a
    * single-row exchange. Emits one row:
    * `(n_total, n_lang, n_gopher, n_repetition, n_quality, keep_frac)`.
    */
  def filterFunnel(docs: DataFrame, textCol: String, lang: String = "en",
                   minWords: Int = GopherDefaults.MinWords,
                   maxRepetition: Double = 0.2, minQuality: Double = 0.6)
      : DataFrame = {
    val t = col(textCol)
    val s1 = langId(t) === lang
    val s2 = s1 && gopherKeep(t, minWords = minWords)
    val s3 = s2 && (repetitionRatio(t) <= maxRepetition)
    val s4 = s3 && (qualityScore(t) >= minQuality)
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    docs.agg(count(lit(1)).as("n_total"),
        cnt(s1).as("n_lang"), cnt(s2).as("n_gopher"),
        cnt(s3).as("n_repetition"), cnt(s4).as("n_quality"))
      .withColumn("keep_frac", col("n_quality").cast("double") /
        greatest(col("n_total"), lit(1L)).cast("double"))
  }

  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = GopherDefaults.MinWords,
                  maxWords: Int = GopherDefaults.MaxWords,
                  minMeanWordLen: Double = GopherDefaults.MinMeanWordLen,
                  maxMeanWordLen: Double = GopherDefaults.MaxMeanWordLen,
                  minAlphaWordFrac: Double =
                    GopherDefaults.MinAlphaWordFrac,
                  minStopwordHits: Int = GopherDefaults.MinStopwordHits)
      : DataFrame = {
    val (nWords, meanWordLen, alphaFrac, stopHits) =
      gopherMetrics(col(textCol))
    docs.select(col(idCol),
      nWords.as("n_words"),
      meanWordLen.as("mean_word_len"),
      alphaFrac.as("alpha_word_frac"),
      stopHits.as("stopword_hits"),
      gopherKeep(col(textCol), minWords, maxWords, minMeanWordLen,
        maxMeanWordLen, minAlphaWordFrac, minStopwordHits).as("keep"))
  }

  /** Out-of-vocabulary rate against a learned top-N vocabulary — the
    * UNK-rate report that predicts tokenizer coverage: the vocabulary is
    * the corpus's `vocabSize` most frequent words (ties broken
    * lexicographically, same total order as [[topNgrams]]), and each
    * document reports what fraction of its token instances fall outside
    * it. Emits `(id, n_tokens, oov_tokens, oov_rate)`.
    *
    * Scale shape: the vocabulary is TakeOrderedAndProject over map-side
    * partial counts (never a global sort) and is broadcast to the
    * instance scan — one corpus-sized exchange for the word counts, a
    * broadcast-hash probe for the tagging, map-side partial rollup per
    * doc.
    */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize ($vocabSize) must be positive")
    val inst = wordInstances(docs, textCol, Seq(col(idCol)))
    val vocab = topUnits(inst, "__w", vocabSize)
      .select(col("__w"), lit(true).as("__in_vocab"))
    inst.join(broadcast(vocab), Seq("__w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count_if(col("__in_vocab").isNull).as("oov_tokens"))
      .withColumn("oov_rate",
        col("oov_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** Train a BPE-style unit vocabulary: the `vocabSize` most frequent
    * units among whole words UNION overlapping character bigrams (counted
    * per word instance), ties broken lexicographically — frequent words
    * tokenize whole, everything else falls back to learned bigram pieces
    * then single-char UNKs (see [[graft.functions.GreedyTokenCount]]).
    *
    * Scale shape: unit counting is ONE corpus-sized exchange with
    * map-side partial aggregation, then TakeOrderedAndProject — never a
    * global sort. The returned vocab is a bounded model artifact
    * (`vocabSize` strings) collected to the driver, exactly like IVF
    * centroids: train once, encode any number of batches.
    */
  def trainUnitVocab(docs: DataFrame, textCol: String,
                     vocabSize: Int): Array[String] =
    trainUnitVocabDf(docs, textCol, vocabSize)
      .collect().map(_.getString(0))

  /** The training plan behind [[trainUnitVocab]], exposed so specs can
    * assert its shape (TakeOrderedAndProject over partial counts — never
    * a global sort).
    */
  private[graft] def trainUnitVocabDf(docs: DataFrame, textCol: String,
                                      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize ($vocabSize) must be positive")
    val inst = wordInstances(docs, textCol)
    val units = inst.filter(col("__w") =!= "")
      .select(col("__w").as("__u"))
      .unionAll(inst.filter(length(col("__w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(__w) - 1)," +
            " i -> substring(__w, i, 2))")).as("__u")))
    topUnits(units, "__u", vocabSize).select(col("__u"))
  }

  /** Word instances `__w` of a text column — THE tokenization contract
    * (lowercase, trim, whitespace split) every frequency consumer
    * ([[oovRate]]'s vocab, [[trainUnitVocabDf]], [[trainBpeUnits]]'s
    * word table) shares, so a semantics tweak lands everywhere at once
    * and cross-engine oracle parity cannot silently diverge per copy.
    */
  private def wordInstances(docs: DataFrame, textCol: String,
                            keep: Seq[Column] = Nil): DataFrame =
    docs.select(keep :+
      explode(split(trim(lower(col(textCol))), "\\s+")).as("__w"): _*)

  /** The shared top-N frequency selection: count per unit, total order
    * (count desc, unit asc), deterministic LIMIT — plans as map-side
    * partials + TakeOrderedAndProject, never a global sort.
    */
  private def topUnits(units: DataFrame, unitCol: String,
                       n: Int): DataFrame =
    units.groupBy(col(unitCol)).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col(unitCol).asc)
      .limit(n)

  /** Byte-pair-encoding merge training (Sennrich et al. 2016,
    * "Neural Machine Translation of Rare Words with Subword Units") over
    * the corpus word-frequency table. The distributed half is the word
    * count — one exchange + TakeOrderedAndProject to the top `maxWords`
    * types, exactly the frequency dict the standard BPE trainer
    * consumes; the merge loop then runs driver-side over that bounded
    * artifact (O(maxWords · merges), a model-training step like k-means
    * centroids or [[trainUnitVocab]], never data-sized). Deterministic:
    * the word list orders (count desc, word asc) and each round's pair
    * argmax breaks ties (count desc, pair lexicographic asc).
    *
    * Returns the unit vocabulary — every character of the retained
    * words plus one merged unit per round — for the greedy
    * longest-match encoder ([[vocabTokenCounts]] / GreedyTokenIds):
    * greedy segmentation over BPE-trained units is the WordPiece-style
    * serving path, so the ENCODE stays the same zero-exchange,
    * oracle-verified expression regardless of how the vocab was
    * trained. (The merge loop itself is not SQL-replayable, which is
    * why the trainer is spec-verified rather than oracle-verified.)
    */
  def trainBpeUnits(docs: DataFrame, textCol: String,
                    maxWords: Int, merges: Int): Seq[String] = {
    require(maxWords > 0 && merges >= 0,
      s"maxWords ($maxWords) must be positive, merges ($merges) >= 0")
    val wordCounts = topUnits(
        wordInstances(docs, textCol).filter(col("__w") =!= ""),
        "__w", maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val units = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach { case (syms, _) => syms.foreach(units += _) }
    var round = 0
    var exhausted = false
    while (round < merges && !exhausted) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val (a, b) = pairCounts.toSeq
          .minBy { case ((x, y), n) => (-n, x, y) }._1
        val merged = a + b
        units += merged
        words = words.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, n)
        }
        round += 1
      }
    }
    units.toSeq
  }

  /** Token counts under a learned vocabulary ([[trainUnitVocab]]):
    * `(id, n_words, n_tokens)` where `n_tokens` is greedy longest-match
    * segmentation against `vocab` — the REAL token budget for
    * [[Sampling.mixturePlan]] / [[Sampling.packPlan]] /
    * [[Sampling.sqrtTemperatureRates]], replacing the whitespace
    * heuristic.
    *
    * Scale shape: a ZERO-exchange codegen-adjacent projection — the vocab
    * rides inside the expression (task-serialized once), so the corpus is
    * scanned exactly once with no join or shuffle (plan-asserted in
    * TextAnalysisSpec).
    */
  def vocabTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                       vocab: Seq[String]): DataFrame =
    docs.select(col(idCol),
      wsTokenCount(col(textCol)).cast("long").as("n_words"),
      graft.functions.GreedyTokenCount.tokenCount(col(textCol), vocab)
        .as("n_tokens"))

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169) with
    * EXACT integer arithmetic: each document is scored by how much its
    * unigrams look like a target slice of the corpus. For every token
    * instance, `contrib = (target_count * scale) div corpus_count` (the
    * scaled target/raw frequency ratio — DSIR's log-ratio replaced by the
    * plain ratio so both engines compute bit-identical BIGINTs); the
    * document score is the sum over its token instances. Emits
    * `(id, n_tokens, dsir_score)` — rank or threshold on
    * `dsir_score / n_tokens` to select target-like documents.
    *
    * Scale shape: same as [[bigramRarity]] (r21, the
    * [[TextSearch.tfidfKeywords]] df-table pattern) — the per-token
    * corpus/target counts are `groupBy(hash)` + a join back, NOT a
    * window over the hash partitioning: a stopword's window partition
    * ("the": several percent of all English token instances) is a
    * one-reducer funnel at 100 TB, while the groupBy partial-aggregates
    * map-side (the count table shrinks to |vocab| rows before its
    * exchange), AQE broadcasts it when small and skew-splits the join
    * when it isn't. The instance stream is persisted for its two
    * consumers and released with the result.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, scale: Long = 10000L)
      : DataFrame = {
    require(scale > 0, s"scale ($scale) must be positive")
    val inst = docs.select(col(idCol), isTarget.as("__t"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("__w"))
      .select(col(idCol), col("__t"), hash60(col("__w")).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnts = inst.groupBy(col("__h"))
      .agg(count(lit(1)).as("__rw"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__tw"))
    val out = inst.join(cnts, "__h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(expr(s"(__tw * CAST($scale AS BIGINT)) div __rw"))
          .as("dsir_score"))
    Dedup.releaseAfter(out, inst)
  }

  /** Vocabulary drift between two corpus versions: the top-N k-gram
    * lists of each side (instance counts, [[topNgrams]]' total order)
    * full-outer joined on the gram. A NULL `old_rank` means the gram
    * ENTERED the top-N, a NULL `new_rank` means it left — the cheap
    * distribution-shift alarm a recrawl/refresh pipeline checks before
    * re-mixing sources ([[graft.operators.CorpusDiff]] reports row
    * drift; this reports content drift).
    *
    * Scale shape: two [[topNgrams]] passes (map-side partial counts +
    * TakeOrderedAndProject, no global sort); ranks come from
    * [[BoundedRank.packedIndex]] over the two bounded top-N frames (no
    * partition-less WindowExec anywhere); the final join is
    * topN×topN-bounded.
    * Emits `(gram, old_rank, new_rank, old_n, new_n)`.
    */
  def vocabDrift(oldDocs: DataFrame, newDocs: DataFrame, textCol: String,
                 k: Int = 3, topN: Int = 100): DataFrame = {
    // rank 1..N in (n desc, gram asc) order: negate n so the packed
    // ascending sort yields the descending-count total order
    def ranked(df: DataFrame, side: String) =
      BoundedRank.packedIndex(topNgrams(df, textCol, k, topN),
          Seq(-col("n_occurrences"), col("gram")),
          Seq("gram" -> col("gram"), "__n" -> col("n_occurrences")),
          "__idx")
        .select(col("gram"), (col("__idx") + 1).as(s"${side}_rank"),
          col("__n").as(s"${side}_n"))
    ranked(oldDocs, "old")
      .join(ranked(newDocs, "new"), Seq("gram"), "full_outer")
      .select(col("gram"), col("old_rank"), col("new_rank"),
        col("old_n"), col("new_n"))
  }
}
