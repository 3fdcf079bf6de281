package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import graft.functions.StableHash

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * At 100 TB, RNG-based sampling (`df.sample`) is the wrong tool for
  * corpus prep: membership changes across runs, partitionings, and Spark
  * versions, so train/test contamination can't be audited. Hash-based
  * assignment is reproducible everywhere (the same [[StableHash]] the
  * dedup family uses — md5-derived, identical in DuckDB, so every split
  * is oracle-checkable), stable under corpus growth (a document's split
  * never changes when other documents arrive), and embarrassingly
  * parallel (a codegen'd projection; no shuffle, no state).
  *
  * The reference has no sampling surface (replication engine); these are
  * engine-level operators for the training-data north star.
  */
object Sampling {

  /** Granularity of the hash bucket space. 10k buckets = 0.01%
    * resolution, plenty for split fractions while keeping the modulus
    * exact in both engines' integer arithmetic.
    */
  val Buckets = 10000L

  /** Hash bucket in [0, Buckets) for a key column. The key goes through
    * an explicit string cast so numeric keys hash their decimal text in
    * BOTH engines (Spark's binary cast of a long is its 8-byte encoding,
    * which DuckDB's md5-of-varchar would never see).
    */
  def bucket(key: Column): Column =
    pmod(StableHash.hash60(key.cast("string")), lit(Buckets))

  /** DuckDB fragment equivalent to [[bucket]] (hash60 is non-negative,
    * so plain % matches pmod).
    */
  def bucketSql(expr: String): String =
    s"(${StableHash.hash60Sql(s"CAST($expr AS VARCHAR)")} % ${Buckets})"

  /** Assign each row to a named split by hash range — e.g.
    * `Seq("train" -> 0.98, "valid" -> 0.01, "test" -> 0.01)`. Fractions
    * must sum to 1 (± one bucket of rounding; the last split absorbs the
    * remainder). Adds a `split` column.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Buckets)
    }.tail
    val b = bucket(col(keyCol))
    val expr = splits.init.zip(bounds.init).reverse.foldLeft(
      lit(splits.last._1): Column) { case (rest, ((name, _), hi)) =>
      when(b < hi, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Split documents by their NEAR-DUP CLUSTER instead of their own id —
    * the remedy for what `split_leakage_audit` measures: a per-doc hash
    * split cannot keep near-duplicates on one side of the train/test
    * boundary (near-dups hash independently), so eval examples leak
    * into training via their paraphrases. Keying the split on the
    * connected-component representative
    * ([[graft.operators.Dedup.connectedComponents]] output `(id,
    * component_id)`; unpaired docs represent themselves) puts every
    * member of a cluster in the SAME split by construction.
    *
    * Scale shape: one left join of docs against the (pairs-sized, much
    * smaller than corpus) label table, then the usual zero-shuffle
    * bucket projection. Same determinism/growth-stability contract as
    * [[hashSplit]] — with the one caveat that a NEW pair merging two
    * clusters can move a cluster's split between corpus versions; that
    * is inherent to leak-safety (the alternative IS the leak) and
    * `corpus_snapshot_diff` makes the movement visible.
    */
  def clusterSafeSplit(docs: DataFrame, idCol: String, labels: DataFrame,
                       splits: Seq[(String, Double)]): DataFrame = {
    val rep = docs
      .join(labels.select(col("id").as(idCol), col("component_id")),
        Seq(idCol), "left")
      .withColumn("component_rep",
        coalesce(col("component_id"), col(idCol).cast("long")))
      .drop("component_id")
    hashSplit(rep, "component_rep", splits)
  }

  /** Keep a per-stratum fraction of rows, deterministically: a row
    * survives iff its key bucket falls below `fraction(stratum) *
    * Buckets`. Unlisted strata default to `defaultFraction`.
    */
  /** Source-mixture sampling plan: given relative target weights per
    * source, compute the largest corpus achievable WITHOUT upsampling —
    * token budget `B = min_s(tokens_s / w_s)` — and each source's
    * deterministic keep-rate `w_s * B / tokens_s` (1.0 for the binding
    * source, lower for over-represented ones). Feed the rates into
    * [[stratifiedSampleByHash]] to materialize the mixture.
    *
    * ONE aggregate pass over the corpus (map-side combinable groupBy on
    * the source column); the budget min is a 1-row aggregate over the
    * reduced per-source frame, broadcast back onto it — no global
    * window, no collect, no second corpus scan, and no single-partition
    * stage even if source cardinality grows to millions of domains.
    * Sources absent from `weights` are excluded.
    */
  def mixturePlan(docs: DataFrame, sourceCol: String, textCol: String,
                  weights: Map[String, Double],
                  tokensCol: Option[Column] = None): DataFrame = {
    // budgets default to whitespace counts; pass a learned-tokenizer
    // column (TextAnalysis.vocabTokenCounts / GreedyTokenCount) to plan
    // on real token counts
    val tokens = tokensCol.getOrElse(
      size(split(trim(lower(col(textCol))), "\\s+"))).cast("long")
    val perSource = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens).as("n_tokens"))
    mixturePlanFromTotals(perSource, weights)
  }

  /** The arithmetic half of [[mixturePlan]] over already-reduced
    * per-source totals `(source, n_docs, n_tokens)` — the entry point
    * for continuously-maintained totals
    * ([[graft.streaming.StreamingSample]]), same seam as
    * [[epochPlanFromTotals]].
    */
  def mixturePlanFromTotals(perSource: DataFrame,
                            weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val w = weights.toSeq.sortBy(_._1).foldLeft(
      lit(null).cast("double")) { case (rest, (s, wt)) =>
      when(col("source") === s, lit(wt)).otherwise(rest)
    }
    val weighted = perSource.withColumn("weight", w)
      .filter(col("weight").isNotNull)
    val budget = weighted.agg(
      min(col("n_tokens").cast("double") / col("weight")).as("budget"))
    weighted.crossJoin(broadcast(budget))
      .withColumn("sample_rate",
        col("weight") * col("budget") / col("n_tokens").cast("double"))
      .drop("budget")
  }

  /** Temperature-2 ("square-root") source mixture: per-source keep rates
    * that flatten the source distribution toward `p^(1/2)` — the standard
    * multilingual/multi-source rebalance (sampling prob proportional to
    * `p^(1/tau)`, here the common tau = 2). Downsample-only, like
    * [[mixturePlan]]: kept tokens per source are proportional to
    * `sqrt(n_tokens)`, normalized so the SMALLEST source keeps
    * everything: `rate_s = sqrt(min_tokens / tokens_s)`. Emits
    * `(source, n_docs, n_tokens, sample_rate, expected_tokens)`; feed
    * the rates into [[stratifiedSampleByHash]].
    *
    * tau is fixed at 2 because `sqrt` and `/` are correctly-rounded IEEE
    * ops — the rates are bit-identical in any engine. General tau needs
    * `pow`, whose libm implementations differ by ulps across platforms
    * (same reason BM25/log scoring is excluded, docs/ROUND7.md).
    *
    * Same scale shape as [[mixturePlan]]: one map-side-combinable
    * aggregate pass, then a broadcast 1-row min over the per-source
    * frame (no global window anywhere).
    */
  def sqrtTemperatureRates(docs: DataFrame, sourceCol: String,
                           textCol: String,
                           tokensCol: Option[Column] = None): DataFrame = {
    val tokens = tokensCol.getOrElse(
      size(split(trim(lower(col(textCol))), "\\s+"))).cast("long")
    val perSource = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens).as("n_tokens"))
    perSource
      .crossJoin(broadcast(perSource.agg(
        min(col("n_tokens")).as("__min_tok"))))
      .withColumn("sample_rate",
        sqrt(col("__min_tok").cast("double") /
          col("n_tokens").cast("double")))
      .withColumn("expected_tokens",
        col("n_tokens").cast("double") * col("sample_rate"))
      .drop("__min_tok")
  }

  /** Token-budget epoch plan — the data-constrained side of mixture
    * planning (the regime of Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models"): [[mixturePlan]] downsamples big
    * sources to hit target weights; when the training BUDGET exceeds a
    * source's stock, the source must instead REPEAT. Given a total token
    * budget and per-source weight FRACTIONS (caller-normalized — they are
    * interpolated verbatim into both engines, so normalize upstream where
    * the arithmetic is deterministic), emits per source:
    * `target_tokens = floor(budget * weight)`,
    * `epochs = ceil(target / stock)` (integer ceil-div on exact long
    * sums — no float in the pass count), and `last_pass_frac`, the
    * consumed fraction of the final pass. Sources with no entry in
    * `weights` are dropped (weight-0 sources contribute nothing).
    *
    * Scale shape: one map-side-combinable aggregate down to |sources|
    * rows; everything after is arithmetic on the tiny frame.
    */
  def epochPlan(docs: DataFrame, sourceCol: String, textCol: String,
                budget: Long, weights: Map[String, Double],
                tokensCol: Option[Column] = None): DataFrame = {
    val tokens = tokensCol.getOrElse(
      size(split(trim(lower(col(textCol))), "\\s+"))).cast("long")
    val perSource = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens).as("n_tokens"))
    epochPlanFromTotals(perSource, budget, weights)
  }

  /** The arithmetic half of [[epochPlan]], over already-reduced
    * per-source totals `(source, n_docs, n_tokens)` — the entry point
    * for continuously-maintained totals
    * ([[graft.streaming.StreamingSample]]): the plan derives from the
    * maintained frame without re-scanning the corpus.
    */
  def epochPlanFromTotals(perSource: DataFrame, budget: Long,
                          weights: Map[String, Double]): DataFrame = {
    require(budget > 0, s"budget ($budget) must be positive")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val w = weights.toSeq.sortBy(_._1).foldLeft(
      lit(null).cast("double")) { case (rest, (s, wt)) =>
      when(col("source") === s, lit(wt)).otherwise(rest)
    }
    perSource.withColumn("weight", w)
      .filter(col("weight").isNotNull)
      .withColumn("target_tokens",
        floor(lit(budget).cast("double") * col("weight")).cast("long"))
      // integer ceil-div; operands are non-negative, so Spark's
      // truncating `div` equals floor division here (the DuckDB `//`
      // parity caveat from cohort_retention does not bite)
      .withColumn("epochs",
        expr("(target_tokens + n_tokens - 1) div n_tokens"))
      .withColumn("last_pass_frac",
        when(col("epochs") === 0, lit(0.0)).otherwise(
          (col("target_tokens") - (col("epochs") - 1) * col("n_tokens"))
            .cast("double") / col("n_tokens").cast("double")))
  }

  /** Score-proportional deterministic sampling: keep a row iff its hash
    * bucket falls below `rate * Buckets`, where `rate` is a PER-ROW
    * column in [0, 1] (a quality score, a DSIR weight mapped to a keep
    * probability, a per-source rate joined on). The hash-membership
    * trick of [[stratifiedSampleByHash]] generalized from per-stratum
    * constants to arbitrary row-level rates: reproducible, stable under
    * corpus growth, shuffle-free (a codegen'd filter on the scan).
    * Rates outside [0, 1] are clamped.
    */
  def sampleByRate(df: DataFrame, keyCol: String, rate: Column)
      : DataFrame = {
    val r = least(greatest(rate.cast("double"), lit(0.0)), lit(1.0))
    // round like stratifiedSampleByHash: threshold = round(rate * Buckets)
    df.filter(bucket(col(keyCol)) <
      round(r * Buckets).cast("long"))
  }

  /** Sequence-packing plan — the concat-and-chunk training-prep step:
    * documents are concatenated in a deterministic order and cut into
    * fixed `seqLen`-token training sequences; each document learns which
    * packed sequence(s) it lands in and at what offset. Output columns:
    * `(id, shard, n_tokens, start_pack, end_pack, start_offset)` where
    * `start_pack..end_pack` are the global sequence numbers the document
    * spans (pack ids are per-shard; `shard * 2^40 + local` would
    * globalize them, left to the writer) and `start_offset` is the token
    * position inside `start_pack`.
    *
    * Scale design: a single global concatenation order would funnel 100
    * TB through one sorted window partition. Instead documents are
    * hash-sharded (`numShards` independent pack streams — size shards to
    * ~1-4 GB so one shard ≈ one output file) and packed within shards:
    * the cumulative-token window partitions by shard, so every shard
    * sorts and packs in parallel. Order within a shard is a salted hash
    * (`pack#` prefix) — a deterministic corpus shuffle, decorrelated
    * from both ingestion order and the shard hash, which is what
    * training wants anyway. No RNG: re-running on a grown corpus moves
    * only documents, never re-deals whole shards.
    */
  def packPlan(docs: DataFrame, idCol: String, textCol: String,
               seqLen: Int, numShards: Int,
               tokensCol: Option[Column] = None): DataFrame = {
    require(seqLen > 0, s"seqLen ($seqLen) must be positive")
    require(numShards > 0, s"numShards ($numShards) must be positive")
    import org.apache.spark.sql.expressions.Window
    val tokens = tokensCol.getOrElse(
      size(split(trim(lower(col(textCol))), "\\s+"))).cast("long")
    val base = docs.select(col(idCol).as("id"), tokens.as("n_tokens"))
      .withColumn("shard",
        pmod(StableHash.hash60(col("id").cast("string")), lit(numShards))
          .cast("int"))
      .withColumn("ord",
        StableHash.hash60(concat(lit("pack#"), col("id").cast("string"))))
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w),
        lit(0L)))
      .withColumn("start_pack", expr(s"start_tok div $seqLen"))
      // a zero-token doc "spans" just its start pack (greatest clamps the
      // end below start that start_tok + n_tokens - 1 would produce)
      .withColumn("end_pack", greatest(col("start_pack"),
        expr(s"(start_tok + n_tokens - 1) div $seqLen")))
      .withColumn("start_offset", col("start_tok") % seqLen)
      .select(col("id"), col("shard"), col("n_tokens"), col("start_pack"),
        col("end_pack"), col("start_offset"))
  }

  /** Materialize the packed training sequences [[packPlan]] describes:
    * encode every document with the learned vocabulary
    * ([[graft.functions.GreedyTokenIds]] — vocab index per token, -1 for
    * UNK), lay the token streams end to end in the plan's deterministic
    * per-shard order, and cut them into `seqLen`-token sequences. Output
    * one row per packed sequence:
    * `(shard, pack_no, n_tokens, token_ids)` — every pack holds exactly
    * `seqLen` tokens except the last of each shard.
    *
    * Scale shape: the only corpus-sized movement is the ONE shuffle of
    * token instances onto their (shard, pack) — inherent to
    * materialization — and each group is bounded by `seqLen`, so no
    * reducer ever holds more than one sequence's tokens. The plan side
    * reuses [[packPlan]] unchanged (same window, same ordering), joined
    * back by id, so plan and payload can never disagree on placement.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    vocab: Seq[String], seqLen: Int, numShards: Int)
      : DataFrame = {
    import graft.functions.{GreedyTokenCount, GreedyTokenIds}
    val plan = packPlan(docs, idCol, textCol, seqLen, numShards,
      tokensCol = Some(GreedyTokenCount.tokenCount(col(textCol), vocab)))
    val ids = docs.select(col(idCol).as("id"),
      GreedyTokenIds.tokenIds(col(textCol), vocab).as("__ids"))
    ids.join(plan, Seq("id"))
      .select(col("shard"),
        (col("start_pack") * seqLen + col("start_offset")).as("__g0"),
        posexplode(col("__ids")).as(Seq("__pos", "__tok")))
      .select(col("shard"),
        expr(s"(__g0 + __pos) div $seqLen").as("pack_no"),
        ((col("__g0") + col("__pos")) % seqLen).as("__off"),
        col("__tok"))
      .groupBy(col("shard"), col("pack_no"))
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(struct(col("__off"), col("__tok"))))
          .as("__st"))
      .select(col("shard"), col("pack_no"), col("n_tokens"),
        expr("transform(__st, e -> e.__tok)").as("token_ids"))
  }

  def stratifiedSampleByHash(df: DataFrame, keyCol: String,
                             strataCol: String,
                             fractions: Map[String, Double],
                             defaultFraction: Double = 0.0): DataFrame = {
    val b = bucket(col(keyCol))
    val threshold = fractions.foldLeft(
      lit(math.round(defaultFraction * Buckets)): Column) {
      case (rest, (stratum, f)) =>
        when(col(strataCol) === stratum,
          lit(math.round(f * Buckets))).otherwise(rest)
    }
    df.filter(b < threshold)
  }

  /** Cap the number of documents kept per group (the C4/RefinedWeb-style
    * per-domain cap that stops one crawl-heavy domain from dominating the
    * mixture): keep the top `n` rows of each group by `(score desc,
    * id asc)`. Output: `(group, id)` of the survivors.
    *
    * Scale shape: a `Window.partitionBy(domain)` + `row_number` pulls
    * EVERY row of a domain into one reducer — the crawl-heavy domain that
    * motivated the cap is exactly the one that stragglers. Instead the
    * cap runs as a [[graft.functions.BoundedTopK]] two-phase aggregate:
    * each scan task forwards at most `n` candidates per group map-side,
    * so the shuffle carries O(tasks x groups x n) tiny rows no matter how
    * big the heaviest domain is.
    */
  def capPerGroup(docs: DataFrame, groupCol: String, idCol: String,
                  scoreCol: Column, n: Int): DataFrame = {
    require(n > 0, s"cap ($n) must be positive")
    // BoundedTopK carries ids as longs and drops nulls, so a silent
    // cast("long") would quietly empty every group when ids are strings
    // (non-numeric → NULL). Demand an integral id up front.
    val idType = docs.schema(idCol).dataType
    val integral = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    require(integral,
      s"capPerGroup id column '$idCol' must be an integral type, got " +
        s"$idType — hash non-numeric ids to a long first " +
        "(e.g. graft.functions.StableHash)")
    docs
      .groupBy(col(groupCol))
      .agg(graft.functions.BoundedTopK.topK(
        scoreCol.cast("double"), col(idCol).cast("long"), n).as("topk"))
      .select(col(groupCol), explode(col("topk")).as(idCol))
  }
}
