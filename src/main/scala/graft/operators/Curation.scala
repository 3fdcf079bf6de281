package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative curation recipes — the reference's config-first ethos
  * (YAML pipelines compiled to runtime plans, `cli/YamlProject` /
  * `spec.PipelineSpec`) applied to training-data curation: a corpus
  * recipe is DATA, reviewable and diffable, and the compiler emits the
  * exact operator chain a hand-written pipeline would.
  *
  * Compilation rules mirror the round-12 soak findings:
  *  - consecutive per-row stages (lang / gopher / classifier) FUSE into
  *    one scan predicate — never keep-list joins;
  *  - set-dependent stages (dedups, caps, splits) run in recipe order,
  *    each over the previous stage's survivors;
  *  - the near-dedup survivor set is persisted exactly like
  *    `pipeline_curate_corpus`'s landing table (both the pair sweep and
  *    the keep-list consume it).
  *
  * `pipeline_spec_curate` hash-matches the hand-built
  * `pipeline_curate_corpus` oracle — the proof that the compiler emits
  * the same pipeline the imperative code does.
  */
object Curation {

  sealed trait Stage
  /** Keep docs whose predicted language equals `lang`. */
  final case class LangFilter(lang: String) extends Stage
  /** Gopher-style length/structure rules. */
  final case class GopherFilter(minWords: Int) extends Stage
  /** Trained-classifier gate: exact integer threshold (see
    * [[TextAnalysis.classifierKeep]]).
    */
  final case class ClassifierFilter(weights: Seq[Int], minScore: Long)
      extends Stage
  /** Train the classifier IN-RECIPE (labels = `labelCol == labelValue`
    * over the stage's input set, [[TextAnalysis.nbTrainHashed]]'s exact
    * integer posteriors), then gate on `minScore` — the declarative
    * form of the train-then-filter chain `pipeline_classified_curate`
    * hand-builds. Set-dependent by construction: the training set is
    * whatever survives the preceding stages.
    */
  final case class TrainClassifier(labelCol: String, labelValue: String,
      dim: Int, minScore: Long) extends Stage
  /** Deterministic hash sample: keep `fraction` of docs by id bucket
    * ([[Sampling.bucket]] — a per-row scan predicate, fuses like the
    * filter stages).
    */
  final case class Sample(fraction: Double) extends Stage {
    require(fraction > 0 && fraction <= 1,
      s"sample fraction ($fraction) must be in (0, 1]")
  }
  /** Benchmark n-gram decontamination: drop docs sharing >= `minHits`
    * distinct `k`-grams with the benchmark table named `benchmark`
    * (resolved by the caller's table resolver — a path or a logical
    * name; see [[run]]).
    */
  final case class Decontaminate(benchmark: String,
      benchTextCol: String = "text", k: Int = 13, minHits: Long = 1)
      extends Stage
  /** Decontaminate against a PUBLISHED benchmark gram index
    * ([[Decontamination.writeBenchmarkGrams]] directory): the shingle
    * size travels with the index, so the recipe carries only the path
    * and the hit threshold.
    */
  final case class DecontaminateIndex(path: String, minHits: Long = 1)
      extends Stage
  /** Exact dedup on the hash-normalized text (keep min id per hash). */
  case object ExactDedup extends Stage
  /** MinHash-LSH near-dup resolution; keep one doc per component. */
  final case class NearDedup(k: Int = 3, numHashes: Int = 12,
      rowsPerBand: Int = 3, threshold: Double = 0.5,
      maxBucket: Int = Int.MaxValue) extends Stage
  /** SimHash + banded-Hamming near-dup resolution; keep one doc per
    * component. The cheap-fingerprint sibling of [[NearDedup]] (one
    * 64-bit fingerprint per doc instead of `numHashes` signature ints).
    */
  final case class SimhashDedup(bits: Int = 32, maxHamming: Int = 3,
      maxBucket: Int = Int.MaxValue) extends Stage
  /** Exact n-gram-Jaccard near-dup resolution (AllPairs prefix
    * pruning); keep one doc per component.
    */
  final case class JaccardDedup(k: Int = 3, threshold: Double = 0.8)
      extends Stage
  /** Embedding-cosine (hyperplane-LSH) near-dup resolution over
    * `vecCol`; keep one doc per component. The input frame must carry
    * the vector column.
    */
  final case class EmbeddingDedup(vecCol: String = "embedding",
      numPlanes: Int = 32, bandBits: Int = 16,
      threshold: Double = 0.9, maxBucket: Int = Int.MaxValue)
      extends Stage
  /** Cap docs per group (largest `orderCol` first). */
  final case class CapPerGroup(groupCol: String, orderCol: String,
      cap: Int) extends Stage
  /** Source-mixture downsampling: compute the no-upsampling keep rates
    * for the given relative weights ([[Sampling.mixturePlan]] over the
    * stage's input set) and apply them as a stratified hash sample.
    * Sources absent from `weights` are dropped.
    */
  final case class Mixture(sourceCol: String,
      weights: Seq[(String, Double)]) extends Stage {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "mixture weights must be non-empty and positive")
  }
  /** Deterministic hash split; appends a `split` column. */
  final case class HashSplit(weights: Seq[(String, Double)]) extends Stage

  /** Retrieval stages change the frame SHAPE: a `retrieve`/`hybrid`
    * stage turns the curated doc set into a ranked list
    * `(query_id, rank, neighbor_id)`, and every later stage operates
    * on that list. They must therefore form the recipe's SUFFIX — a
    * doc-shape stage after a retrieval stage fails loudly at compile
    * time, not with a missing-column error mid-plan.
    */
  sealed trait RetrievalStage extends Stage
  /** Ranked retrieval over the curated survivors: `scorer = "tfidf"`
    * (conjunctive exact-integer tf·idf, [[TextSearch.searchTopK]]) or
    * `"bm25"` (disjunctive BM25, [[TextSearch.searchTopKBm25]]).
    * Emits the ranked shape with the constant `queryId` — retrieve
    * DEEPER than the final k when a later [[MineHardNegatives]] stage
    * will thin the list.
    */
  final case class Retrieve(terms: Seq[String], k: Int,
      scorer: String = "tfidf", queryId: Long = 0L)
      extends RetrievalStage {
    require(terms.nonEmpty, "retrieve needs at least one term")
    require(k > 0, s"retrieve k ($k) must be > 0")
    require(scorer == "tfidf" || scorer == "bm25",
      s"retrieve scorer must be 'tfidf' or 'bm25', got '$scorer'")
  }
  /** Hybrid lexical+vector retrieval over the curated survivors: the
    * lexical arm is [[Retrieve]]'s scorer over the surviving docs, the
    * vector arm is brute-force cosine of query `queryId`'s embedding
    * (looked up in the resolved `embTable`) against the SURVIVORS'
    * embeddings, and the two ranked lists fuse by reciprocal rank
    * ([[Similarity.rrfFuse]]). The curation stages upstream thus prune
    * BOTH arms' candidate sets — the point of putting retrieval in the
    * recipe.
    */
  final case class HybridRetrieve(terms: Seq[String], k: Int,
      embTable: String, queryId: Long, scorer: String = "tfidf",
      embIdCol: String = "vec_id", vecCol: String = "embedding",
      rrfK: Int = 60) extends RetrievalStage {
    require(terms.nonEmpty, "hybrid needs at least one term")
    require(k > 0 && rrfK > 0,
      s"hybrid k ($k) and rrf_k ($rrfK) must be > 0")
    require(scorer == "tfidf" || scorer == "bm25",
      s"hybrid scorer must be 'tfidf' or 'bm25', got '$scorer'")
  }
  /** Hard-negative mining over the current ranked list: docs whose
    * `labelCol` equals `labelValue` are the POSITIVES (dropped), the
    * remainder re-ranks by retrieval order, top `k` per query
    * ([[Similarity.hardNegatives]]). Label lookup happens against the
    * curated survivor set — the same corpus the retrieval ran over.
    */
  final case class MineHardNegatives(labelCol: String,
      labelValue: String, k: Int) extends RetrievalStage {
    require(k > 0, s"hard_negatives k ($k) must be > 0")
  }

  final case class CurationSpec(stages: Seq[Stage]) {
    require(stages.nonEmpty, "a curation spec needs at least one stage")
    locally {
      val firstRetr = stages.indexWhere(_.isInstanceOf[RetrievalStage])
      if (firstRetr >= 0) stages.drop(firstRetr).foreach { s =>
        require(s.isInstanceOf[RetrievalStage],
          s"doc-shape stage $s cannot follow a retrieval stage " +
            "(retrieval stages must be the recipe's suffix)")
      }
      stages.collect { case s: RetrievalStage => s } match {
        case retr if retr.nonEmpty =>
          require(retr.head match {
            case _: Retrieve | _: HybridRetrieve => true
            case _ => false
          }, "the first retrieval stage must be retrieve or hybrid " +
            "(hard_negatives consumes a ranked list)")
          require(retr.count {
            case _: Retrieve | _: HybridRetrieve => true
            case _ => false
          } == 1, "a recipe carries at most one retrieve/hybrid stage")
        case _ => ()
      }
    }
  }

  /** Compile and run a recipe. `resolveTable` resolves
    * [[Decontaminate]]'s benchmark name — defaults to reading it as a
    * parquet path; tests and embedded callers pass a map-backed
    * resolver.
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
          spec: CurationSpec,
          resolveTable: String => DataFrame = null): DataFrame =
    runImpl(docs, idCol, textCol, spec, resolveTable, lazyPlan = false)

  /** [[run]] with a PURE LAZY plan — no persists, no eager release
    * checkpoint; shared subtrees re-derive per consumer instead of
    * caching. The SQL TVF expansion uses this (planning — including
    * EXPLAIN — must launch zero Spark jobs; the
    * `ngramJaccardAgainstLazy` precedent). Only valid for the lazy
    * stage subset: the set-resolution stages (near-dedups, in-recipe
    * training, mixture) execute work to BUILD their plan and fail
    * loudly before reaching this.
    *
    * Planning-time filesystem caveat: the decontaminate stages touch
    * the DRIVER filesystem while the plan is built — `decontaminate`
    * resolves its benchmark table (a parquet open, footer inference
    * if the resolver does not supply a schema) and
    * `decontaminate_index` reads the layout's `_index_meta.json` (one
    * small driver-side file; the gram table itself opens with an
    * explicit schema, no inference). Neither launches corpus work,
    * but EXPLAIN on a recipe with these stages is not I/O-free the
    * way the pure per-row stages are.
    */
  private[graft] def runLazy(docs: DataFrame, idCol: String,
      textCol: String, spec: CurationSpec,
      resolveTable: String => DataFrame): DataFrame = {
    // the lazy precondition is enforced HERE, beside the stage
    // definitions, so a future eager stage (or a new runLazy caller)
    // cannot silently run jobs during SQL planning — the invariant is
    // self-enforcing, not caller-enforced
    spec.stages.foreach {
      case s @ (_: NearDedup | _: SimhashDedup | _: JaccardDedup |
                _: EmbeddingDedup | _: TrainClassifier | _: Mixture) =>
        throw new IllegalArgumentException(
          s"lazy recipe compile: stage $s resolves sets by EXECUTING " +
            "Spark jobs while the plan is still being built " +
            "(iterative components / training / rate collection), " +
            "which would run work during SQL planning (EXPLAIN). " +
            "Run this recipe through the DataFrame API " +
            "(Curation.run); the lazy surface carries: lang, gopher, " +
            "classifier, sample, exact_dedup, decontaminate[_index], " +
            "cap_per_group, split, retrieve, hybrid, hard_negatives")
      case _ => ()
    }
    runImpl(docs, idCol, textCol, spec, resolveTable, lazyPlan = true)
  }

  private def runImpl(docs: DataFrame, idCol: String, textCol: String,
          spec: CurationSpec,
          resolveTable: String => DataFrame,
          lazyPlan: Boolean): DataFrame = {
    val resolve: String => DataFrame =
      if (resolveTable != null) resolveTable
      else name => docs.sparkSession.read.parquet(name)
    // fuse leading per-row stages into one scan predicate
    val (rowStages, rest) = spec.stages.span {
      case _: LangFilter | _: GopherFilter | _: ClassifierFilter |
           _: Sample => true
      case _ => false
    }
    val pred = rowStages.map(predicateOf(_, idCol, textCol))
      .reduceOption(_ && _)
    var cur = pred.map(docs.filter).getOrElse(docs)
    val persisted = scala.collection.mutable.Buffer.empty[DataFrame]
    // the lazy spelling skips every cache: shared subtrees re-derive
    // per consumer, and the final eager release checkpoint disappears
    // with them — the plan stays pure for analysis-time expansion
    def maybePersist(df: DataFrame): DataFrame =
      if (lazyPlan) df
      else {
        val landed = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        persisted += landed
        landed
      }
    // shared shape of every near-dedup stage: persist the survivor set
    // (the pair sweep and the keep-list both consume it), resolve the
    // stage's pair graph to components, keep one doc per component
    def resolveDedup(pairsOf: DataFrame => DataFrame): Unit = {
      val landed = maybePersist(cur)
      val labels = Dedup.connectedComponents(pairsOf(landed),
        "id_a", "id_b")
      cur = Dedup.keepCanonical(landed, idCol, labels)
    }
    val (docRest, retrStages) = rest.span(!_.isInstanceOf[RetrievalStage])
    docRest.foreach {
      case s @ (_: LangFilter | _: GopherFilter | _: ClassifierFilter |
                _: Sample) =>
        // a per-row stage AFTER a set stage still composes as a filter
        cur = cur.filter(predicateOf(s, idCol, textCol))
      case TrainClassifier(labelCol, labelValue, dim, minScore) =>
        // the training COLLECT action executes the chain so far, and
        // the downstream consumer executes it again — persist the
        // survivor frame once (released with the result) so the
        // regex-heavy upstream filters run ONE scan, not two
        val landed = maybePersist(cur)
        // one training action collects the dim-row model artifact; the
        // gate itself is then a per-row scan predicate like any other
        // filter stage (Catalyst folds consecutive filters into one)
        val w = TextAnalysis.nbWeightsArray(
          TextAnalysis.nbTrainHashed(landed,
            col(labelCol) === labelValue, textCol, dim), dim)
        cur = landed.filter(
          TextAnalysis.classifierKeep(col(textCol), w, minScore))
      case ExactDedup =>
        val keep = Dedup.exact(
          cur.select(col(idCol),
            TextAnalysis.normalizeForHash(col(textCol)).as("__norm")),
          idCol, "__norm").select(col("keep_id").as(idCol))
        cur = cur.join(keep, idCol)
      case NearDedup(k, numHashes, rowsPerBand, threshold, maxBucket) =>
        resolveDedup(landed => Dedup.minhashNearDups(landed, idCol,
          textCol, k, numHashes, rowsPerBand, threshold, maxBucket))
      case SimhashDedup(bits, maxHamming, maxBucket) =>
        resolveDedup(landed => Dedup.simhashNearDups(landed, idCol,
          textCol, bits, maxHamming, maxBucket))
      case JaccardDedup(k, threshold) =>
        resolveDedup(landed => Dedup.ngramJaccardPairs(landed, idCol,
          textCol, k, threshold))
      case EmbeddingDedup(vecCol, numPlanes, bandBits, threshold,
          maxBucket) =>
        resolveDedup(landed => Dedup.embeddingNearDups(landed, idCol,
          vecCol, numPlanes, bandBits, threshold, maxBucket))
      case Decontaminate(bench, btc, k, minHits) =>
        cur = Decontamination.decontaminate(cur, idCol, textCol,
          resolve(bench), btc, k, minHits)
      case DecontaminateIndex(path, minHits) =>
        val (grams, k) = Decontamination.readBenchmarkGrams(
          cur.sparkSession, path)
        cur = Decontamination.decontaminateWithGrams(cur, idCol,
          textCol, grams, k, minHits)
      case Mixture(srcCol, weights) =>
        // the rate COLLECT executes the chain so far and the sample
        // filter executes it again — persist once, release with result
        val landed = maybePersist(cur)
        // the rate table is a |sources|-row model artifact; collect it
        // and apply as a literal stratified-hash predicate (one corpus
        // aggregate pass + one scan filter, no joins)
        val rates = Sampling.mixturePlan(landed, srcCol, textCol,
            weights.toMap)
          .select(col("source"), col("sample_rate")).collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        cur = Sampling.stratifiedSampleByHash(landed, idCol, srcCol,
          rates, defaultFraction = 0.0)
      case CapPerGroup(groupCol, orderCol, cap) =>
        cur = Sampling.capPerGroup(cur, groupCol, idCol, col(orderCol),
          cap)
      case HashSplit(weights) =>
        cur = Sampling.hashSplit(cur, idCol, weights)
      case s: RetrievalStage =>
        // unreachable: CurationSpec enforces the retrieval suffix
        throw new IllegalStateException(s"retrieval stage $s in doc loop")
    }
    if (retrStages.nonEmpty) {
      // the retrieval corpus is scanned by the scorer's several passes
      // (term counts, totals, df) and again by the hard-negative label
      // lookup — persist the survivor set once, release with the result
      val corpus = maybePersist(cur)
      var ranked: DataFrame = null
      def rankedLexical(terms: Seq[String], k: Int, scorer: String,
          queryId: Long): DataFrame = {
        val scored = scorer match {
          // the lazy-plan compile must not run jobs while building
          // (the eager BM25 spelling checkpoint-releases its sliver)
          case "bm25" if lazyPlan => TextSearch.searchTopKBm25Lazy(
            corpus, idCol, textCol, terms, k)
          case "bm25" => TextSearch.searchTopKBm25(
            corpus, idCol, textCol, terms, k)
          case _ if lazyPlan => TextSearch.searchTopKLazy(
            corpus, idCol, textCol, terms, k)
          case _ => TextSearch.searchTopK(
            corpus, idCol, textCol, terms, k)
        }
        Similarity.rankTopK(scored.select(
          lit(queryId).as("query_id"),
          col("doc_id").cast("long").as("neighbor_id"),
          col("score").cast("double").as("sim")), k)
      }
      retrStages.foreach {
        case Retrieve(terms, k, scorer, queryId) =>
          ranked = rankedLexical(terms, k, scorer, queryId)
        case HybridRetrieve(terms, k, embTable, queryId, scorer,
            embIdCol, vecCol, rrfK) =>
          val emb = resolve(embTable)
          // both arms retrieve over the CURATED corpus: the vector
          // candidates semi-join to the survivor ids (panel-vs-corpus
          // shape — the survivors' id set streams, no broadcast of a
          // corpus-sized list); the query vector is an external probe,
          // looked up by id in the full embedding table
          val corpusEmb = emb.join(
            corpus.select(col(idCol).cast("long").as(embIdCol)),
            Seq(embIdCol), "left_semi")
          val vec = Similarity.bruteForceTopK(corpusEmb,
            emb.filter(col(embIdCol) === queryId), embIdCol, vecCol, k)
          ranked = Similarity.rrfFuse(
            Seq(rankedLexical(terms, k, scorer, queryId), vec), k, rrfK)
        case MineHardNegatives(labelCol, labelValue, k) =>
          // ranked feeds two consumers (positive derivation + the
          // exclusion anti-join) — persist the panel-sized list; the
          // corpus label lookup streams against the BROADCAST panel
          // (the ann_hard_negatives shape)
          val landed = maybePersist(ranked)
          val positives = corpus
            .filter(col(labelCol) === lit(labelValue))
            .select(col(idCol).cast("long").as("neighbor_id"))
            .join(broadcast(landed.select(col("query_id"),
              col("neighbor_id"))), "neighbor_id")
            .select(col("query_id"), col("neighbor_id"))
          ranked = Similarity.hardNegatives(landed, positives, k)
        case s =>
          throw new IllegalStateException(s"not a retrieval stage: $s")
      }
      cur = ranked
    }
    if (persisted.isEmpty) cur
    else Dedup.releaseAfterAll(cur, persisted.toSeq: _*)
  }

  /** Parse a recipe from JSON — the file format a curation config repo
    * would review and diff:
    * {{{
    * {"stages": [
    *   {"stage": "lang", "lang": "en"},
    *   {"stage": "gopher", "min_words": 20},
    *   {"stage": "classifier", "weights": [..], "min_score": -878},
    *   {"stage": "train_classifier", "label_col": "source",
    *    "label_value": "wiki", "dim": 512, "min_score": -878},
    *   {"stage": "sample", "fraction": 0.8},
    *   {"stage": "decontaminate", "benchmark": "/path/or/name",
    *    "text_col": "text", "k": 13, "min_hits": 1},
    *   {"stage": "decontaminate_index", "index": "/published/dir",
    *    "min_hits": 1},
    *   {"stage": "exact_dedup"},
    *   {"stage": "near_dedup", "k": 3, "num_hashes": 12,
    *    "rows_per_band": 3, "threshold": 0.5, "max_bucket": 1000},
    *   {"stage": "simhash_dedup", "bits": 32, "max_hamming": 3},
    *   {"stage": "jaccard_dedup", "k": 3, "threshold": 0.8},
    *   {"stage": "embedding_dedup", "vec_col": "embedding",
    *    "num_planes": 32, "band_bits": 16, "threshold": 0.9},
    *   {"stage": "cap_per_group", "group": "source", "order": "n_chars",
    *    "cap": 10},
    *   {"stage": "mixture", "source_col": "source",
    *    "weights": {"src_a": 2.0, "src_b": 1.0}},
    *   {"stage": "split", "weights": {"train": 0.9, "valid": 0.1}},
    *   {"stage": "retrieve", "terms": ["spark", "merge"], "k": 40,
    *    "scorer": "bm25", "query_id": 0},
    *   {"stage": "hybrid", "terms": ["spark"], "k": 20,
    *    "embeddings": "/path/or/name", "query_id": 7,
    *    "scorer": "tfidf", "emb_id_col": "vec_id",
    *    "vec_col": "embedding", "rrf_k": 60},
    *   {"stage": "hard_negatives", "label_col": "source",
    *    "label_value": "src0", "k": 20}
    * ]}
    * }}}
    * Unknown stage names and missing fields fail LOUDLY — a silently
    * dropped filter stage ships an uncurated corpus.
    */
  def fromJson(json: String): CurationSpec = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(json)
    def num(v: JValue, what: String): Double = v match {
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be a number, got $other")
    }
    def field(o: JObject, name: String): JValue =
      (o \ name) match {
        case JNothing => throw new IllegalArgumentException(
          s"stage ${JsonMethods.compact(JsonMethods.render(o))} " +
            s"is missing required field '$name'")
        case v => v
      }
    def str(o: JObject, name: String): String =
      field(o, name) match {
        case JString(s) => s
        case other => throw new IllegalArgumentException(
          s"'$name' must be a string, got $other")
      }
    def optNum(o: JObject, name: String, dflt: Double): Double =
      (o \ name) match {
        case JNothing => dflt
        case v => num(v, name)
      }
    def strSeq(o: JObject, name: String): Seq[String] =
      field(o, name) match {
        case JArray(vs) => vs.map {
          case JString(s) => s
          case other => throw new IllegalArgumentException(
            s"'$name' entries must be strings, got $other")
        }
        case other => throw new IllegalArgumentException(
          s"'$name' must be an array, got $other")
      }
    def optStr(o: JObject, name: String, dflt: String): String =
      (o \ name) match {
        case JNothing => dflt
        case JString(s) => s
        case other => throw new IllegalArgumentException(
          s"'$name' must be a string, got $other")
      }
    val stages = (root \ "stages") match {
      case JArray(arr) if arr.nonEmpty => arr.map {
        case o: JObject => str(o, "stage") match {
          case "lang" => LangFilter(str(o, "lang"))
          case "gopher" =>
            GopherFilter(num(field(o, "min_words"), "min_words").toInt)
          case "classifier" =>
            val w = field(o, "weights") match {
              case JArray(ws) =>
                ws.map(v => num(v, "weights entry").toInt)
              case other => throw new IllegalArgumentException(
                s"'weights' must be an array, got $other")
            }
            ClassifierFilter(w,
              num(field(o, "min_score"), "min_score").toLong)
          case "train_classifier" => TrainClassifier(
            str(o, "label_col"), str(o, "label_value"),
            num(field(o, "dim"), "dim").toInt,
            num(field(o, "min_score"), "min_score").toLong)
          case "sample" =>
            Sample(num(field(o, "fraction"), "fraction"))
          case "decontaminate" => Decontaminate(
            str(o, "benchmark"),
            optStr(o, "text_col", "text"),
            optNum(o, "k", 13).toInt,
            optNum(o, "min_hits", 1).toLong)
          case "exact_dedup" => ExactDedup
          case "near_dedup" => NearDedup(
            num(field(o, "k"), "k").toInt,
            num(field(o, "num_hashes"), "num_hashes").toInt,
            num(field(o, "rows_per_band"), "rows_per_band").toInt,
            num(field(o, "threshold"), "threshold"),
            optNum(o, "max_bucket", Int.MaxValue).toInt)
          case "simhash_dedup" => SimhashDedup(
            optNum(o, "bits", 32).toInt,
            optNum(o, "max_hamming", 3).toInt,
            optNum(o, "max_bucket", Int.MaxValue).toInt)
          case "jaccard_dedup" => JaccardDedup(
            optNum(o, "k", 3).toInt,
            optNum(o, "threshold", 0.8))
          case "embedding_dedup" => EmbeddingDedup(
            optStr(o, "vec_col", "embedding"),
            optNum(o, "num_planes", 32).toInt,
            optNum(o, "band_bits", 16).toInt,
            optNum(o, "threshold", 0.9),
            optNum(o, "max_bucket", Int.MaxValue).toInt)
          case "decontaminate_index" => DecontaminateIndex(
            str(o, "index"),
            optNum(o, "min_hits", 1).toLong)
          case "cap_per_group" => CapPerGroup(str(o, "group"),
            str(o, "order"), num(field(o, "cap"), "cap").toInt)
          case "mixture" => field(o, "weights") match {
            case JObject(fields) => Mixture(
              optStr(o, "source_col", "source"),
              fields.map { case JField(src, v) =>
                src -> num(v, s"mixture weight '$src'")
              })
            case other => throw new IllegalArgumentException(
              s"mixture 'weights' must be an object, got $other")
          }
          case "split" => field(o, "weights") match {
            case JObject(fields) =>
              HashSplit(fields.map { case JField(k, v) =>
                k -> num(v, s"split weight '$k'")
              })
            case other => throw new IllegalArgumentException(
              s"split 'weights' must be an object, got $other")
          }
          case "retrieve" => Retrieve(
            strSeq(o, "terms"),
            num(field(o, "k"), "k").toInt,
            optStr(o, "scorer", "tfidf"),
            optNum(o, "query_id", 0).toLong)
          case "hybrid" => HybridRetrieve(
            strSeq(o, "terms"),
            num(field(o, "k"), "k").toInt,
            str(o, "embeddings"),
            num(field(o, "query_id"), "query_id").toLong,
            optStr(o, "scorer", "tfidf"),
            optStr(o, "emb_id_col", "vec_id"),
            optStr(o, "vec_col", "embedding"),
            optNum(o, "rrf_k", 60).toInt)
          case "hard_negatives" => MineHardNegatives(
            str(o, "label_col"), str(o, "label_value"),
            num(field(o, "k"), "k").toInt)
          case unknown => throw new IllegalArgumentException(
            s"unknown curation stage '$unknown'")
        }
        case other => throw new IllegalArgumentException(
          s"each stage must be an object, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "curation spec needs a non-empty 'stages' array")
    }
    CurationSpec(stages)
  }

  private def predicateOf(s: Stage, idCol: String,
                          textCol: String): Column = s match {
    case LangFilter(lang) => TextAnalysis.langId(col(textCol)) === lang
    case GopherFilter(minWords) =>
      TextAnalysis.gopherKeep(col(textCol), minWords = minWords)
    case ClassifierFilter(w, minScore) =>
      TextAnalysis.classifierKeep(col(textCol), w, minScore)
    case Sample(fraction) =>
      Sampling.bucket(col(idCol)) <
        math.round(fraction * Sampling.Buckets)
    case other =>
      throw new IllegalArgumentException(s"not a per-row stage: $other")
  }
}
