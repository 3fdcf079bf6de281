package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the engine's function library: every graft scalar /
  * aggregate that makes sense from `spark.sql(...)` is registered under a
  * `graft_` prefix, so SQL-first users (the reference's audience runs SQL
  * against their warehouse) get the same deterministic primitives the
  * DataFrame API exposes.
  *
  * Two registration paths, same function table:
  *  - [[GraftExtensions]] — `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) injects at session
  *    build time, the standard Spark extension mechanism.
  *  - [[GraftFunctions.register]] — runtime registration into an existing
  *    session's FunctionRegistry (idempotent), for notebook/driver use.
  *
  * Scalar builders delegate to the SAME Column-level implementations the
  * DataFrame API uses (unresolved function trees resolve during analysis),
  * so SQL and DataFrame calls cannot drift; aggregates return their
  * `AggregateFunction` and the analyzer wraps them.
  */
object GraftFunctions {

  private def colFn(name: String, arity: Int)(f: Seq[Column] => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity,
          s"$name expects $arity argument(s), got ${args.length}")
        // eager conversion: a builder's return value is spliced into the
        // plan as-is, so the lazy ColumnNodeExpression wrapper would
        // never unwrap (see ColumnBridge.resolvedExpression)
        ColumnBridge.resolvedExpression(f(args.map(ColumnBridge.column)))
      })

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litIntArray(e: Expression, what: String): Seq[Int] = {
    import org.apache.spark.sql.types.ArrayType
    require(e.foldable && e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == IntegerType,
      s"$what must be a foldable array<int> literal, got $e")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toObjectArray(IntegerType).toIndexedSeq.map {
          case i: java.lang.Integer => i.intValue()
          case null => throw new IllegalArgumentException(
            s"$what must not contain nulls")
        }
      case other => throw new IllegalArgumentException(
        s"$what evaluated to $other, expected an array")
    }
  }

  private def litStringArray(e: Expression, what: String): Seq[String] = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    require(e.foldable && e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == StringType,
      s"$what must be a foldable array<string> literal, got $e")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toObjectArray(StringType).toIndexedSeq.map {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case null => throw new IllegalArgumentException(
            s"$what must not contain nulls") // a dropped entry would
            // silently shrink the vocabulary the user specified
        }
      case other => throw new IllegalArgumentException(
        s"$what evaluated to $other, expected an array")
    }
  }

  /** The function table (name -> builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(

    // deterministic 60-bit hash (the dedup/sampling primitive)
    colFn("graft_stable_hash60", 1)(a => StableHash.hash60(a.head)),

    // deterministic [0, 10000) sampling bucket of any key
    colFn("graft_bucket", 1)(a =>
      graft.operators.Sampling.bucket(a.head)),

    // text curation scalars
    colFn("graft_normalize_text", 1)(a =>
      graft.operators.TextAnalysis.normalizeForHash(a.head)),
    colFn("graft_lang_id", 1)(a =>
      graft.operators.TextAnalysis.langId(a.head)),
    colFn("graft_quality_score", 1)(a =>
      graft.operators.TextAnalysis.qualityScore(a.head)),
    colFn("graft_gopher_keep", 1)(a =>
      graft.operators.TextAnalysis.gopherKeep(a.head)),

    // embedding similarity (codegen'd FloatVectorDot under the hood)
    colFn("graft_float_dot", 2)(a => VectorOps.dotF(a(0), a(1))),
    colFn("graft_cosine", 2)(a => VectorOps.cosineF(a(0), a(1))),

    // word k-shingles: k is a required int literal (drives codegen)
    (FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getCanonicalName,
        "graft_word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_word_shingles expects (text, k), got ${args.length}")
        WordShingles(args.head, litInt(args(1), "shingle size k"))
      }),

    // crawl-ingest HTML -> text extraction (codegen'd regexp chain)
    colFn("graft_html_text", 1)(a =>
      graft.operators.TextAnalysis.htmlToText(a.head)),

    // ---- incremental dedup probe scalars (r14): fingerprint an ingest
    // batch and band-join it against a persisted index from pure SQL.
    // Parameters are literals — they describe the index layout, not a
    // row (a probe that banded differently than its index would
    // silently miss every collision) --------------------------------
    (FunctionIdentifier("graft_minhash_sigs"),
      new ExpressionInfo(ProbeFunctions.getClass.getCanonicalName,
        "graft_minhash_sigs"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"graft_minhash_sigs expects (text, k, num_hashes), " +
            s"got ${args.length}")
        ColumnBridge.resolvedExpression(ProbeFunctions.minhashSigs(
          ColumnBridge.column(args.head),
          litInt(args(1), "shingle size k"),
          litInt(args(2), "num_hashes")))
      }),
    (FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(ProbeFunctions.getClass.getCanonicalName,
        "graft_minhash_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"graft_minhash_bands expects (sigs, num_hashes, " +
            s"rows_per_band), got ${args.length}")
        ColumnBridge.resolvedExpression(ProbeFunctions.minhashBands(
          ColumnBridge.column(args.head),
          litInt(args(1), "num_hashes"),
          litInt(args(2), "rows_per_band")))
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(ProbeFunctions.getClass.getCanonicalName,
        "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_simhash expects (text, bits), got ${args.length}")
        ColumnBridge.resolvedExpression(ProbeFunctions.simhashScalar(
          ColumnBridge.column(args.head), litInt(args(1), "bits")))
      }),
    (FunctionIdentifier("graft_hamming_bands"),
      new ExpressionInfo(ProbeFunctions.getClass.getCanonicalName,
        "graft_hamming_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"graft_hamming_bands expects (fp, bits, band_bits), " +
            s"got ${args.length}")
        ColumnBridge.resolvedExpression(ProbeFunctions.hammingBands(
          ColumnBridge.column(args.head),
          litInt(args(1), "bits"), litInt(args(2), "band_bits")))
      }),

    // per-document term-frequency map (the text-search family's
    // shuffle-eliminator, exposed for SQL pipelines)
    (FunctionIdentifier("graft_word_counts"),
      new ExpressionInfo(classOf[WordTermCounts].getCanonicalName,
        "graft_word_counts"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_word_counts expects (text), got ${args.length}")
        WordTermCounts(args.head)
      }),

    // hashed-bag classifier score: struct(n_feats, raw_score) against a
    // literal weight vector (the trained model artifact, like
    // graft_token_count's vocab) — quality filtering from pure SQL
    (FunctionIdentifier("graft_bag_score"),
      new ExpressionInfo(classOf[HashedBagScore].getCanonicalName,
        "graft_bag_score"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_bag_score expects (text, weights), got ${args.length}")
        HashedBagScore(args.head, litIntArray(args(1), "weight vector"))
      }),

    // perceptual average-hash of a binary payload (media dedup from SQL)
    (FunctionIdentifier("graft_ahash"),
      new ExpressionInfo(classOf[AHash64].getCanonicalName, "graft_ahash"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"graft_ahash expects (payload), got ${args.length}")
        AHash64(args.head)
      }),

    // learned-vocab greedy token count: vocab is a required array<string>
    // literal (a model artifact — it parameterizes the trie, not a row)
    (FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[GreedyTokenCount].getCanonicalName,
        "graft_token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_token_count expects (text, vocab), got ${args.length}")
        GreedyTokenCount(args.head,
          litStringArray(args(1), "tokenizer vocab"))
      }),

    // bounded top-k aggregate: array<long> of ids by (score desc, id asc)
    (FunctionIdentifier("graft_bounded_topk"),
      new ExpressionInfo(classOf[BoundedTopK].getCanonicalName,
        "graft_bounded_topk"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"graft_bounded_topk expects (score, id, k), got ${args.length}")
        BoundedTopK(args(0), args(1), litInt(args(2), "top-k k"))
      }),

    // KMV distinct sketch aggregate: k smallest distinct hashes, asc
    (FunctionIdentifier("graft_min_k_distinct"),
      new ExpressionInfo(classOf[MinKDistinct].getCanonicalName,
        "graft_min_k_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_min_k_distinct expects (hash, k), got ${args.length}")
        MinKDistinct(args(0), litInt(args(1), "sketch size k"))
      }),

    // count-min sketch aggregate: row-major d x w counter array
    (FunctionIdentifier("graft_count_min"),
      new ExpressionInfo(classOf[CountMin].getCanonicalName,
        "graft_count_min"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"graft_count_min expects (hash, d, w), got ${args.length}")
        CountMin(args(0), litInt(args(1), "cms depth d"),
          litInt(args(2), "cms width w"))
      }),

    // exact integer moment aggregate over array<int> codes:
    // [n, sums(d), gram upper triangle] as one array<long> (PCA input)
    (FunctionIdentifier("graft_gram"),
      new ExpressionInfo(classOf[GramAgg].getCanonicalName, "graft_gram"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_gram expects (codes, dim), got ${args.length}")
        GramAgg(args(0), litInt(args(1), "gram dim"))
      }))

  private def litString(e: Expression, what: String): String = {
    import org.apache.spark.sql.types.StringType
    require(e.foldable && e.dataType == StringType,
      s"$what must be a string literal, got $e")
    val v = e.eval()
    require(v != null, s"$what must not be null")
    v.toString
  }

  private def litDouble(e: Expression, what: String): Double = {
    import org.apache.spark.sql.types.NumericType
    require(e.foldable && e.dataType.isInstanceOf[NumericType],
      s"$what must be a numeric literal, got $e")
    e.eval() match {
      case d: java.lang.Double => d
      case f: java.lang.Float => f.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case i: java.lang.Integer => i.toDouble
      case l: java.lang.Long => l.toDouble
      case other => throw new IllegalArgumentException(
        s"$what evaluated to $other, expected a number")
    }
  }

  /** SQL TABLE-function surface (r15): whole probes as TVFs, closing
    * the gap the scalar surface left — `graft_minhash_sigs` and
    * friends let SQL users assemble a probe by hand (the documented
    * CTE template above each `sql_*` oracle query); these run the
    * DataFrame probe operators themselves, so the SQL spelling cannot
    * drift from the DataFrame one:
    *
    *   SELECT * FROM graft_minhash_probe('batch_view',
    *     '/idx/path', 'doc_id', 'text', 0.5)
    *
    * Arguments are literals: the batch is named as a table/view (SQL
    * TVF arguments are expressions, not relations), the index is the
    * published directory whose `_index_meta.json` carries every
    * banding parameter. The builder expands at ANALYSIS time into the
    * probe's logical plan — Catalyst then optimizes the composed
    * query as one plan, exactly as if the DataFrame API had built it.
    * Every TVF expands to a PURE LAZY plan: planning (including
    * `EXPLAIN`) launches no Spark jobs — `graft_jaccard_probe` uses
    * the probe's lazy spelling for exactly this reason (r16; the
    * eager variant checkpoints to release its cached intermediates,
    * which a one-shot SQL query never accumulates).
    */
  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical
        .LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    def tvf(name: String, usage: String, minArgs: Int, maxArgs: Int)(
        build: (SparkSession, Seq[Expression]) => org.apache.spark.sql
          .DataFrame)
        : (FunctionIdentifier, ExpressionInfo,
           Seq[Expression] => LogicalPlan) =
      (FunctionIdentifier(name),
        new ExpressionInfo(GraftFunctions.getClass.getCanonicalName,
          name),
        (args: Seq[Expression]) => {
          require(args.length >= minArgs && args.length <= maxArgs,
            s"$name expects $usage, got ${args.length} argument(s)")
          val spark = SparkSession.active
          build(spark, args).queryExecution.logical
        })
    Seq(
      tvf("graft_minhash_probe",
        "(batch_table, index_path, id_col, text_col[, threshold])",
        4, 5) { (spark, args) =>
        graft.operators.Dedup.minhashNearDupsAgainstIndex(
          spark.table(litString(args(0), "batch_table")),
          graft.operators.Dedup.readSignatureIndex(spark,
            litString(args(1), "index_path")),
          litString(args(2), "id_col"), litString(args(3), "text_col"),
          if (args.length > 4) litDouble(args(4), "threshold") else 0.5)
      },
      tvf("graft_jaccard_probe",
        "(batch_table, index_path, id_col, text_col)", 4, 4) {
        (spark, args) =>
        // the LAZY probe spelling: expansion happens at analysis time,
        // so the eager-checkpoint variant would run the probe's Spark
        // jobs during planning (EXPLAIN-only tooling would execute
        // work). Same rows; the batch's shingle sets are re-derived
        // per consumer instead of cached-and-released (r16)
        graft.operators.Dedup.ngramJaccardAgainstLazy(
          spark.table(litString(args(0), "batch_table")),
          graft.operators.Dedup.readJaccardIndex(spark,
            litString(args(1), "index_path")),
          litString(args(2), "id_col"), litString(args(3), "text_col"))
      },
      tvf("graft_embedding_probe",
        "(batch_table, corpus_table, index_path, id_col, vec_col" +
          "[, threshold])", 5, 6) { (spark, args) =>
        graft.operators.Dedup.embeddingNearDupsAgainst(
          spark.table(litString(args(0), "batch_table")),
          spark.table(litString(args(1), "corpus_table")),
          graft.operators.Dedup.readEmbeddingIndex(spark,
            litString(args(2), "index_path")),
          litString(args(3), "id_col"), litString(args(4), "vec_col"),
          if (args.length > 5) litDouble(args(5), "threshold") else 0.9)
      },
      // the hamming family has no path layout — its "index" is the
      // persisted fingerprint TABLE (Dedup.simhash output), so both
      // relation arguments are table/view names, like the embedding
      // TVF's corpus argument
      tvf("graft_simhash_probe",
        "(batch_table, fps_table, id_col, text_col[, bits, " +
          "max_hamming])", 4, 6) { (spark, args) =>
        graft.operators.Dedup.simhashNearDupsAgainst(
          spark.table(litString(args(0), "batch_table")),
          spark.table(litString(args(1), "fps_table")),
          litString(args(2), "id_col"), litString(args(3), "text_col"),
          if (args.length > 4) litInt(args(4), "bits") else 32,
          if (args.length > 5) litInt(args(5), "max_hamming") else 3)
      },
      // ---- retrieval/ANN family (r16): the serving operators round
      // 15 made first-class, reachable from pure SQL. Query terms
      // travel as one comma-separated literal (SQL TVF arguments are
      // scalar expressions; a quoted CSV keeps the call one line) ----
      tvf("graft_text_search",
        "(corpus_table, id_col, text_col, 'terms,csv', k)", 5, 5) {
        (spark, args) =>
        // lazy spelling: the eager sliver persist pins a new cache
        // entry per SQL invocation for the session's lifetime
        graft.operators.TextSearch.searchTopKLazy(
          spark.table(litString(args(0), "corpus_table")),
          litString(args(1), "id_col"), litString(args(2), "text_col"),
          csvTerms(args(3)), litInt(args(4), "k"))
      },
      tvf("graft_bm25_search",
        "(corpus_table, id_col, text_col, 'terms,csv', k[, k1, b])",
        5, 7) { (spark, args) =>
        // the LAZY spelling: the eager variant persists the query-term
        // sliver and eager-checkpoints to release it, which runs the
        // probe's Spark jobs during SQL planning (the jaccard TVF's
        // exact failure mode, found by the graft_curate zero-jobs spec)
        graft.operators.TextSearch.searchTopKBm25Lazy(
          spark.table(litString(args(0), "corpus_table")),
          litString(args(1), "id_col"), litString(args(2), "text_col"),
          csvTerms(args(3)), litInt(args(4), "k"),
          if (args.length > 5) litDouble(args(5), "k1") else 1.2,
          if (args.length > 6) litDouble(args(6), "b") else 0.75)
      },
      // brute-force cosine — the ANN correctness baseline; the query
      // panel is a view (small by the ranked contract, broadcast by
      // the operator), the corpus streams without shuffling
      tvf("graft_ann_probe",
        "(corpus_table, queries_table, id_col, vec_col, k)", 5, 5) {
        (spark, args) =>
        graft.operators.Similarity.bruteForceTopK(
          spark.table(litString(args(0), "corpus_table")),
          spark.table(litString(args(1), "queries_table")),
          litString(args(2), "id_col"), litString(args(3), "vec_col"),
          litInt(args(4), "k"))
      },
      // index-SERVED ANN (r17): the inverted-file probe from pure SQL,
      // closing the last SQL-vs-DataFrame parity seam — the assigned
      // (id, vec, cluster) table IS the IVF index (a view over
      // writeIvfIndex's cluster-partitioned layout, or a maintained
      // assignment), so serving touches only the nprobe closest
      // clusters' partitions instead of re-scanning the corpus.
      // Pure lazy plan: ivfTopK runs no training, no collect, no
      // persist — centroids and the query panel broadcast by contract
      tvf("graft_ivf_probe",
        "(assigned_table, centroids_table, queries_table, id_col, " +
          "vec_col, k[, nprobe])", 6, 7) { (spark, args) =>
        graft.operators.Similarity.ivfTopK(
          spark.table(litString(args(0), "assigned_table")),
          spark.table(litString(args(1), "centroids_table")),
          spark.table(litString(args(2), "queries_table")),
          litString(args(3), "id_col"), litString(args(4), "vec_col"),
          litInt(args(5), "k"),
          if (args.length > 6) litInt(args(6), "nprobe") else 4)
      },
      // PQ/ADC serving from SQL (r18): the codebook is a
      // (code_id, vec) VIEW (the training sample's hash-rank order —
      // itself expressible in SQL via graft_stable_hash60), the
      // encoded table holds (id, codes) at rest, and the expansion is
      // pure lazy — the codebook folds as a broadcast one-row
      // aggregate, LUT/ADC run as fixed-order HOFs bit-identical to
      // the PqOps expression path. Closes the last DataFrame-only ANN
      // surface (pqTopK / ivfTopKPq).
      tvf("graft_pq_probe",
        "(codebook_table, encoded_table, queries_table, id_col, " +
          "vec_col, m, k)", 7, 7) { (spark, args) =>
        graft.operators.Similarity.pqProbeFromTables(
          spark.table(litString(args(0), "codebook_table")),
          spark.table(litString(args(1), "encoded_table")),
          spark.table(litString(args(2), "queries_table")),
          litString(args(3), "id_col"), litString(args(4), "vec_col"),
          litInt(args(5), "m"), litInt(args(6), "k"))
      },
      tvf("graft_ivfpq_probe",
        "(assigned_codes_table, centroids_table, codebook_table, " +
          "queries_table, id_col, vec_col, m, k[, nprobe])", 8, 9) {
        (spark, args) =>
        graft.operators.Similarity.ivfPqProbeFromTables(
          spark.table(litString(args(0), "assigned_codes_table")),
          spark.table(litString(args(1), "centroids_table")),
          spark.table(litString(args(2), "codebook_table")),
          spark.table(litString(args(3), "queries_table")),
          litString(args(4), "id_col"), litString(args(5), "vec_col"),
          litInt(args(6), "m"), litInt(args(7), "k"),
          if (args.length > 8) litInt(args(8), "nprobe") else 4)
      },
      // incremental SemDeDup from SQL (r18): the hierarchy's three
      // artifact views (cluster assignment, level-1 centroids,
      // per-cell sub-seeds — Similarity.buildHierarchyIndex's
      // layout) serve the semantic near-dup probe: the batch is
      // assigned through the FROZEN seeds in one lazy pass
      // (assignToSeedsLazy — any_value carries the vector through
      // the argmax aggregate so analysis runs zero jobs) and
      // verified exactly against its cluster's corpus members only.
      // Cluster choice and cosine spelling are bit-identical to the
      // DataFrame path, so the expansion hash-matches
      // dedup_semantic_against's oracle
      tvf("graft_semdedup_probe",
        "(assigned_table, centroids_table, subseeds_table, " +
          "batch_table, id_col, vec_col[, threshold]); batch_table " +
          "ids must be unique (the lazy assignment groups by id)",
        6, 7) {
        (spark, args) =>
        val idCol = litString(args(4), "id_col")
        val vecCol = litString(args(5), "vec_col")
        val asg = graft.operators.Similarity.assignToSeedsLazy(
          spark.table(litString(args(3), "batch_table")),
          spark.table(litString(args(1), "centroids_table")),
          spark.table(litString(args(2), "subseeds_table")),
          idCol, vecCol)
        graft.operators.Dedup.semanticNearDupsAgainst(asg,
          spark.table(litString(args(0), "assigned_table")),
          idCol, vecCol, "cluster",
          if (args.length > 6) litDouble(args(6), "threshold")
          else 0.9)
      },
      // reciprocal-rank fusion of two ranked lists in the
      // (query_id, rank, neighbor_id) shape — the hybrid-serving
      // combiner; both views are panel-sized by the ranked contract
      tvf("graft_hybrid_rrf",
        "(ranked_table_1, ranked_table_2, k[, rrf_k])", 3, 4) {
        (spark, args) =>
        graft.operators.Similarity.rrfFuse(Seq(
            spark.table(litString(args(0), "ranked_table_1")),
            spark.table(litString(args(1), "ranked_table_2"))),
          litInt(args(2), "k"),
          if (args.length > 3) litInt(args(3), "rrf_k") else 60)
      },
      // index-SERVED retrieval (r16): the production serving shape —
      // candidates from the stored posting lists (a view over the
      // maintained index table), never a corpus re-scan for matching.
      // Both ops are pure lazy plans; like the simhash TVF, the
      // "index" is a TABLE, so its argument is a view name
      tvf("graft_index_search",
        "(index_table, docs_table, id_col, text_col, 'terms,csv', k)",
        6, 6) { (spark, args) =>
        graft.operators.TextSearch.searchTopKFromIndex(
          spark.table(litString(args(0), "index_table")),
          spark.table(litString(args(1), "docs_table")),
          litString(args(2), "id_col"), litString(args(3), "text_col"),
          csvTerms(args(4)), litInt(args(5), "k"))
      },
      tvf("graft_index_bm25",
        "(index_table, stats_table, docs_table, id_col, text_col, " +
          "'terms,csv', k[, k1, b])", 7, 9) { (spark, args) =>
        graft.operators.TextSearch.searchTopKBm25FromIndex(
          spark.table(litString(args(0), "index_table")),
          spark.table(litString(args(1), "stats_table")),
          spark.table(litString(args(2), "docs_table")),
          litString(args(3), "id_col"), litString(args(4), "text_col"),
          csvTerms(args(5)), litInt(args(6), "k"),
          if (args.length > 7) litDouble(args(7), "k1") else 1.2,
          if (args.length > 8) litDouble(args(8), "b") else 0.75)
      },
      // zero-exchange triage views (r16): exact-phrase membership and
      // first-hit context windows — both pure row-local scans
      tvf("graft_phrase_search",
        "(docs_table, id_col, text_col, 'phrase words')", 4, 4) {
        (spark, args) =>
        graft.operators.TextSearch.phraseSearch(
          spark.table(litString(args(0), "docs_table")),
          litString(args(1), "id_col"), litString(args(2), "text_col"),
          litString(args(3), "phrase"))
      },
      tvf("graft_snippets",
        "(docs_table, id_col, text_col, 'terms,csv'[, window])",
        4, 5) { (spark, args) =>
        graft.operators.TextSearch.searchSnippets(
          spark.table(litString(args(0), "docs_table")),
          litString(args(1), "id_col"), litString(args(2), "text_col"),
          csvTerms(args(3)),
          if (args.length > 4) litInt(args(4), "window") else 5)
      },
      // declarative curation from SQL (r16): the reviewable JSON
      // recipe ([[graft.operators.Curation.fromJson]]) compiled and
      // run over a view — filters, exact dedup, decontamination,
      // sampling, caps, splits, and the retrieval suffix, all from one
      // literal. Restricted to the recipe's LAZY stage subset so the
      // analysis-time expansion keeps the TVF invariant (planning
      // launches no Spark jobs): the set-resolution stages (the four
      // near-dedups' connected components, in-recipe classifier
      // training, mixture rates) EXECUTE work to build their plan and
      // stay DataFrame-API-only — they fail here with a pointed
      // message, not a surprise EXPLAIN-time job storm. Benchmark /
      // embedding table names inside the recipe resolve as table/view
      // names, like every other TVF relation argument.
      tvf("graft_curate",
        "(docs_table, id_col, text_col, 'json recipe')", 4, 4) {
        (spark, args) =>
        import graft.operators.Curation
        // the eager-stage rejection lives in runLazy itself, beside
        // the stage definitions — the TVF layer only parses and wires
        Curation.runLazy(spark.table(litString(args(0), "docs_table")),
          litString(args(1), "id_col"), litString(args(2), "text_col"),
          Curation.fromJson(litString(args(3), "recipe json")),
          resolveTable = name => spark.table(name))
      })
  }

  /** A comma-separated term-list literal as trimmed non-empty terms. */
  private def csvTerms(e: Expression): Seq[String] = {
    val raw = litString(e, "terms list")
    val terms = raw.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    require(terms.nonEmpty,
      s"terms list '$raw' contains no non-blank terms")
    terms
  }

  /** Runtime registration into an existing session (idempotent —
    * re-registering just overwrites with the same builder).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
    tableFunctions.foreach { case (ident, info, builder) =>
      spark.sessionState.tableFunctionRegistry
        .registerFunction(ident, info, builder)
    }
  }
}

/** Session-build-time injection:
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    GraftFunctions.tableFunctions.foreach(ext.injectTableFunction)
  }
}
