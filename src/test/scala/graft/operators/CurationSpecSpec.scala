package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class CurationSpecSpec extends SparkSpecBase {
  import spark.implicits._
  import Curation._

  private val en = "the cat and the dog went to the house with the " +
    "garden and they played in that green field all day long with joy " +
    "is what we read"

  test("leading per-row stages fuse into one scan (no joins, no shuffle)") {
    val docs = Seq((1L, en), (2L, "der hund und die katze"))
      .toDF("doc_id", "text")
    val out = Curation.run(docs, "doc_id", "text",
      CurationSpec(Seq(LangFilter("en"), GopherFilter(minWords = 20))))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"fused per-row stages must stay a scan:\n$plan")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("set stages run in order over survivors; split column appended") {
    // two exact copies (one dies in ExactDedup) + distinct docs
    val docs = Seq((1L, en), (2L, en), (3L, en + " extra tail words"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("source", lit("s"))
    val out = Curation.run(docs, "doc_id", "text", CurationSpec(Seq(
      ExactDedup,
      CapPerGroup("source", "n_chars", cap = 2),
      HashSplit(Seq("train" -> 0.5, "test" -> 0.5)))))
    val rows = out.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(rows.keySet == Set(1L, 3L)) // 2 deduped, cap keeps both
    assert(rows.values.forall(Set("train", "test")))
  }

  test("fromJson round-trips the full recipe; bad input fails loudly") {
    val spec = Curation.fromJson("""{"stages": [
      {"stage": "lang", "lang": "en"},
      {"stage": "gopher", "min_words": 20},
      {"stage": "classifier", "weights": [1, -2, 3], "min_score": -878},
      {"stage": "exact_dedup"},
      {"stage": "near_dedup", "k": 3, "num_hashes": 12,
       "rows_per_band": 3, "threshold": 0.5},
      {"stage": "cap_per_group", "group": "source", "order": "n_chars",
       "cap": 10},
      {"stage": "split", "weights": {"train": 0.9, "valid": 0.1}}
    ]}""")
    assert(spec == CurationSpec(Seq(
      LangFilter("en"), GopherFilter(20),
      ClassifierFilter(Seq(1, -2, 3), -878L), ExactDedup,
      NearDedup(3, 12, 3, 0.5), CapPerGroup("source", "n_chars", 10),
      HashSplit(Seq("train" -> 0.9, "valid" -> 0.1)))))
    intercept[IllegalArgumentException](
      Curation.fromJson("""{"stages": [{"stage": "nope"}]}"""))
    assert(Curation.fromJson("""{"stages": [
      {"stage": "train_classifier", "label_col": "source",
       "label_value": "wiki", "dim": 512, "min_score": -878}
    ]}""") == CurationSpec(Seq(
      TrainClassifier("source", "wiki", 512, -878L))))
    assert(Curation.fromJson("""{"stages": [
      {"stage": "sample", "fraction": 0.8},
      {"stage": "decontaminate", "benchmark": "bench", "min_hits": 2}
    ]}""") == CurationSpec(Seq(
      Sample(0.8), Decontaminate("bench", "text", 13, 2L))),
      "optional decontaminate fields must default")
    assert(Curation.fromJson("""{"stages": [
      {"stage": "mixture", "weights": {"a": 2.0, "b": 1.0}}
    ]}""") == CurationSpec(Seq(
      Mixture("source", Seq("a" -> 2.0, "b" -> 1.0)))),
      "mixture source_col must default to 'source'")
    // r14 vocabulary: the remaining dedup flavors + published-index
    // decontamination, defaults included
    assert(Curation.fromJson("""{"stages": [
      {"stage": "simhash_dedup", "bits": 64, "max_hamming": 2},
      {"stage": "jaccard_dedup"},
      {"stage": "embedding_dedup", "vec_col": "emb", "num_planes": 16,
       "band_bits": 4, "threshold": 0.4},
      {"stage": "decontaminate_index", "index": "/some/dir",
       "min_hits": 2}
    ]}""") == CurationSpec(Seq(
      SimhashDedup(64, 2), JaccardDedup(3, 0.8),
      EmbeddingDedup("emb", 16, 4, 0.4),
      DecontaminateIndex("/some/dir", 2L))),
      "new dedup stages must parse with defaults")
    intercept[IllegalArgumentException](
      Curation.fromJson("""{"stages": [{"stage": "decontaminate_index"}]}"""))
    intercept[IllegalArgumentException](
      Curation.fromJson(
        """{"stages": [{"stage": "train_classifier", "dim": 8}]}"""))
    intercept[IllegalArgumentException](
      Curation.fromJson("""{"stages": [{"stage": "gopher"}]}"""))
    intercept[IllegalArgumentException](
      Curation.fromJson("""{"stages": []}"""))
  }

  test("sample fuses as a scan predicate; decontaminate drops hits") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta tail words here"),
      (2L, en), (3L, en + " more words")).toDF("doc_id", "text")
    // fraction 1.0 keeps everything; doc 1 contains >= 1 benchmark
    // 4-gram and dies; the others survive
    val out = Curation.run(docs, "doc_id", "text", CurationSpec(Seq(
        Sample(1.0), Decontaminate("bench", "text", k = 4, minHits = 1))),
      resolveTable = name => { assert(name == "bench"); bench })
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
    // a sample-only recipe stays a pure scan (no joins, no exchange)
    val plan = Curation.run(docs, "doc_id", "text",
      CurationSpec(Seq(Sample(0.5)))).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"sample must fuse into the scan:\n$plan")
  }

  test("a per-row stage after a set stage still composes as a filter") {
    val docs = Seq((1L, en), (2L, en), (3L, "kurz"))
      .toDF("doc_id", "text")
    val out = Curation.run(docs, "doc_id", "text", CurationSpec(Seq(
      ExactDedup, GopherFilter(minWords = 20))))
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("retrieval stages must form the recipe suffix, one retriever") {
    // doc-shape stage after a retrieval stage
    intercept[IllegalArgumentException](CurationSpec(Seq(
      Retrieve(Seq("cat"), 5), ExactDedup)))
    // hard_negatives with no upstream ranked list
    intercept[IllegalArgumentException](CurationSpec(Seq(
      LangFilter("en"), MineHardNegatives("source", "s", 5))))
    // two retrievers
    intercept[IllegalArgumentException](CurationSpec(Seq(
      Retrieve(Seq("cat"), 5), Retrieve(Seq("dog"), 5))))
    // the valid shape constructs
    CurationSpec(Seq(LangFilter("en"), Retrieve(Seq("cat"), 5),
      MineHardNegatives("source", "s", 3)))
  }

  test("retrieve + hard_negatives compiled ≡ imperative chain") {
    val docs = Seq(
      (1L, en + " cat", "pos"), (2L, en + " cat cat", "neg"),
      (3L, en + " cat dog", "pos"), (4L, en + " dog", "neg"),
      (5L, "der hund und die katze cat", "neg"))
      .toDF("doc_id", "text", "source")
    val spec = Curation.fromJson("""{"stages": [
      {"stage": "lang", "lang": "en"},
      {"stage": "retrieve", "terms": ["cat"], "k": 4,
       "scorer": "bm25", "query_id": 9},
      {"stage": "hard_negatives", "label_col": "source",
       "label_value": "pos", "k": 2}
    ]}""")
    val compiled = Curation.run(docs, "doc_id", "text", spec)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    // the imperative spelling: filter → BM25 over survivors → rank →
    // drop pos-source neighbors → re-rank top 2
    val base = docs.filter(TextAnalysis.langId(col("text")) === "en")
    val ranked = graft.operators.Similarity.rankTopK(
      TextSearch.searchTopKBm25(base, "doc_id", "text", Seq("cat"), 4)
        .select(lit(9L).as("query_id"),
          col("doc_id").cast("long").as("neighbor_id"),
          col("score").cast("double").as("sim")), 4)
    val positives = base.filter(col("source") === "pos")
      .select(col("doc_id").as("neighbor_id"))
      .join(ranked.select(col("query_id"), col("neighbor_id")),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"))
    val imperative = graft.operators.Similarity
      .hardNegatives(ranked, positives, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(compiled == imperative && compiled.nonEmpty)
    // doc 5 fails the lang filter: it must never appear even though it
    // contains the query term — retrieval ran over the CURATED corpus
    assert(!compiled.exists(_._3 == 5L))
    // positives (source=pos) are excluded
    assert(!compiled.exists(t => t._3 == 1L || t._3 == 3L))
  }

  test("hybrid recipe prunes both arms to the curated survivors") {
    val docs = Seq(
      (1L, en + " cat"), (2L, en + " cat cat"), (3L, en + " cat dog"),
      (4L, "die katze cat cat cat"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.9f, 0.2f)),
      (3L, Array(0.1f, 1.0f)), (4L, Array(1.0f, 0.0f)),
      (9L, Array(1.0f, 0.05f)))
      .toDF("vec_id", "embedding")
    val out = Curation.run(docs, "doc_id", "text", CurationSpec(Seq(
        LangFilter("en"),
        HybridRetrieve(Seq("cat"), 3, "emb", queryId = 9L))),
      resolveTable = name => { assert(name == "emb"); emb })
    val neighbors = out.select("neighbor_id").as[Long].collect().toSet
    // doc 4 is the strongest lexical AND vector hit but fails lang-id:
    // both arms must have pruned it
    assert(neighbors.nonEmpty && !neighbors.contains(4L))
    assert(neighbors.subsetOf(Set(1L, 2L, 3L)))
    // the ranked shape with the fusion score
    assert(out.columns.toSeq ==
      Seq("query_id", "rank", "neighbor_id", "rrf"))
  }

  test("fromJson parses the retrieval grammar") {
    val spec = Curation.fromJson("""{"stages": [
      {"stage": "retrieve", "terms": ["a", "b"], "k": 7},
      {"stage": "hard_negatives", "label_col": "lab",
       "label_value": "x", "k": 3}
    ]}""")
    assert(spec == CurationSpec(Seq(
      Retrieve(Seq("a", "b"), 7, "tfidf", 0L),
      MineHardNegatives("lab", "x", 3))))
    val hy = Curation.fromJson("""{"stages": [
      {"stage": "hybrid", "terms": ["a"], "k": 5,
       "embeddings": "emb", "query_id": 7, "scorer": "bm25",
       "rrf_k": 10}
    ]}""")
    assert(hy == CurationSpec(Seq(HybridRetrieve(
      Seq("a"), 5, "emb", 7L, "bm25", "vec_id", "embedding", 10))))
    // missing required field fails loudly
    intercept[IllegalArgumentException](Curation.fromJson(
      """{"stages": [{"stage": "retrieve", "k": 5}]}"""))
    // bad scorer fails loudly
    intercept[IllegalArgumentException](Curation.fromJson(
      """{"stages": [{"stage": "retrieve", "terms": ["a"], "k": 5,
         "scorer": "cosine"}]}"""))
  }
}
