package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableHash
import graft.operators.TextAnalysis

/** Continuous corpus curation — the streaming face of the batch recipe
  * proven by the `pipeline_curate_corpus` oracle query: language gate +
  * Gopher quality rules + exact dedup on normalized text, applied to
  * documents AS THEY ARRIVE instead of in a full-corpus pass.
  *
  * Design split:
  *  - the language and quality gates are stateless Column expressions
  *    (the exact ones the batch oracle verified — `TextAnalysis.langId`,
  *    `TextAnalysis.gopherKeep`), so they run inside the micro-batch
  *    scan with zero state;
  *  - dedup is the only stateful stage:
  *    `dropDuplicatesWithinWatermark` keyed on the 60-bit hash of the
  *    CCNet-normalized text (casing/punctuation/whitespace variants of
  *    a crawl collapse to one key). The watermark bounds the state to
  *    the re-crawl horizon — at 100 TB/day ingest the state store holds
  *    (docs per horizon) x ~24 bytes per partition, never the corpus.
  *    Full-corpus sweeps (minhash-LSH, SemDeDup) remain periodic batch
  *    jobs over the landed output ([[graft.operators.Dedup]]).
  */
object StreamingCurate {

  /** Gate + dedup a streaming document frame. Input needs an event-time
    * column `tsCol`; all other columns pass through unchanged.
    */
  def curate(docs: DataFrame, textCol: String, tsCol: String,
             lang: String = "en",
             minWords: Int = TextAnalysis.GopherDefaults.MinWords,
             watermark: String = "1 hour"): DataFrame =
    docs
      .filter(TextAnalysis.langId(col(textCol)) === lang)
      .filter(TextAnalysis.gopherKeep(col(textCol), minWords = minWords))
      .withColumn("__norm_hash",
        StableHash.hash60(TextAnalysis.normalizeForHash(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__norm_hash")
      .drop("__norm_hash")

  /** [[curate]] with intra-document repeated-chunk cleanup ahead of the
    * dedup key — the within-doc half of the chunk family is a pure
    * projection ([[graft.operators.Dedup.dropRepeatedChunks]]'s
    * first-occurrence filter), so it composes into the stateless scan
    * stage; the dedup key then hashes the CLEANED text, so re-crawls
    * differing only in repeated boilerplate runs collapse. (Cross-doc
    * boilerplate needs corpus-wide document frequencies — that stays a
    * periodic batch pass, like the LSH sweeps.) Adds `clean_text`.
    */
  def curateCleaned(docs: DataFrame, textCol: String, tsCol: String,
                    lang: String = "en",
                    minWords: Int = TextAnalysis.GopherDefaults.MinWords,
                    chunkWords: Int = 8,
                    watermark: String = "1 hour"): DataFrame = {
    docs
      .filter(TextAnalysis.langId(col(textCol)) === lang)
      .filter(TextAnalysis.gopherKeep(col(textCol), minWords = minWords))
      // materialize the chunk array BEFORE the first-occurrence filter:
      // referencing the chunking expression inside the lambda would
      // re-chunk the whole text once per array element
      .withColumn("__ch", graft.functions.TextShingles
        .wordChunks(col(textCol), chunkWords))
      .withColumn("clean_text", array_join(
        filter(col("__ch"), (c, i) =>
          array_position(col("__ch"), c) === (i + 1).cast("long")), " "))
      .withColumn("__norm_hash",
        StableHash.hash60(
          TextAnalysis.normalizeForHash(col("clean_text"))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__norm_hash")
      .drop("__ch", "__norm_hash")
  }
}
