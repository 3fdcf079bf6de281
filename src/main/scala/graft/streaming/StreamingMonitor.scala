package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextSearch

/** Standing-query monitors over a document stream — the streaming twin
  * of the [[graft.operators.TextSearch]] scan probes: every arriving
  * document is checked against a fixed alert list (leaked benchmark
  * strings, banned content markers, tracked topics) as it lands,
  * instead of waiting for the next batch decontamination sweep.
  *
  * Both monitors are STATELESS scan projections (the phrase/term
  * kernels are per-row), so they compose into any existing stream —
  * no watermark, no state store, restart-safe by construction; the
  * batch operators remain the oracle-verified semantics of record,
  * and these apply the same kernels per micro-batch.
  */
object StreamingMonitor {

  /** Rows `(…, phrase, n_hits)` for every arriving doc containing any
    * of `phrases` verbatim (word-sequence semantics, occurrence counts
    * — exactly [[TextSearch.phraseSearch]] per phrase). Phrases are
    * normalized with the corpus tokenization rule; the emitted `phrase`
    * column carries the normalized form.
    */
  def phraseAlerts(docs: DataFrame, textCol: String,
                   phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phrases must be non-empty")
    val normalized = phrases.map(_.toLowerCase.trim.split("\\s+").toSeq)
      .filter(ws => ws.nonEmpty && ws.head.nonEmpty)
      .map(_.mkString(" ")).distinct
    require(normalized.nonEmpty, "phrases must contain at least one word")
    val hitEntries = normalized.map { needle =>
      val n = needle.split(" ").length
      struct(lit(needle).as("phrase"),
        size(filter(
          graft.functions.TextShingles.wordShingles(col(textCol), n),
          _ === lit(needle))).cast("long").as("n_hits"))
    }
    docs
      .withColumn("__hit",
        explode(filter(array(hitEntries: _*), h => h("n_hits") > 0)))
      .withColumn("phrase", col("__hit.phrase"))
      .withColumn("n_hits", col("__hit.n_hits"))
      .drop("__hit")
  }

  /** Arriving docs containing EVERY term of the standing query, scored
    * with the exact integer tf·idf of [[TextSearch.searchTopK]] using
    * FROZEN corpus statistics (df per term + corpus size N, e.g. from a
    * published [[TextSearch.invertedIndex]]'s slot-0 rows) — corpus
    * stats must be a bounded model artifact here, because a stateless
    * per-batch monitor cannot see the whole stream history. Terms
    * missing from `dfByTerm` fail loudly rather than silently scoring
    * zero docs.
    */
  def conjunctiveAlerts(docs: DataFrame, textCol: String,
                        terms: Seq[String], dfByTerm: Map[String, Long],
                        nDocs: Long): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(nDocs > 0, s"nDocs ($nDocs) must be > 0")
    val qTerms = terms.map(_.toLowerCase).distinct
    val missing = qTerms.filterNot(dfByTerm.contains)
    require(missing.isEmpty,
      s"no df stats for terms: ${missing.mkString(", ")} — refresh the " +
        "index the monitor was frozen from")
    val scoreEntries = qTerms.map { t =>
      val w = (nDocs * TextSearch.IdfScale) / dfByTerm(t)
      val tf = size(filter(
        graft.functions.TextShingles.wordShingles(col(textCol), 1),
        _ === lit(t))).cast("long")
      struct(tf.as("tf"), (tf * lit(w)).as("s"))
    }
    val entries = array(scoreEntries: _*)
    docs
      .withColumn("__matched", size(filter(entries, e => e("tf") > 0)))
      .filter(col("__matched") === qTerms.size)
      .withColumn("score",
        aggregate(entries, lit(0L), (acc, e) => acc + e("s")))
      .drop("__matched")
  }
}
