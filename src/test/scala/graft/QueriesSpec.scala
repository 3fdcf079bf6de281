package graft

import graft.queries.QueryDef

/** Registry-level smoke: every query runs on sf0.001 and the oracle map is
  * consistent with the query map (the driver's correctness gate contract).
  */
class QueriesSpec extends SparkSpecBase {

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    assert(SparkEntry.benchQueries.forall(qk.contains))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries whose result can legitimately be empty at tiny SF (LSH-based
    * near-dup pair sets). Everything else must return rows — an empty
    * result that hash-matches an empty oracle would hide a broken query.
    */
  private val mayBeEmpty = Set("dedup_simhash_pairs", "dedup_minhash_lsh",
    "dedup_embedding_cosine", "dedup_ngram_jaccard",
    "split_leakage_audit") // rides the minhash pair set

  for ((name, QueryDef(fn, _)) <- SparkEntry.allDefs) {
    test(s"query $name executes on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      // global plan lint: an unconstrained cartesian in ANY registry
      // query is a 100 TB job-killer, wherever it hides. (Deliberate
      // 1-row threshold crossJoins plan as BroadcastNestedLoopJoin and
      // stay legal.)
      assert(!df.queryExecution.executedPlan.toString
          .contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (mayBeEmpty(name)) df.write.format("noop").mode("overwrite").save()
      else assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
