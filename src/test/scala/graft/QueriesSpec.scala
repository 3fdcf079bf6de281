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

  for ((name, QueryDef(fn, _)) <- SparkEntry.allDefs) {
    test(s"query $name executes on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
