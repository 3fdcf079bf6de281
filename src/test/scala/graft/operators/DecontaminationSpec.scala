package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Decontamination: benchmark k-gram overlap flags and removes
  * contaminated training documents.
  */
class DecontaminationSpec extends SparkSpecBase {
  import spark.implicits._

  private val bench = Seq(
    (100L, "what is the capital of france exactly"),
    (101L, "list three primes under ten quickly")).toDF("qid", "q")

  private val docs = Seq(
    (1L, "the tutorial asks what is the capital of france exactly and answers it"),
    (2L, "an unrelated essay about growing tomatoes in clay soil at altitude"),
    (3L, "quiz dump list three primes under ten quickly two three five")
  ).toDF("doc_id", "text")

  test("documents containing benchmark k-grams are flagged with hit counts") {
    val grams = Decontamination.benchmarkGrams(bench, "q", k = 4)
    val hits = Decontamination
      .contaminationHits(docs, "doc_id", "text", grams, k = 4)
      .as[(Long, Long)].collect().toMap
    assert(hits.keySet == Set(1L, 3L), s"clean doc must be absent: $hits")
    // doc 1 contains the full 7-word question => four distinct 4-grams
    assert(hits(1L) == 4L)
    assert(hits(3L) == 3L)
  }

  test("decontaminate removes flagged docs and keeps the clean corpus") {
    val clean = Decontamination.decontaminate(docs, "doc_id", "text",
      bench, "q", k = 4)
    assert(clean.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    // higher minHits threshold keeps the lightly-overlapping doc
    val lax = Decontamination.decontaminate(docs, "doc_id", "text",
      bench, "q", k = 4, minHits = 4)
    assert(lax.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("the corpus side of the overlap join is broadcast, not shuffled") {
    val grams = Decontamination.benchmarkGrams(bench, "q", k = 4)
    val plan = Decontamination
      .contaminationHits(docs, "doc_id", "text", grams, k = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join of benchmark grams:\n$plan")
  }
}
