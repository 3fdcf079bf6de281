package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  test("chain components collapse to the min id") {
    // 1-2-3-4-5 chain plus the separate 10-11 edge: pointer jumping must
    // walk the whole chain, not just direct neighbors
    val m = labelsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("two clusters bridged by one edge merge into one component") {
    val m = labelsOf(Seq((5L, 6L), (6L, 7L), (20L, 21L), (21L, 22L),
      (7L, 20L)))
    assert(m.values.toSet == Set(5L))
    assert(m.keySet == Set(5L, 6L, 7L, 20L, 21L, 22L))
  }

  test("long path converges within the pointer-jumping budget") {
    // a 200-node path: naive propagation needs ~200 rounds; pointer
    // jumping must finish inside the default 25-iteration cap
    val edges = (1L until 200L).map(i => (i, i + 1))
    val m = labelsOf(edges)
    assert(m.size == 200 && m.values.forall(_ == 1L))
  }

  test("empty pair graph yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").isEmpty)
  }

  test("keepCanonical drops only non-canonical members") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val labels = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"), "id_a", "id_b")
    val kept = Dedup.keepCanonical(docs, "doc_id", labels)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L)) // 2 and 3 fold into component 1
  }

  test("keepCanonicalBy keeps the highest-priority member, ties to min id") {
    val docs = Seq((1L, "crawl"), (2L, "wiki"), (3L, "wiki"),
      (4L, "crawl"), (10L, "crawl"), (11L, "crawl"))
      .toDF("doc_id", "source")
    val labels = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b"),
      "id_a", "id_b")
    val kept = Dedup.keepCanonicalBy(docs, "doc_id", labels,
        when(col("source") === "wiki", 1).otherwise(0))
      .select("doc_id").as[Long].collect().toSet
    // cluster {1,2,3}: wiki members 2,3 outrank crawl 1; tie -> min = 2.
    // cluster {10,11}: all crawl -> min id 10. Unpaired 4 keeps itself.
    assert(kept == Set(2L, 4L, 10L))
  }
}
