package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** mergeComponents must be indistinguishable from a full rebuild:
  * CC(old ∪ new) == mergeComponents(CC(old), new) on every graph.
  */
// driver-excluded slow suite (r21): run with SPARK_GRAFT_SLOW_TESTS=1
@graft.tags.Slow
class IncrementalComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  private def merged(oldPairs: Seq[(Long, Long)],
                     newPairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val labels = Dedup.connectedComponents(
      oldPairs.toDF("id_a", "id_b"), "id_a", "id_b")
    Dedup.mergeComponents(labels, newPairs.toDF("id_a", "id_b"),
      "id_a", "id_b").as[(Long, Long)].collect().toMap
  }

  test("new edge bridging two old components merges them") {
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val nw = Seq((3L, 10L))
    assert(merged(old, nw) == cc(old ++ nw))
    // and concretely: 10/11 fold into component 1, 20/21 untouched
    val m = merged(old, nw)
    assert(m(10L) == 1L && m(11L) == 1L && m(20L) == 20L && m(21L) == 20L)
  }

  test("pairs among brand-new nodes form their own component") {
    val old = Seq((1L, 2L))
    val nw = Seq((100L, 101L), (101L, 102L))
    assert(merged(old, nw) == cc(old ++ nw))
  }

  test("new node attaching to an old component inherits its label") {
    val old = Seq((5L, 6L), (6L, 7L))
    val nw = Seq((7L, 99L))
    val m = merged(old, nw)
    assert(m == cc(old ++ nw) && m(99L) == 5L)
  }

  test("untouched components pass through byte-identical") {
    val old = Seq((1L, 2L), (50L, 51L), (51L, 52L))
    val nw = Seq((1L, 3L))
    val m = merged(old, nw)
    assert(m == cc(old ++ nw))
    assert(m(50L) == 50L && m(51L) == 50L && m(52L) == 50L)
  }

  test("empty new batch is the identity") {
    val old = Seq((1L, 2L), (4L, 5L))
    assert(merged(old, Seq.empty) == cc(old))
  }

  test("new edge with a LOWER id than an old component min relabels it") {
    // the recomputed subgraph min must win over the stored label
    val old = Seq((10L, 11L), (11L, 12L))
    val nw = Seq((1L, 12L))
    val m = merged(old, nw)
    assert(m == cc(old ++ nw) && m.values.forall(_ == 1L))
  }

  test("chain of new edges threading through several old components") {
    val old = Seq((1L, 2L), (10L, 11L), (20L, 21L), (30L, 31L))
    val nw = Seq((2L, 10L), (11L, 20L)) // 30/31 stays out
    val m = merged(old, nw)
    assert(m == cc(old ++ nw))
    assert(Set(1L, 2L, 10L, 11L, 20L, 21L).forall(m(_) == 1L))
    assert(m(30L) == 30L && m(31L) == 30L)
  }

  test("equivalence on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val nodes = 120
    val oldPairs = Seq.fill(90)(
      (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
      .filter { case (a, b) => a != b }
    val newPairs = Seq.fill(25)(
      (rnd.nextInt(nodes + 40).toLong, rnd.nextInt(nodes + 40).toLong))
      .filter { case (a, b) => a != b }
    assert(merged(oldPairs, newPairs) == cc(oldPairs ++ newPairs))
  }
}
