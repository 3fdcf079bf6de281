package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class AsOfRangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("asof backward picks the latest right row at or before each left") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 4L, "early"),
      (2L, 50L, "c")).toDF("k", "lts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (1L, 20L, 300.0),
      (2L, 60L, 999.0)).toDF("k", "rts", "price")
    val out = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      Seq("price"))
      .select("k", "lts", "tag", "price")
      .as[(Long, Long, String, Double)].collect().toSet
    // lts=10 -> rts=5; lts=20 -> rts=20 (equal ts matches); lts=4 and
    // k=2 lts=50 have no prior right row -> dropped (inner)
    assert(out == Set((1L, 10L, "a", 100.0), (1L, 20L, "b", 300.0)))
  }

  test("asof left join keeps unmatched left rows with null values") {
    val left = Seq((1L, 10L), (1L, 3L)).toDF("k", "lts")
    val right = Seq((1L, 5L, 7.0)).toDF("k", "rts", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      Seq("v"), inner = false)
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(out == Set((1L, 10L, Some(7.0)), (1L, 3L, None)))
  }

  test("asof join plan has exactly one exchange, no nested-loop join") {
    val left = Seq((1L, 10L)).toDF("k", "lts")
    val right = Seq((1L, 5L, 7.0)).toDF("k", "rts", "v")
    val plan = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      Seq("v")).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), "must not nested-loop")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      "must be a single windowed pass, not a join")
  }

  test("range join matches points to spanning intervals exactly once") {
    val points = Seq((1L, 100L, 10L), (1L, 250L, 11L), (1L, 9999L, 12L),
      (2L, 100L, 13L)).toDF("k", "p", "pid")
    // interval 0..300 spans multiple buckets at width 100 — the point at
    // 250 must appear ONCE despite the interval exploding to 4 buckets
    val intervals = Seq((1L, 0L, 300L, 77L), (2L, 90L, 110L, 88L))
      .toDF("k", "lo", "hi", "iid")
    val out = RangeJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", bucketWidth = 100L, keys = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(out.sorted == Seq((10L, 77L), (11L, 77L), (13L, 88L)))
  }

  test("range join respects inclusive bounds and rejects bad intervals") {
    val points = Seq((5L, 1L), (10L, 2L), (11L, 3L)).toDF("p", "pid")
    val intervals = Seq((5L, 10L, 1L), (20L, 15L, 2L))
      .toDF("lo", "hi", "iid") // second interval inverted -> filtered
    val out = RangeJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", bucketWidth = 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(out.sorted == Seq((1L, 1L), (2L, 1L)))
  }
}
