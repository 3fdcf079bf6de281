package graft.sink

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class MergeSinkSpec extends SparkSpecBase {
  import spark.implicits._

  test("dedupLastWins keeps the newest row per PK") {
    val batch = Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "c", 5L))
      .toDF("id", "v", "seq")
    val out = MergeSink.dedupLastWins(batch, Seq("id"), "seq")
      .orderBy("id").as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "b", 20L), (2L, "c", 5L)))
  }

  test("merge upserts, inserts, and respects hardDelete tombstones") {
    val target = Seq((1L, "old", null: String), (2L, "keep", null: String))
      .toDF("id", "v", "_sdc_deleted_at")
    val updates = Seq((1L, "new", null: String), (3L, "ins", null: String),
      (2L, "gone", "2024-01-01")).toDF("id", "v", "_sdc_deleted_at")
    val soft = MergeSink.merge(target, updates, Seq("id"))
      .orderBy("id").select("id", "v").as[(Long, String)].collect()
    assert(soft.toSeq == Seq((1L, "new"), (2L, "gone"), (3L, "ins")))
    val hard = MergeSink.merge(target, updates, Seq("id"), hardDelete = true)
      .orderBy("id").select("id", "v").as[(Long, String)].collect()
    assert(hard.toSeq == Seq((1L, "new"), (3L, "ins")))
  }

  test("flush publishes atomically and is idempotent under replay") {
    val dir = Files.createTempDirectory("mergesink").toString
    val tablePath = s"$dir/t"
    val b1 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "seq")
    MergeSink.flush(spark, b1, tablePath, Seq("id"), "seq")
    val b2 = Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "seq")
    MergeSink.flush(spark, b2, tablePath, Seq("id"), "seq")
    // replay the same batch (at-least-once delivery) — must converge
    MergeSink.flush(spark, b2, tablePath, Seq("id"), "seq")
    val out = spark.read.parquet(tablePath).orderBy("id")
      .select("id", "v").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("flush evolves schema: new column arrives, old rows read null") {
    val dir = Files.createTempDirectory("mergesink2").toString
    val tablePath = s"$dir/t"
    val b1 = Seq((1L, "a", 1L)).toDF("id", "v", "seq")
    MergeSink.flush(spark, b1, tablePath, Seq("id"), "seq")
    val b2 = Seq((2L, "b", 2L, 9.5)).toDF("id", "v", "seq", "extra")
    MergeSink.flush(spark, b2, tablePath, Seq("id"), "seq")
    val df = spark.read.parquet(tablePath)
    assert(df.columns.contains("extra"))
    val r1 = df.filter(col("id") === 1L).select("extra").head()
    assert(r1.isNullAt(0))
  }

  test("append keeps both copies for no-PK streams") {
    val a = Seq((1L, "x")).toDF("id", "v")
    assert(MergeSink.append(a, a).count() == 2)
  }
}
