package graft.sink

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** DeltaMerge: merge-on-read flush path (O(batch) writes, broadcast
  * no-shuffle reads, amortized compaction).
  */
class DeltaMergeSpec extends SparkSpecBase {
  import spark.implicits._

  test("delta flushes merge on read; base files untouched until compact") {
    val dir = Files.createTempDirectory("dmerge").toString
    val t = s"$dir/t"
    val base = (1L to 1000L).map(i => (i, s"v$i", 1L))
      .toDF("id", "v", "seq")
    DeltaMerge.flushDelta(spark, base, t, Seq("id"), "seq")

    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def baseFiles() = fsys.listStatus(
      new org.apache.hadoop.fs.Path(DeltaMerge.basePath(t)))
      .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
      .toSet

    val before = baseFiles()
    // two delta flushes: update, insert, then a later update of the same key
    DeltaMerge.flushDelta(spark,
      Seq((5L, "v5-new", 2L), (1001L, "fresh", 2L)).toDF("id", "v", "seq"),
      t, Seq("id"), "seq")
    DeltaMerge.flushDelta(spark,
      Seq((5L, "v5-newer", 3L)).toDF("id", "v", "seq"),
      t, Seq("id"), "seq")
    assert(baseFiles() == before, "delta flushes must not touch the base")

    val merged = DeltaMerge.readMerged(spark, t, Seq("id"), "seq")
    assert(merged.count() == 1001)
    val got = merged.filter(col("id").isin(5L, 1001L, 7L))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(5L -> "v5-newer", 1001L -> "fresh", 7L -> "v7"))

    // the read plan must not shuffle the base: delta side is broadcast
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"expected broadcast join:\n$plan")
  }

  test("compaction folds deltas into the base and clears them") {
    val dir = Files.createTempDirectory("dmerge2").toString
    val t = s"$dir/t"
    DeltaMerge.flushDelta(spark,
      (1L to 100L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "seq"),
      t, Seq("id"), "seq")
    DeltaMerge.flushDelta(spark,
      Seq((1L, "upd", 2L)).toDF("id", "v", "seq"), t, Seq("id"), "seq")
    DeltaMerge.compact(spark, t, Seq("id"), "seq")

    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dp = new org.apache.hadoop.fs.Path(DeltaMerge.deltaPath(t))
    assert(!fsys.exists(dp) || fsys.listStatus(dp).isEmpty)
    val merged = DeltaMerge.readMerged(spark, t, Seq("id"), "seq")
    assert(merged.count() == 100)
    assert(merged.filter(col("id") === 1L).select("v")
      .as[String].head() == "upd")
  }

  test("empty batches are harmless no-ops") {
    val dir = Files.createTempDirectory("dmerge-empty").toString
    val t = s"$dir/t"
    val base = Seq((1L, "a", 1L)).toDF("id", "v", "seq")
    DeltaMerge.flushDelta(spark, base, t, Seq("id"), "seq")
    DeltaMerge.flushDelta(spark, base.limit(0), t, Seq("id"), "seq")
    assert(DeltaMerge.readMerged(spark, t, Seq("id"), "seq").count() == 1)

    val pdir = s"$dir/p"
    MergeSink.flushPartitioned(spark, base, pdir, Seq("id"), "seq",
      numParts = 4)
    MergeSink.flushPartitioned(spark, base.limit(0), pdir, Seq("id"),
      "seq", numParts = 4)
    assert(spark.read.parquet(pdir).count() == 1)
  }

  test("auto-compaction triggers on delta growth; tombstones hard-delete") {
    val dir = Files.createTempDirectory("dmerge3").toString
    val t = s"$dir/t"
    val withTomb = (1L to 50L).map(i => (i, s"v$i", 1L, null: String))
      .toDF("id", "v", "seq", "_sdc_deleted_at")
    DeltaMerge.flushAuto(spark, withTomb, t, Seq("id"), "seq",
      hardDelete = true)
    // large delta (same size as base) forces a compaction — floor 0
    // restores the pure fractional trigger so the fold is observable
    // at test scale
    val c0 = DeltaMerge.compactionCount.sum()
    val tomb = (1L to 25L).map(i => (i, s"v$i", 2L, "2024-01-01"))
      .toDF("id", "v", "seq", "_sdc_deleted_at")
    DeltaMerge.flushAuto(spark, tomb, t, Seq("id"), "seq",
      hardDelete = true, compactDeltaFraction = 0.1,
      compactMinDeltaBytes = 0L)
    assert(DeltaMerge.compactionCount.sum() == c0 + 1,
      "the fractional trigger with floor 0 must fold exactly once")
    val merged = DeltaMerge.readMerged(spark, t, Seq("id"), "seq",
      hardDelete = true)
    assert(merged.select("id").as[Long].collect().toSet ==
      (26L to 50L).toSet)
  }

  test("compaction floor suppresses small-base rewrites; merged view " +
      "identical") {
    val dir = Files.createTempDirectory("dmerge-floor").toString
    // two tables fed the same batches: one with the default 64 MB
    // floor (never compacts at this scale), one with floor 0 (the
    // pre-r19 behavior — compacts every batch once deltas pass 10% of
    // base). End states must be row-identical; only the rewrite count
    // differs.
    val floored = s"$dir/floored"
    val eager = s"$dir/eager"
    val c0 = DeltaMerge.compactionCount.sum()
    (1L to 5L).foreach { seq =>
      val batch = (1L to 40L)
        .map(i => (i, s"v$i@$seq", seq, null: String))
        .toDF("id", "v", "seq", "_sdc_deleted_at")
      DeltaMerge.flushAuto(spark, batch, floored, Seq("id"), "seq",
        hardDelete = true)
      DeltaMerge.flushAuto(spark, batch, eager, Seq("id"), "seq",
        hardDelete = true, compactMinDeltaBytes = 0L)
    }
    val eagerCompactions = DeltaMerge.compactionCount.sum() - c0
    assert(eagerCompactions >= 3,
      s"floor-0 twin expected to compact most batches, did $eagerCompactions")
    val f = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(f.listStatus(new org.apache.hadoop.fs.Path(
        DeltaMerge.deltaPath(floored))).nonEmpty,
      "default floor must leave small deltas unfolded")
    def state(t: String) = DeltaMerge.readMerged(spark, t, Seq("id"),
        "seq", hardDelete = true)
      .select("id", "v", "seq").as[(Long, String, Long)]
      .collect().toSet
    assert(state(floored) == state(eager),
      "floor must not change the merged view")
  }

  test("bootstrap flush is staged+swapped and drops tombstones on hardDelete") {
    val dir = Files.createTempDirectory("dmerge-boot").toString
    val t = s"$dir/t"
    // first-ever flush carries a tombstone: a changelog replayed from
    // scratch must not keep a row whose last event is a delete
    val batch = Seq(
      (1L, "live", 1L, null: String),
      (2L, "dead", 1L, "2024-01-01")).toDF("id", "v", "seq",
      "_sdc_deleted_at")
    DeltaMerge.flushDelta(spark, batch, t, Seq("id"), "seq",
      hardDelete = true)
    val rows = DeltaMerge.readMerged(spark, t, Seq("id"), "seq")
      .select("id").as[Long].collect().toSet
    assert(rows == Set(1L), "bootstrap must apply the tombstone drop")
    // the staged write was promoted: no stage/old residue next to base
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val residue = fsys.listStatus(new org.apache.hadoop.fs.Path(t))
      .map(_.getPath.getName).filter(n => n.contains(".stage") ||
        n.contains(".old")).toSeq
    assert(residue.isEmpty, s"unexpected residue: $residue")
  }

  test("near-dup operators release their corpus-sized caches") {
    import graft.operators.Dedup
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
    val vecs = (0L to 9L).map(i =>
      (i, Seq.tabulate(8)(j => if (j == i % 4) 1.0f else 0.1f)))
      .toDF("vec_id", "embedding")
    Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      numPlanes = 4, bandBits = 2, threshold = 0.999).count()
    // each call may leave its (tiny) localCheckpoint result blocks behind
    // until GC — but the corpus-sized persisted projections must be gone,
    // so at most 2 new persistent RDDs (the two checkpoints), not 4
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 2,
      s"cached corpus projections leaked: $leaked")
  }
}
