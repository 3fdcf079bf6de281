package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.operators.{Dedup, Similarity}
import graft.sink.IndexLayout

/** StreamingHierarchyIndex: the maintained hierarchical-SemDeDup
  * layout freezes its tree at bootstrap, per-epoch pair output equals
  * a direct pre-batch probe under the SAME frozen seeds, the end-state
  * assignment equals assigning every batch through those seeds,
  * compaction folds the epoch tail without changing answers, a
  * fresh-checkpoint replay is a no-op, and a resized restart fails
  * loudly.
  */
class StreamingHierarchyIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, embedding ARRAY<FLOAT>")

  private def clusterA(i: Long) =
    Seq(1.0f + i * 0.001f, 0.5f, 0.25f)
  private def clusterB(i: Long) =
    Seq(-1.0f, 0.2f + i * 0.01f, 0.9f)

  private def pairSet(df: DataFrame) =
    df.select(col("new_id"), col("corpus_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Direct probe under the MAINTAINED layout's frozen seeds: assign
    * corpus and batch through the persisted centroid/sub-seed frames
    * and verify exactly — what each epoch's pairs must equal.
    */
  private def direct(idxDir: String, corpusAll: DataFrame,
                     b: DataFrame): Set[(Long, Long)] = {
    val cents = spark.read.parquet(s"$idxDir/centroids")
    val seeds = spark.read.parquet(s"$idxDir/subseeds")
    val asgC = Similarity.assignToSeeds(corpusAll, cents, seeds,
      "vec_id", "embedding")
    val asgB = Similarity.assignToSeeds(b, cents, seeds,
      "vec_id", "embedding")
    pairSet(Dedup.semanticNearDupsAgainst(asgB, asgC, "vec_id",
      "embedding", "cluster", threshold = 0.95))
  }

  private def assignedSet(df: DataFrame) =
    df.select(col("vec_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("hierarchy maintainer: frozen tree, per-epoch pairs, " +
      "compaction, replay no-op, resize fails") {
    val dir = Files.createTempDirectory("hier-stream").toString
    val (srcDir, idxDir, pairsDir, ckpt) =
      (s"$dir/in", s"$dir/idx", s"$dir/pairs", s"$dir/ckpt")
    new java.io.File(srcDir).mkdirs()

    val b1 = ((1L to 20L).map(i => (i, clusterA(i))) ++
      (21L to 30L).map(i => (i, clusterB(i))))
      .toDF("vec_id", "embedding")
    val b2 = Seq((100L, clusterA(7L)), (101L, Seq(0.0f, -1.0f, 0.4f)))
      .toDF("vec_id", "embedding")
    val b3 = Seq((200L, clusterA(3L)), (201L, clusterB(5L)))
      .toDF("vec_id", "embedding")
    val probeBatch = Seq((900L, Seq(1.0f, 0.5f, 0.25f)))
      .toDF("vec_id", "embedding")

    def run(target: Int = 8): Unit = {
      val q = StreamingHierarchyIndex.start(spark, s"$srcDir/*",
        schema, idxDir, pairsDir, ckpt, "vec_id", "embedding",
        targetClusterSize = target, shards = 8, compactEvery = 2,
        threshold = 0.95)
      q.processAllAvailable(); q.stop()
    }

    // epoch 0: bootstrap — the first batch sizes the tree (30 rows /
    // target 8 -> k1 = k2 = 2) and both seed levels freeze
    b1.coalesce(1).write.parquet(s"$srcDir/f1")
    run()
    assert(StreamingHierarchyIndex.lastApplied(spark, idxDir)
      .contains(0L))
    val root0 = Dedup.readIndexMeta(spark, idxDir)
    assert(Dedup.metaInt(root0, "k1") == 2 &&
      Dedup.metaInt(root0, "k2") == 2,
      "bootstrap must size the tree from the first batch")
    val seeds0 = spark.read.parquet(s"$idxDir/subseeds").collect()

    // epoch 1: pairs equal the direct pre-batch probe under the
    // frozen seeds; the assignment epoch partition rides as an append
    b2.coalesce(1).write.parquet(s"$srcDir/f2")
    run()
    val expect1 = direct(idxDir, b1, b2)
    assert(expect1.nonEmpty, "fixture sanity: the copied vector hits")
    assert(pairSet(spark.read.parquet(s"$pairsDir/epoch=1")) == expect1)
    val fs = IndexLayout.fs(spark, idxDir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$idxDir/assigned_epochs/epoch=1")),
      "assignment epoch partition expected")

    // external probe mid-tail: equals the direct probe over base+tail
    val all12 = b1.unionByName(b2)
    assert(pairSet(StreamingHierarchyIndex.probe(probeBatch, idxDir,
      "vec_id", "embedding", threshold = 0.95)) ==
      direct(idxDir, all12, probeBatch),
      "maintained probe must equal the direct probe")

    // epoch 2: tail reaches compactEvery — fold, re-point, same
    // answers; seeds must be untouched (frozen)
    b3.coalesce(1).write.parquet(s"$srcDir/f3")
    run()
    val root2 = Dedup.readIndexMeta(spark, idxDir)
    assert(IndexLayout.baseDir(root2,
      IndexLayout.HierarchyAssigned) == "assigned_v2")
    assert(IndexLayout.compactedThrough(root2,
      IndexLayout.HierarchyAssigned) == 2L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$idxDir/assigned_epochs/epoch=1")), "folded epochs cleared")
    assert(spark.read.parquet(s"$idxDir/subseeds").collect()
      .toSet == seeds0.toSet, "sub-seeds must stay frozen")
    val all = all12.unionByName(b3)
    assert(pairSet(spark.read.parquet(s"$pairsDir/epoch=2")) ==
      direct(idxDir, all12, b3))

    // end-state assignment == assigning every batch through the
    // frozen seeds
    val cents = spark.read.parquet(s"$idxDir/centroids")
    val seeds = spark.read.parquet(s"$idxDir/subseeds")
    val endState = IndexLayout.readPostings(spark, idxDir, root2,
      points = None, maxEpochExclusive = None,
      IndexLayout.HierarchyAssigned)
    assert(assignedSet(endState) == assignedSet(
      Similarity.assignToSeeds(all, cents, seeds, "vec_id",
        "embedding")),
      "maintained assignment must equal the frozen-seed rebuild")

    // fresh-checkpoint replay of the same files: every epoch is
    // already applied — the layout and pairs must not change
    val metaBefore = {
      val p = new org.apache.hadoop.fs.Path(idxDir,
        IndexLayout.MetaFile)
      val in = fs.open(p)
      val s = scala.io.Source.fromInputStream(in).mkString
      in.close(); s
    }
    val q2 = StreamingHierarchyIndex.start(spark, s"$srcDir/*",
      schema, idxDir, pairsDir, s"$dir/ckpt2", "vec_id", "embedding",
      targetClusterSize = 8, shards = 8, compactEvery = 2,
      threshold = 0.95)
    q2.processAllAvailable(); q2.stop()
    val metaAfter = {
      val p = new org.apache.hadoop.fs.Path(idxDir,
        IndexLayout.MetaFile)
      val in = fs.open(p)
      val s = scala.io.Source.fromInputStream(in).mkString
      in.close(); s
    }
    assert(metaAfter == metaBefore,
      "replayed epochs must be a layout no-op")
    assert(pairSet(spark.read.parquet(s"$pairsDir/epoch=2")) ==
      direct(idxDir, all12, b3), "replay must not rewrite pairs")

    // a resized restart must fail loudly, not silently re-tree
    Seq((300L, clusterA(9L))).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$srcDir/f4")
    val q3 = StreamingHierarchyIndex.start(spark, s"$srcDir/*",
      schema, idxDir, pairsDir, ckpt, "vec_id", "embedding",
      targetClusterSize = 16, shards = 8, compactEvery = 2,
      threshold = 0.95)
    val err = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q3.processAllAvailable() }
    q3.stop()
    assert(err.getMessage.contains("cannot") ||
      Option(err.getCause).exists(_.getMessage != null &&
        err.getCause.getMessage.contains("cannot")),
      s"resize must name the frozen-tree contract: ${err.getMessage}")
  }
}
