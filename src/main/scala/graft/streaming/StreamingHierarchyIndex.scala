package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.{Dedup, Similarity}
import graft.sink.{IndexLayout, Sinks}

/** Continuously maintained hierarchical-SemDeDup index — the streaming
  * twin of [[graft.operators.Similarity.buildHierarchyIndexAuto]] +
  * [[graft.operators.Similarity.semanticNearDupsAgainstIndex]]: each
  * arriving micro-batch is assigned through the persisted two-level
  * seeds, screened for semantic near-duplicates against the PRE-batch
  * corpus assignment (pairs out per epoch), and appended to the
  * maintained assignment table as an epoch partition; every
  * `compactEvery` epochs the tail folds into a fresh range-sorted base.
  *
  * The tree GEOMETRY is frozen at bootstrap, like the banded
  * maintainer's hyperplanes: the first batch sizes the hierarchy
  * (`k1 = k2 = ceil(sqrt(n0 / targetClusterSize))`) and selects both
  * seed levels; every later epoch assigns against those persisted
  * frames and NEVER re-derives them — the published-index rule, which
  * is also what keeps every epoch's cluster ids stable so the
  * assignment table stays join-consistent across epochs. The corollary
  * is the IVF-append contract: as the corpus outgrows its bootstrap
  * sizing, cluster population drifts upward (verification cost per
  * batch row grows with it) — monitor with
  * [[graft.operators.Similarity.centroidDriftReport]] over the level-1
  * centroids and REBUILD (fresh bootstrap from a representative
  * corpus) past the deployment's threshold, exactly like the IVF
  * layout. Restarting with a different `targetClusterSize` or column
  * names fails loudly.
  *
  * Scale shape per epoch: the batch meets the k1-row centroid frame
  * (broadcast) and the k1×k2-row sub-seed frame (cell-keyed join) —
  * both bounded index artifacts; the exact verification reads ONLY the
  * manifest shards holding the batch's distinct clusters (bounded by
  * |batch|, cap-enforced at `maxClusters` with the probe family's
  * standard full-scan fallback past the cap) plus the batch-sized
  * uncompacted epoch tail. Nothing corpus-proportional is collected,
  * broadcast, or rewritten outside compaction.
  *
  * Exactly-once: pairs and the epoch append are both idempotent
  * (overwrite / stage-and-rename), so the replay check is the standard
  * layout discipline — meta promoted before the append, a replayed
  * epoch that finds its partition present is a no-op, and a crash
  * between meta and append re-runs the epoch body.
  *
  * Reference semantics: the reference has no streaming analogue — this
  * is the SemDeDup published-index shape (Abbas et al. 2023) under the
  * repo's maintained-layout protocol, cited from
  * [[graft.operators.Dedup.semanticNearDups]].
  */
object StreamingHierarchyIndex {

  private val T = IndexLayout.HierarchyAssigned

  def start(spark: SparkSession, sourceDir: String, schema: StructType,
            indexPath: String, pairsOutDir: String, checkpoint: String,
            idCol: String, vecCol: String,
            targetClusterSize: Int = 50,
            shards: Int = 64, compactEvery: Int = 8,
            threshold: Double = 0.9, maxClusters: Int = 4096,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, indexPath, pairsOutDir, idCol,
          vecCol, targetClusterSize, shards, compactEvery, threshold,
          maxClusters)
      }
      .start()
  }

  private def paramFields(k1: Int, k2: Int, targetClusterSize: Int,
      idCol: String, vecCol: String,
      lastEpoch: Long): Seq[(String, Any)] = Seq(
    "k1" -> k1, "k2" -> k2,
    "target_cluster_size" -> targetClusterSize,
    "id_col" -> idCol, "vec_col" -> vecCol,
    "layout" -> "hierarchy_maintained", "last_epoch" -> lastEpoch)

  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
      indexPath: String, pairsOutDir: String, idCol: String,
      vecCol: String, targetClusterSize: Int, shards: Int,
      compactEvery: Int, threshold: Double, maxClusters: Int): Unit = {
    require(compactEvery >= 1, "compactEvery must be >= 1")
    require(maxClusters >= 1, "maxClusters must be >= 1")
    val spark = batch.sparkSession
    val f = IndexLayout.fs(spark, indexPath)
    IndexLayout.recoverMeta(f, indexPath)
    val metaPath = new Path(indexPath, IndexLayout.MetaFile)

    if (!f.exists(metaPath)) {
      // bootstrap: the first batch IS the corpus — it sizes the tree,
      // selects both seed levels, and becomes the assignment base
      val idx = Similarity.buildHierarchyIndexAuto(batch, idCol,
        vecCol, targetClusterSize)
      idx.centroids.write
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$indexPath/centroids")
      idx.subSeeds.write
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$indexPath/subseeds")
      val base = s"${T.name}_v$batchId"
      Sinks.writeRangeSorted(idx.assigned, s"$indexPath/$base",
        T.sortCol, shards)
      IndexLayout.promoteMeta(f, indexPath, IndexLayout.metaJson(
        paramFields(idx.k1, idx.k2, targetClusterSize, idCol, vecCol,
          batchId) ++ Seq(
          T.dirField -> base, T.throughField -> batchId)))
      return
    }

    val root = Dedup.readIndexMeta(spark, indexPath)
    val (mk1, mk2) =
      (Dedup.metaInt(root, "k1"), Dedup.metaInt(root, "k2"))
    val mtarget = Dedup.metaInt(root, "target_cluster_size")
    val (mid, mvec) =
      (Dedup.metaStr(root, "id_col"), Dedup.metaStr(root, "vec_col"))
    require(mtarget == targetClusterSize,
      s"hierarchy index at $indexPath was bootstrapped with " +
        s"targetClusterSize=$mtarget; the restarted stream passed " +
        s"targetClusterSize=$targetClusterSize - an epoch cannot " +
        "resize an existing tree (rebuild from a fresh bootstrap)")
    require(mid == idCol && mvec == vecCol,
      s"hierarchy index at $indexPath was published with columns " +
        s"($mid, $mvec), maintained with ($idCol, $vecCol)")
    val lastEpoch = IndexLayout.lastEpoch(root)
    val through = IndexLayout.compactedThrough(root, T)
    val epochDir = new Path(s"$indexPath/${T.epochsSub}/epoch=$batchId")
    if (lastEpoch >= batchId &&
        (through >= batchId || f.exists(epochDir))) return
    IndexLayout.healOrphans(spark, indexPath,
      keepDir = IndexLayout.baseDir(root, T),
      clearEpochsThrough = through, T)

    // 1) assign the batch through the FROZEN seeds and probe the
    //    PRE-batch assignment (epoch-gated, manifest-pruned)
    val (asg, pairs) = assignAndProbe(batch, indexPath, root, idCol,
      vecCol, threshold, maxClusters,
      maxEpochExclusive = Some(batchId), cache = true)
    try {
      pairs.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$pairsOutDir/epoch=$batchId")

      // 3) meta, then the epoch append (replay keys on the partition)
      IndexLayout.promoteMeta(f, indexPath, IndexLayout.metaJson(
        paramFields(mk1, mk2, targetClusterSize, idCol, vecCol,
          batchId) ++ Seq(
          T.dirField -> IndexLayout.baseDir(root, T),
          T.throughField -> through)))
      IndexLayout.appendEpoch(asg, indexPath, batchId, T)
    } finally asg.unpersist()

    // 4) fold the epoch tail once it is long enough (reads the
    //    layout, not the cached assignment)
    if (batchId - through >= compactEvery) {
      val root2 = Dedup.readIndexMeta(spark, indexPath)
      IndexLayout.compact(spark, indexPath, root2, T.sortCol, shards,
        upTo = batchId,
        metaFields = paramFields(mk1, mk2, targetClusterSize, idCol,
          vecCol, batchId), T)
    }
  }

  /** The shared assign-then-verify body: the batch is assigned
    * through the layout's FROZEN seed frames (the single-pass lazy
    * spelling), and the exact verification reads the manifest shards
    * holding the batch's distinct clusters (bounded by |batch|,
    * cap-enforced; full-scan fallback past the cap) plus the
    * uncompacted epoch tail — extra rows from shard granularity are
    * correctness-neutral because the verification joins on the
    * cluster id.
    *
    * `cache = true` persists the assignment for the caller's multiple
    * consumers (the cluster collect, the pairs join, the maintainer's
    * epoch append) — the caller MUST unpersist it when the epoch's
    * writes complete. The eager-localCheckpoint spelling was measured
    * hoarding block-manager storage across a 20-epoch soak (each
    * epoch's checkpoint lingers until the context cleaner gets to it;
    * epochs 18-19 hit eviction and ran 3-10x slow) — an explicit
    * persist/unpersist pair bounds the maintainer's storage at one
    * batch. `cache = false` (the serving probe) keeps the plan pure:
    * the assign recomputes once for the cluster collect and once
    * inside the returned pairs plan — batch-sized work, zero blocks
    * left behind per probe call.
    */
  private def assignAndProbe(batch: DataFrame, indexPath: String,
      root: org.json4s.JValue, idCol: String, vecCol: String,
      threshold: Double, maxClusters: Int,
      maxEpochExclusive: Option[Long],
      cache: Boolean): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val cents = spark.read.parquet(s"$indexPath/centroids")
    val seeds = spark.read.parquet(s"$indexPath/subseeds")
    val asg0 = Similarity.assignToSeedsLazy(batch, cents, seeds,
      idCol, vecCol)
    val asg =
      if (cache) asg0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else asg0
    // the persist above is only handed to the caller (whose
    // try/finally unpersists it) if this method RETURNS — a throw in
    // the collect or the layout read below would otherwise leak one
    // batch-sized persisted frame per failed/retried micro-batch,
    // the same storage-hoarding class the 20-epoch soak fix bounded
    try {
      val picked = asg.select(col("cluster")).distinct()
        .limit(maxClusters + 1).collect().map(_.getLong(0))
      val points =
        if (picked.length > maxClusters) None
        else Some(picked.toIndexedSeq)
      val corpus = IndexLayout.readPostings(spark, indexPath, root,
        points, maxEpochExclusive, T)
      (asg, Dedup.semanticNearDupsAgainst(asg, corpus, idCol, vecCol,
        "cluster", threshold))
    } catch { case e: Throwable =>
      if (cache) asg.unpersist()
      throw e
    }
  }

  /** Probe a MAINTAINED hierarchy layout outside the stream — the
    * [[graft.operators.Similarity.semanticNearDupsAgainstIndex]] twin
    * for this layout: the batch is assigned through the frozen seeds
    * and verified exactly against the manifest-pruned assignment
    * (base shards holding the batch's clusters + the uncompacted
    * epoch tail). Emits `(new_id, corpus_id)`.
    */
  def probe(batch: DataFrame, indexPath: String, idCol: String,
            vecCol: String, threshold: Double,
            maxClusters: Int = 4096): DataFrame = {
    val spark = batch.sparkSession
    val root = Dedup.readIndexMeta(spark, indexPath)
    val (mid, mvec) =
      (Dedup.metaStr(root, "id_col"), Dedup.metaStr(root, "vec_col"))
    require(mid == idCol && mvec == vecCol,
      s"hierarchy index at $indexPath was published with columns " +
        s"($mid, $mvec), probed with ($idCol, $vecCol)")
    assignAndProbe(batch, indexPath, root, idCol, vecCol, threshold,
      maxClusters, maxEpochExclusive = None, cache = false)._2
  }

  /** The epoch committed with the current meta, if any. */
  private[graft] def lastApplied(spark: SparkSession,
      indexPath: String): Option[Long] = {
    val f = IndexLayout.fs(spark, indexPath)
    if (!f.exists(new Path(indexPath, IndexLayout.MetaFile))) None
    else Some(IndexLayout.lastEpoch(
      Dedup.readIndexMeta(spark, indexPath)))
  }
}
