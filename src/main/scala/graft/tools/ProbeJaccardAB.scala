package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B of the guarded Jaccard probe's two statistics sources
  * against one published (maintained) layout: the r16 gcounts sidecar
  * vs the pre-r16 recount of the prefix table. Both arms run the SAME
  * path probe (`ngramJaccardAgainstPath`) over the SAME layout —
  * identical manifest pruning, id-pruned set fetches, epoch gating —
  * with ONLY the `useGramCounts` knob flipped, so the wall gap
  * isolates the statistics source and nothing else.
  *
  * Usage: runMain graft.tools.ProbeJaccardAB <indexPath> <soakDocs>
  *          <batchSize> [iters]
  * (soakDocs must match the soak run that built the index — ONE
  * synthesize(n) call per the StressCurate slicing contract)
  */
object ProbeJaccardAB {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ProbeJaccardAB <indexPath> <soakDocs> <batchSize> [iters]")
    val (idx, nDocs, batchSize) =
      (args(0), args(1).toLong, args(2).toLong)
    val iters = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = StressCurate.synthesize(spark, nDocs)
      .select(col("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") < batchSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batch.count()

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (1 to iters).foreach { i =>
      val (tSide, nSide) = timed(
        graft.operators.Dedup.ngramJaccardAgainstPath(batch, idx,
          "doc_id", "text", maxGramPostings = 1024).count())
      val (tRe, nRe) = timed(
        graft.operators.Dedup.ngramJaccardAgainstPath(batch, idx,
          "doc_id", "text", maxGramPostings = 1024,
          useGramCounts = false).count())
      println(f"[probe-ab] iter=$i sidecar=$tSide%.2fs ($nSide pairs) " +
        f"recount=$tRe%.2fs ($nRe pairs)")
      require(nSide == nRe, s"pair counts diverged: $nSide vs $nRe")
    }
    spark.stop()
  }
}
