package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Attribution probe for the published-hierarchy serving row
  * (`dedup_semantic_against_index`): time the inline build, the
  * bucketed publish (r19 layout), the legacy per-cluster hive publish,
  * and the served probe against each layout, separately — so a change
  * in the composed row's bench number can be pinned to the stage that
  * moved, and the bucketed layout's directory/file bound is a printed
  * fact instead of an argument.
  *
  * Usage: runMain graft.tools.ProfileHierPublish <sfDir> [buckets]
  */
object ProfileHierPublish {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val out = f
    (out, (System.nanoTime() - t0) / 1e9)
  }

  private def countTree(dir: String): (Int, Int) = {
    def walk(f: java.io.File): (Int, Int) =
      if (f.isDirectory)
        f.listFiles().map(walk).foldLeft((1, 0)) { case ((d1, f1),
          (d2, f2)) => (d1 + d2, f1 + f2) }
      else (0, if (f.getName.endsWith(".parquet")) 1 else 0)
    walk(new java.io.File(dir))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val buckets = if (args.length > 1) args(1).toInt else 4096
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-hier-publish")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corp = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    println(s"[hier-publish] corpus=${corp.count()} batch=${batch.count()}")

    val (idx, tBuild) = timed {
      val i = Similarity.buildHierarchyIndexAuto(corp, "vec_id",
        "embedding", targetClusterSize = 50)
      i.assigned.count() // materialize the localCheckpointed artifacts
      i
    }
    println(f"[hier-publish] build_sec=$tBuild%.2f k1=${idx.k1} " +
      f"clusters=${idx.assigned.select(col("cluster")).distinct().count()}")

    val work = java.nio.file.Files
      .createTempDirectory("hier-publish-prof").toString
    val (_, tPubB) = timed(Similarity.writeHierarchyIndex(idx,
      s"$work/bucketed", "vec_id", "embedding",
      assignedBuckets = buckets))
    val (dirsB, filesB) = countTree(s"$work/bucketed/assigned")
    println(f"[hier-publish] publish_bucketed_sec=$tPubB%.2f " +
      s"dirs=$dirsB files=$filesB (buckets=$buckets)")

    val (_, tPubL) = timed(Similarity.writeHierarchyIndex(idx,
      s"$work/legacy", "vec_id", "embedding", assignedBuckets = 0))
    val (dirsL, filesL) = countTree(s"$work/legacy/assigned")
    println(f"[hier-publish] publish_legacy_sec=$tPubL%.2f " +
      s"dirs=$dirsL files=$filesL")

    def probe(path: String): (Long, Double) = timed(
      Similarity.semanticNearDupsAgainstIndex(batch, path, "vec_id",
        "embedding", 0.92).count()) match { case (n, t) => (n, t) }
    // 3 passes each, report median
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val pb = (1 to 3).map(_ => probe(s"$work/bucketed"))
    val pl = (1 to 3).map(_ => probe(s"$work/legacy"))
    println(f"[hier-publish] probe_bucketed_sec=${med(pb.map(_._2))}%.2f " +
      s"pairs=${pb.head._1}")
    println(f"[hier-publish] probe_legacy_sec=${med(pl.map(_._2))}%.2f " +
      s"pairs=${pl.head._1}")
    require(pb.map(_._1).distinct == pl.map(_._1).distinct.toIndexedSeq
        || pb.head._1 == pl.head._1,
      "bucketed and legacy layouts must serve identical pair counts")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(work))
    spark.stop()
  }
}
