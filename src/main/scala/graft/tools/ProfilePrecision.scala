package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only: decompose dedup_minhash_precision's cost at sf0.1 — pair
  * generation vs the exact-overlap stages — to settle the r12→r13
  * 1.3 s vs 2.0 s bench question (VERDICT r12 "what's wrong" #2).
  */
object ProfilePrecision {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      // cold + 3 timed passes, bench-style
      f
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[prec] $name%-32s med=$med%6.3fs rows=${ts.head._2}")
      spark.catalog.clearCache()
    }

    time("lsh_pairs_only")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 12, 3, 0.5).count())
    time("precision_full")(
      Dedup.minhashPrecision(docs, "doc_id", "text", 3, 12, 3, 0.5).count())
    time("shingle_hash_scan")(docs.select(col("doc_id").as("__id"),
        explode(array_distinct(Dedup.shingles(col("text"), 3))).as("__g"))
      .select(col("__id"),
        graft.functions.StableHash.hash60(col("__g")).as("__h")).count())
    spark.stop()
  }
}
