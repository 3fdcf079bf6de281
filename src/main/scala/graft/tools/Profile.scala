package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only stage profiler for the heavy operators (not part of the
  * driver contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.cache().count()

    time("shingle explode")(docs.select(col("doc_id").as("id"),
      explode(array_distinct(Dedup.shingles(col("text"), 3))).as("g")).count())
    val grams = docs.select(col("doc_id").as("id"),
      explode(array_distinct(Dedup.shingles(col("text"), 3))).as("g"))
    time("dfreq")(grams.groupBy("g").agg(count(lit(1))).count())
    time("sets collect_set")(grams.groupBy(col("id"))
      .agg(collect_set(col("g")).as("gs"), count(lit(1)).as("sz")).count())
    val dfreq = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val wOrd = Window.partitionBy(col("id")).orderBy(col("df").asc, col("g").asc)
    val sets = grams.groupBy(col("id"))
      .agg(collect_set(col("g")).as("gs"), count(lit(1)).as("sz"))
    val prefix = grams.join(dfreq, "g")
      .withColumn("rn", row_number().over(wOrd))
      .join(sets.select(col("id"), col("sz")), "id")
      .filter(col("rn") <= col("sz") - ceil(lit(0.8) * col("sz")) + 1)
      .select(col("id"), col("g"), col("sz"))
    time("prefix")(prefix.count())
    val l = prefix.select(col("id").as("id_a"), col("g"), col("sz").as("sz_a"))
    val r = prefix.select(col("id").as("id_b"), col("g"), col("sz").as("sz_b"))
    val candidates = l.join(r, Seq("g"))
      .filter(col("id_a") < col("id_b") &&
        col("sz_a") >= lit(0.8) * col("sz_b") &&
        col("sz_b") >= lit(0.8) * col("sz_a"))
      .select(col("id_a"), col("id_b")).distinct()
    time("candidates")(candidates.count())
    time("full ngramJaccard")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    time("minhash sigs")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 3, 12).count())
    time("full minhashNearDups")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 12, 3, 0.5).count())
    spark.stop()
  }
}
// appended: text-analysis micro-profile
object ProfileText {
  import graft.operators.TextAnalysis
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.cache().count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[ptext] $name%-24s ${(System.nanoTime()-t0)/1e9}%7.2fs rows=$n")
    }
    time("baseline count")(docs.select(length(col("text"))).count())
    time("noop write baseline") { docs.select(length(col("text")))
      .write.format("noop").mode("overwrite").save(); 0L }
    time("wsTokenCount") { docs.select(TextAnalysis.wsTokenCount(col("text")))
      .write.format("noop").mode("overwrite").save(); 0L }
    time("charClassCounts") { docs.select(
      graft.functions.TextCounters.charClassCounts(col("text")))
      .write.format("noop").mode("overwrite").save(); 0L }
    time("tokenSetCounts") { docs.select(graft.functions.TextCounters
      .tokenSetCounts(lower(col("text")), TextAnalysis.StopwordLists.map(_._2)))
      .write.format("noop").mode("overwrite").save(); 0L }
    time("full quality") { docs.select(
      TextAnalysis.qualityScore(col("text")))
      .write.format("noop").mode("overwrite").save(); 0L }
    time("full quality again") { docs.select(
      TextAnalysis.qualityScore(col("text")))
      .write.format("noop").mode("overwrite").save(); 0L }
    time("old regex quality") { docs.select(
      (regexp_count(col("text"), lit("[^\\w\\s]")).cast("double") /
        greatest(length(col("text")).cast("double"), lit(1.0)))
      ).write.format("noop").mode("overwrite").save(); 0L }
    spark.stop()
  }
}
