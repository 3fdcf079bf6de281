package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.StableHash._
import graft.operators.TextAnalysis

/** Dev-only: A/B the per-term corpus-count spellings behind
  * `importanceWeights` (text_dsir_weights, pipeline_weighted_mixture)
  * and `bigramRarity` (text_bigram_rarity) —
  *
  *   (W) pre-r21: `count().over(Window.partitionBy(hash))` — every
  *       instance of a term is co-located on ONE reducer with no
  *       partial aggregation. On a natural corpus a stopword ("the":
  *       several percent of all token instances) is a one-reducer
  *       funnel; this fixture's 31-word uniform vocabulary makes EVERY
  *       word a stopword, so the funnel dominates at any scale factor.
  *   (G) r21: `groupBy(hash).count` + join back — map-side combine
  *       shrinks the count table to |vocab| rows before its exchange,
  *       AQE broadcasts the join back, and no single-key reducer
  *       exists anywhere in the plan.
  *
  * Run over a ScaleUp SUFFIX-mode fixture (text replicated verbatim, so
  * per-word instance counts scale with the factor — the 100 TB stopword
  * shape; salt mode would grow the vocabulary instead and dissolve the
  * hot keys this A/B exists to measure):
  *
  *   runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf10 100
  *   runMain graft.tools.ProfileDsir /tmp/sf10
  *
  * Prints result parity (exact: union-distinct row counts), bench-style
  * timings (cold + 3 passes, canary-normalized) and the executed-plan
  * operator counts that show the Window funnel gone.
  */
object ProfileDsir {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (target, scale) = ("src0", 10000L)

    // ---- importanceWeights: pre-r21 window spelling, verbatim ----
    def dsirW(): DataFrame = {
      val inst = docs.select(col("doc_id"),
          (col("source") === target).as("__t"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("__w"))
        .select(col("doc_id"), col("__t"), hash60(col("__w")).as("__h"))
      val perH = Window.partitionBy(col("__h"))
      inst
        .withColumn("__rw", count(lit(1)).over(perH))
        .withColumn("__tw",
          sum(when(col("__t"), 1L).otherwise(0L)).over(perH))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(expr(s"(__tw * CAST($scale AS BIGINT)) div __rw"))
            .as("dsir_score"))
    }
    def dsirG(): DataFrame = TextAnalysis.importanceWeights(
      docs, "doc_id", "text", col("source") === target, scale)

    // ---- bigramRarity: pre-r21 window spelling, verbatim ----
    def bigramW(): DataFrame = {
      val inst = docs.select(col("doc_id"),
          explode(array_distinct(
            graft.functions.TextShingles.wordShingles(col("text"), 2)))
            .as("g"))
        .select(col("doc_id"), hash60(col("g")).as("h"))
      val perH = Window.partitionBy(col("h"))
      inst.withColumn("df", count(lit(1)).over(perH))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"),
          (sum(col("df")).cast("double") / count(lit(1))).as("mean_df"))
    }
    def bigramG(): DataFrame =
      TextAnalysis.bigramRarity(docs, "doc_id", "text")

    def parity(name: String, a: () => DataFrame, b: () => DataFrame): Unit = {
      val (ca, cb) = (a().count(), b().count())
      val du = a().union(b()).distinct().count()
      spark.catalog.clearCache()
      require(ca == cb && du == ca,
        s"$name variants diverge: a=$ca b=$cb distinct-union=$du")
      println(s"[dsir] $name parity: rows=$ca distinct-union=$du")
    }

    def planSummary(df: DataFrame): String = {
      df.write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val p = df.queryExecution.executedPlan.toString
      s"window=${"\\bWindow\\b".r.findAllIn(p).size} " +
        s"partial_agg=${"HashAggregate".r.findAllIn(p).size} " +
        s"exchanges=${"Exchange hashpartitioning".r.findAllIn(p).size} " +
        s"bhj=${"BroadcastHashJoin".r.findAllIn(p).size} " +
        s"smj=${"SortMergeJoin".r.findAllIn(p).size}"
    }

    def time(name: String)(f: () => DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save() // cold
      spark.catalog.clearCache()
      val ts = (1 to 3).map { _ =>
        val c = graft.BenchEnv.canary()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (w, w / c.mtSec)
      }
      val raw = ts.map(_._1).sorted.apply(1)
      val norm = ts.map(_._2).sorted.apply(1)
      println(f"[dsir] $name%-12s median=$raw%7.3fs canary_units=$norm%8.2f")
    }

    parity("dsir", dsirW _, dsirG _)
    parity("bigram", bigramW _, bigramG _)
    println(s"[dsir] plan dsir   W: ${planSummary(dsirW())}")
    println(s"[dsir] plan dsir   G: ${planSummary(dsirG())}")
    println(s"[dsir] plan bigram W: ${planSummary(bigramW())}")
    println(s"[dsir] plan bigram G: ${planSummary(bigramG())}")
    time("dsir-W(win)")(dsirW _)
    time("dsir-G(r21)")(dsirG _)
    time("bigram-W(win)")(bigramW _)
    time("bigram-G(r21)")(bigramG _)
    spark.stop()
  }
}
