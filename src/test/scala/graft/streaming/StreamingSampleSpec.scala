package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpecBase
import graft.operators.Sampling

/** StreamingSample: the sampling family's streaming twins —
  * batch/stream parity for stateless stratified sampling (including
  * across a checkpointed restart), and maintained-totals epoch planning
  * with the replay-skip marker discipline.
  */
// driver-excluded slow suite (r21): run with SPARK_GRAFT_SLOW_TESTS=1
@graft.tags.Slow
class StreamingSampleSpec extends SparkSpecBase {
  import spark.implicits._

  private val docSchema = "doc_id BIGINT, source STRING, text STRING"

  private def mkDocs(ids: Range) = ids.map { i =>
    val src = if (i % 3 == 0) "web" else if (i % 3 == 1) "books" else "code"
    (i.toLong, src, s"word$i text body number $i of source $src")
  }.toDF("doc_id", "source", "text")

  test("streaming stratified sample = batch operator, across a restart") {
    val dir = Files.createTempDirectory("ssample").toString
    val srcDir = s"$dir/in"; val outDir = s"$dir/out"; val ckpt = s"$dir/ckpt"
    new java.io.File(srcDir).mkdirs()
    val fractions = Map("web" -> 0.6, "books" -> 0.3)

    def runAvailable(): Unit = {
      val stream = spark.readStream
        .schema(StructType.fromDDL(docSchema)).parquet(s"$srcDir/*")
      val q = StreamingSample.stratified(stream, "doc_id", "source",
          fractions, defaultFraction = 0.1)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
    }

    mkDocs(0 until 300).coalesce(1).write.parquet(s"$srcDir/f1")
    runAvailable()
    // restart with more data arrived: the second run must keep exactly
    // the batch-determined rows of the new file — no loss, no dups
    mkDocs(300 until 600).coalesce(1).write.parquet(s"$srcDir/f2")
    runAvailable()

    val streamed = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().sorted
    val batch = Sampling.stratifiedSampleByHash(
        mkDocs(0 until 600), "doc_id", "source", fractions,
        defaultFraction = 0.1)
      .select("doc_id").as[Long].collect().sorted
    assert(streamed.length == batch.length,
      s"streamed ${streamed.length} rows vs batch ${batch.length}")
    assert(streamed.sameElements(batch))
    // sanity: the sample is non-trivial in both directions
    assert(batch.nonEmpty && batch.length < 600)
  }

  test("maintained totals -> epochPlanFromTotals = batch epochPlan") {
    val dir = Files.createTempDirectory("ssample-ep").toString
    val srcDir = s"$dir/in"; val table = s"$dir/totals"; val ckpt = s"$dir/ckpt"
    new java.io.File(srcDir).mkdirs()
    val weights = Map("web" -> 0.5, "books" -> 0.3, "code" -> 0.2)
    val budget = 100000L

    mkDocs(0 until 200).coalesce(1).write.parquet(s"$srcDir/f1")
    val q1 = StreamingSample.startTotals(spark, s"$srcDir/*",
      StructType.fromDDL(docSchema), table, ckpt, "source", "text")
    q1.processAllAvailable(); q1.stop()
    mkDocs(200 until 500).coalesce(1).write.parquet(s"$srcDir/f2")
    val q2 = StreamingSample.startTotals(spark, s"$srcDir/*",
      StructType.fromDDL(docSchema), table, ckpt, "source", "text")
    q2.processAllAvailable(); q2.stop()

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "n_docs", "n_tokens", "weight", "target_tokens",
          "epochs", "last_pass_frac")
        .collect().map(_.toSeq).sortBy(_.head.toString)
    val maintained = Sampling.epochPlanFromTotals(
      spark.read.parquet(table), budget, weights)
    val batch = Sampling.epochPlan(mkDocs(0 until 500), "source", "text",
      budget, weights)
    assert(canon(maintained).sameElements(canon(batch)))

    // the same maintained frame feeds the mixture plan (shared seam)
    val mixMaint = Sampling.mixturePlanFromTotals(
        spark.read.parquet(table), weights)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val mixBatch = Sampling.mixturePlan(mkDocs(0 until 500), "source",
        "text", weights)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(mixMaint.sameElements(mixBatch))

    // replayed epoch must not double-count (marker wins)
    val replay = mkDocs(490 until 500)
    StreamingSample.applyBatch(replay, batchId = 1L, table, "source", "text")
    assert(canon(Sampling.epochPlanFromTotals(
      spark.read.parquet(table), budget, weights))
      .sameElements(canon(batch)), "replayed epoch double-applied")
    // a genuinely new epoch does apply
    StreamingSample.applyBatch(replay, batchId = 2L, table, "source", "text")
    val after = spark.read.parquet(table)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(after == 510L, s"expected 510 docs counted, got $after")
  }
}
