package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.SparkSpecBase
import graft.operators.TextAnalysis

/** StreamingClassifier: maintained (pos_n, neg_n) bucket counts must be
  * indistinguishable from a full batch retrain over every doc seen.
  */
class StreamingClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "doc_id BIGINT, text STRING, pos BOOLEAN")
  private val Dim = 64

  private def readState(path: String): Set[(Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .select("bucket", "pos_n", "neg_n", "weight")
      .as[(Long, Long, Long, Long)].collect().toSet

  private def retrain(docs: Seq[(Long, String, Boolean)])
      : Set[(Long, Long, Long, Long)] =
    TextAnalysis.nbTrainHashed(docs.toDF("doc_id", "text", "pos"),
        col("pos"), "text", Dim)
      .as[(Long, Long, Long, Long)].collect().toSet

  private val b1 = Seq((1L, "good fine great", true),
    (2L, "bad spam awful", false))
  private val b2 = Seq((3L, "fine fine good", true),
    (4L, "spam spam", false), (5L, "great good", true))
  private val b3 = Seq((6L, "awful bad spam junk", false))

  test("maintained counts equal a full retrain after every epoch") {
    val dir = Files.createTempDirectory("sclf").toString
    val srcDir = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ck"
    new java.io.File(srcDir).mkdirs()

    b1.toDF("doc_id", "text", "pos").coalesce(1).write.parquet(s"$srcDir/f1")
    val q1 = StreamingClassifier.start(spark, s"$srcDir/*", schema, state,
      ckpt, "pos", "text", Dim)
    q1.processAllAvailable(); q1.stop()
    assert(readState(state) == retrain(b1))

    // restart with two more epochs; maintained == retrain(all three)
    b2.toDF("doc_id", "text", "pos").coalesce(1).write.parquet(s"$srcDir/f2")
    b3.toDF("doc_id", "text", "pos").coalesce(1).write.parquet(s"$srcDir/f3")
    val q2 = StreamingClassifier.start(spark, s"$srcDir/*", schema, state,
      ckpt, "pos", "text", Dim)
    q2.processAllAvailable(); q2.stop()
    assert(readState(state) == retrain(b1 ++ b2 ++ b3))

    // the maintained table serves the scorer directly
    val w = TextAnalysis.nbWeightsArray(spark.read.parquet(state), Dim)
    val scored = TextAnalysis.hashedClassifierScore(
      (b1 ++ b2 ++ b3).toDF("doc_id", "text", "pos"), "doc_id", "text", w)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(Seq(1L, 3L, 5L).map(scored).min >
      Seq(2L, 4L, 6L).map(scored).max,
      "streaming-trained weights must separate the labeled slices")
  }

  test("replayed epoch skips; crash inside the swap resumes") {
    val dir = Files.createTempDirectory("sclf2").toString
    val state = s"$dir/state"
    val df = b1.toDF("doc_id", "text", "pos")
    StreamingClassifier.applyBatch(df, 0L, state, "pos", "text", Dim, 1000L)
    val after1 = readState(state)
    StreamingClassifier.applyBatch(df, 0L, state, "pos", "text", Dim, 1000L)
    assert(readState(state) == after1, "replay must not double-count")
    // crash between retire and promote: only .old remains
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(state),
      new org.apache.hadoop.fs.Path(state + ".old"))
    StreamingClassifier.applyBatch(df, 1L, state, "pos", "text", Dim, 1000L)
    assert(readState(state) == retrain(b1 ++ b1))
  }
}
