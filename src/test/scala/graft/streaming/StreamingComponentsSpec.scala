package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.types.StructType
import graft.SparkSpecBase
import graft.operators.Dedup

/** StreamingComponents: the maintained label table must equal
  * connectedComponents(all pairs so far) after every epoch.
  */
// driver-excluded slow suite (r21): run with SPARK_GRAFT_SLOW_TESTS=1
@graft.tags.Slow
class StreamingComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType.fromDDL("id_a BIGINT, id_b BIGINT")

  private def readState(path: String): Map[Long, Long] =
    spark.read.parquet(path).select("id", "component_id")
      .as[(Long, Long)].collect().toMap

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  // epoch 1 builds two components; epoch 2 bridges them and opens a new
  // one; epoch 3's lower id relabels an existing component
  private val b1 = Seq((10L, 11L), (20L, 21L), (21L, 22L))
  private val b2 = Seq((11L, 20L), (30L, 31L))
  private val b3 = Seq((1L, 22L))

  test("maintained labels equal the full CC after every epoch") {
    val dir = Files.createTempDirectory("scomp").toString
    val srcDir = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ck"
    new java.io.File(srcDir).mkdirs()

    b1.toDF("id_a", "id_b").coalesce(1).write.parquet(s"$srcDir/f1")
    val q1 = StreamingComponents.start(spark, s"$srcDir/*", schema, state,
      ckpt, "id_a", "id_b")
    q1.processAllAvailable(); q1.stop()
    assert(readState(state) == cc(b1))

    b2.toDF("id_a", "id_b").coalesce(1).write.parquet(s"$srcDir/f2")
    b3.toDF("id_a", "id_b").coalesce(1).write.parquet(s"$srcDir/f3")
    val q2 = StreamingComponents.start(spark, s"$srcDir/*", schema, state,
      ckpt, "id_a", "id_b")
    q2.processAllAvailable(); q2.stop()
    val fin = readState(state)
    assert(fin == cc(b1 ++ b2 ++ b3))
    // epoch 3's id 1 rules the merged mega-component
    assert(Seq(10L, 11L, 20L, 21L, 22L, 1L).forall(fin(_) == 1L))
    assert(fin(30L) == 30L && fin(31L) == 30L)
  }

  test("the merge is idempotent: forced double-apply changes nothing") {
    val dir = Files.createTempDirectory("scomp2").toString
    val state = s"$dir/state"
    val df = b1.toDF("id_a", "id_b")
    StreamingComponents.applyBatch(df, 0L, state, "id_a", "id_b")
    val once = readState(state)
    // bypass the marker with a NEW batchId carrying the SAME pairs —
    // semantic idempotence, not marker-skip
    StreamingComponents.applyBatch(df, 1L, state, "id_a", "id_b")
    assert(readState(state) == once,
      "re-applying known pairs must not change any label")
    // and the marker-skip path too
    StreamingComponents.applyBatch(
      Seq((99L, 100L)).toDF("id_a", "id_b"), 1L, state, "id_a", "id_b")
    assert(readState(state) == once, "replayed batchId must be skipped")
  }

  test("crash inside the swap window resumes from .old") {
    val dir = Files.createTempDirectory("scomp3").toString
    val state = s"$dir/state"
    StreamingComponents.applyBatch(b1.toDF("id_a", "id_b"), 0L, state,
      "id_a", "id_b")
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(state),
      new org.apache.hadoop.fs.Path(state + ".old"))
    StreamingComponents.applyBatch(b2.toDF("id_a", "id_b"), 1L, state,
      "id_a", "id_b")
    assert(readState(state) == cc(b1 ++ b2))
  }
}
