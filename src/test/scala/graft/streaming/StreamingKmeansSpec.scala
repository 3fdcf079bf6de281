package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.SparkSpecBase

/** StreamingKmeans: online centroid maintenance with exact integer
  * (sum, count) state under the marker/atomic-swap discipline.
  */
// driver-excluded slow suite (r21): run with SPARK_GRAFT_SLOW_TESTS=1
@graft.tags.Slow
class StreamingKmeansSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "vec_id BIGINT, embedding ARRAY<FLOAT>")

  // two direction blobs; ids interleave so every batch feeds both
  private def vec(i: Int): (Long, Array[Float]) = {
    val base = if (i % 2 == 0) Array(1f, 0f, 0f) else Array(0f, 1f, 0f)
    (i.toLong, base.map(x => x + 0.01f * (i % 5)))
  }

  private def readState(path: String): Map[Long, (Long, List[Long])] =
    spark.read.parquet(path)
      .select("centroid_id", "n_members", "cent_sum").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).toList)))
      .toMap

  /** Independent sequential fold: quantize like the operator, assign by
    * plain Scala argmax cosine (sim desc, cid asc), add integer sums.
    */
  private def fold(batches: Seq[Seq[(Long, Array[Float])]], k: Int)
      : Map[Long, (Long, List[Long])] = {
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    var state = Map.empty[Long, (Long, Array[Long])]
    batches.foreach { batch =>
      val dirs: Seq[(Long, Array[Double])] =
        if (state.nonEmpty)
          state.toSeq.map { case (cid, (_, s)) => (cid, s.map(_.toDouble)) }
        else batch.sortBy(_._1).take(k).zipWithIndex.map { case ((_, v), i) =>
          (i.toLong, quant(v).map(_.toDouble))
        }
      batch.foreach { case (_, v) =>
        val qv = quant(v)
        val qd = qv.map(_.toDouble)
        val best = dirs.map { case (cid, cv) => (cos(qd, cv), -cid, cid) }
          .max._3
        val (n0, s0) = state.getOrElse(best, (0L, Array.fill(qv.length)(0L)))
        state = state.updated(best,
          (n0 + 1, s0.zip(qv).map { case (a, b) => a + b }))
      }
    }
    state.map { case (cid, (n, s)) => cid -> ((n, s.toList)) }
  }

  test("maintained centroids equal the sequential fold; restart resumes") {
    val dir = Files.createTempDirectory("skmeans").toString
    val srcDir = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ck"
    new java.io.File(srcDir).mkdirs()
    val b1 = (0 until 20).map(vec)
    val b2 = (20 until 40).map(vec)
    val b3 = (40 until 70).map(vec)

    b1.toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$srcDir/f1")
    val q1 = StreamingKmeans.start(spark, s"$srcDir/*", schema, state,
      ckpt, "vec_id", "embedding", k = 2)
    q1.processAllAvailable(); q1.stop()
    assert(readState(state) == fold(Seq(b1), 2))

    // two more epochs land; a RESTARTED query picks up from the
    // checkpoint and the state keeps folding
    b2.toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$srcDir/f2")
    b3.toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$srcDir/f3")
    val q2 = StreamingKmeans.start(spark, s"$srcDir/*", schema, state,
      ckpt, "vec_id", "embedding", k = 2)
    q2.processAllAvailable(); q2.stop()
    assert(readState(state) == fold(Seq(b1, b2, b3), 2))
    // both blobs attracted members across all epochs
    assert(readState(state).values.map(_._1).sum == 70L)
  }

  test("replayed epoch is skipped; a new epoch applies") {
    val dir = Files.createTempDirectory("skmeans2").toString
    val state = s"$dir/state"
    val b1 = (0 until 10).map(vec)
    val df = b1.toDF("vec_id", "embedding")
    StreamingKmeans.applyBatch(df, 0L, state, "vec_id", "embedding", 2, 1e6)
    val after1 = readState(state)
    assert(after1 == fold(Seq(b1), 2))
    // at-least-once re-delivery of epoch 0: no double-count
    StreamingKmeans.applyBatch(df, 0L, state, "vec_id", "embedding", 2, 1e6)
    assert(readState(state) == after1, "replay must not double-apply")
    // epoch 1 with the same rows applies on top
    StreamingKmeans.applyBatch(df, 1L, state, "vec_id", "embedding", 2, 1e6)
    assert(readState(state) == fold(Seq(b1, b1), 2))
  }

  test("crash inside the swap window resumes from .old") {
    val dir = Files.createTempDirectory("skmeans3").toString
    val state = s"$dir/state"
    val b1 = (0 until 10).map(vec)
    val df = b1.toDF("vec_id", "embedding")
    StreamingKmeans.applyBatch(df, 0L, state, "vec_id", "embedding", 2, 1e6)
    // simulate dying between "retire current" and "promote staged"
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(state),
      new org.apache.hadoop.fs.Path(state + ".old"))
    StreamingKmeans.applyBatch(df, 1L, state, "vec_id", "embedding", 2, 1e6)
    assert(readState(state) == fold(Seq(b1, b1), 2))
  }
}
