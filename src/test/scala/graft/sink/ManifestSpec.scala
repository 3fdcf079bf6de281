package graft.sink

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class ManifestSpec extends SparkSpecBase {
  import spark.implicits._

  private def dataset = (1L to 500L).map(i => (i, s"payload $i", i % 7))
    .toDF("id", "txt", "grp")

  test("fingerprint is file-layout-insensitive but content-sensitive") {
    val dir = Files.createTempDirectory("manifest").toString
    dataset.repartition(8).write.mode("overwrite").parquet(s"$dir/a")
    dataset.repartition(2).sortWithinPartitions(col("grp"))
      .write.mode("overwrite").parquet(s"$dir/b")
    val ma = Manifest.compute(spark, s"$dir/a")
    val mb = Manifest.compute(spark, s"$dir/b")
    assert(ma.fingerprint == mb.fingerprint && ma.rows == mb.rows,
      "same rows in a different layout must fingerprint identically")
    assert(ma.files.size == 8 && mb.files.size == 2)

    val tampered = dataset
      .withColumn("txt", when(col("id") === 250L, lit("flipped"))
        .otherwise(col("txt")))
    tampered.repartition(8).write.mode("overwrite").parquet(s"$dir/c")
    assert(Manifest.compute(spark, s"$dir/c").fingerprint
      != ma.fingerprint, "one flipped value must move the fingerprint")
  }

  test("write + verify round trip; verify names the drift") {
    val dir = Files.createTempDirectory("manifest-v").toString
    val path = s"$dir/ds"
    dataset.repartition(4).write.mode("overwrite").parquet(path)
    val written = Manifest.write(spark, path)
    assert(Manifest.verify(spark, path) == Right(written))

    // lose one data file: verify must fail loudly, not shrug
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val victim = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.getPath.getName.endsWith(".parquet")).head.getPath
    fs.delete(victim, false)
    val v = Manifest.verify(spark, path)
    assert(v.isLeft && v.swap.toOption.get.contains("mismatch"))
  }

  test("manifest json parses back to what was rendered") {
    val dir = Files.createTempDirectory("manifest-p").toString
    val path = s"$dir/ds"
    dataset.write.mode("overwrite").parquet(path)
    val m = Manifest.write(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path, Manifest.FileName))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(Manifest.parse(json) == m)
    intercept[IllegalArgumentException] { Manifest.parse("{broken") }
  }
}
