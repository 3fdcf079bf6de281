package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Delivery manifest for a published parquet dataset — the
  * reproducibility receipt a training-data handoff needs: per-file row
  * counts and sizes plus an ORDER-INSENSITIVE content fingerprint, so a
  * consumer (or a later re-run) can prove it received exactly the rows
  * the producer wrote, independent of file layout.
  *
  * Fingerprint: `xxhash64(to_json(struct(*)))` per row, summed with
  * wrapping 64-bit addition. Summation commutes, so ANY partitioning,
  * compaction, or shuffle of the same rows fingerprints identically —
  * while a lost file, duplicated row, or flipped value moves the sum.
  * JSON serialization pins the row representation (column order = schema
  * order, explicit nulls), so the fingerprint is stable across Spark's
  * internal encodings. This is content verification, not cryptography —
  * xxhash64 guards against corruption and operator error, not an
  * adversary (swap in a keyed hash at the same seam if provenance
  * against tampering is ever required).
  *
  * Scale shape: one scan, map-side partial sums, a |files|-row
  * aggregate; the manifest itself is a bounded `_manifest.json` (the
  * leading underscore keeps parquet readers from treating it as data,
  * same convention as `_applied_batch` / `_SUCCESS`).
  */
object Manifest {

  val FileName = "_manifest.json"

  final case class FileEntry(name: String, rows: Long, bytes: Long)
  final case class DatasetManifest(rows: Long, files: Seq[FileEntry],
                                   fingerprint: Long)

  /** Compute the manifest of a parquet dataset directory. */
  def compute(spark: SparkSession, path: String): DatasetManifest = {
    val df = spark.read.parquet(path)
    // hashes sum as DECIMAL(38,0) — exact and order-insensitive; a raw
    // long sum would overflow-throw under Spark's ANSI default. The
    // wrap to 64 bits happens once, driver-side, below.
    val perFile = df
      .select(input_file_name().as("f"),
        xxhash64(to_json(struct(df.columns.map(col): _*)))
          .cast("decimal(38,0)").as("h"))
      .groupBy(col("f"))
      .agg(count(lit(1)).as("rows"), sum(col("h")).as("hsum"))
      .collect()
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val sizes = fs.listStatus(new Path(path))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(s => s.getPath.getName -> s.getLen).toMap
    val entries = perFile.map { r =>
      val name = new Path(r.getString(0)).getName
      FileEntry(name, r.getLong(1), sizes.getOrElse(name, -1L))
    }.sortBy(_.name).toSeq
    // wrapping sum of per-file sums == wrapping sum of all row hashes
    val total = perFile.foldLeft(BigInt(0))((acc, r) =>
      acc + BigInt(r.getDecimal(2).toBigInteger))
    val fp = total.mod(BigInt(1) << 64).toLong
    DatasetManifest(entries.map(_.rows).sum, entries, fp)
  }

  /** Compute and write `_manifest.json` into the dataset directory. */
  def write(spark: SparkSession, path: String): DatasetManifest = {
    val m = compute(spark, path)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val json = render(m)
    val out = fs.create(new Path(path, FileName), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    m
  }

  /** Re-read the stored manifest and recompute: Right(manifest) when the
    * dataset still matches, Left(reason) naming the first divergence
    * (missing manifest, row-count drift, fingerprint mismatch, or a
    * file-level row/byte change).
    */
  def verify(spark: SparkSession, path: String)
      : Either[String, DatasetManifest] = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(path, FileName)
    if (!fs.exists(p)) return Left(s"no $FileName in $path")
    val in = fs.open(p)
    val stored =
      try parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    val actual = compute(spark, path)
    if (actual.fingerprint != stored.fingerprint)
      Left(s"fingerprint mismatch: stored ${stored.fingerprint}, " +
        s"actual ${actual.fingerprint}")
    else if (actual.rows != stored.rows)
      Left(s"row count mismatch: stored ${stored.rows}, " +
        s"actual ${actual.rows}")
    else Right(actual)
  }

  private def render(m: DatasetManifest): String = {
    val files = m.files.map(f =>
      s"""{"name":"${f.name}","rows":${f.rows},"bytes":${f.bytes}}""")
      .mkString(",")
    s"""{"rows":${m.rows},"fingerprint":${m.fingerprint},""" +
      s""""files":[$files]}"""
  }

  /** Minimal parser for the exact shape [[render]] writes (no JSON lib
    * in the dependency budget; the file is machine-written, so a strict
    * regex parse that fails loudly on anything else is the right
    * contract).
    */
  private[sink] def parse(json: String): DatasetManifest = {
    val top = """\{"rows":(-?\d+),"fingerprint":(-?\d+),"files":\[(.*)\]\}"""
      .r
    json.trim match {
      case top(rows, fp, files) =>
        val entry =
          """\{"name":"([^"]*)","rows":(-?\d+),"bytes":(-?\d+)\}""".r
        val es = entry.findAllMatchIn(files).map(m =>
          FileEntry(m.group(1), m.group(2).toLong, m.group(3).toLong))
          .toSeq
        DatasetManifest(rows.toLong, es, fp.toLong)
      case _ =>
        throw new IllegalArgumentException(
          s"unparseable $FileName: ${json.take(120)}")
    }
  }
}
