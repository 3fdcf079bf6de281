package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Non-merge sink family (SURVEY.md §2.3):
  *  - CSV sink          — target-s3-csv (records -> CSV, no merge)
  *  - JDBC sink         — target-postgres (temp table + upsert handled by
  *                        the database's transactional write; local tests
  *                        have no database, so this is config plumbing)
  *  - file splitting    — fastsync split_gzip (≤N chunks of ~M rows) as
  *                        repartition + maxRecordsPerFile
  */
object Sinks {

  /** CSV append sink with the reference's provenance-friendly layout:
    * one directory per stream, gzip compression like the reference's
    * csv.gz exports.
    */
  def csvAppend(df: DataFrame, dir: String, compress: Boolean = true): Unit = {
    var w = df.write.mode(SaveMode.Append).option("header", "true")
    if (compress) w = w.option("compression", "gzip")
    w.csv(dir)
  }

  /** Split a large frame into bounded files for parallel warehouse load
    * (split_gzip.py:15-52: ≤20 chunks). `targetFiles` bounds parallelism;
    * `maxRecordsPerFile` bounds file size.
    */
  def writeSplit(df: DataFrame, dir: String, targetFiles: Int,
                 maxRecordsPerFile: Long): Unit =
    df.repartition(targetFiles)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dir)

  /** JDBC writer (target-postgres analogue). Append/overwrite via Spark's
    * JDBC sink; PK-merge semantics belong to MergeSink before the write
    * (the reference's temp-table + INSERT/UPDATE split maps to staging
    * the merged frame and overwriting).
    */
  def jdbcWrite(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Append,
                options: Map[String, String] = Map.empty): Unit = {
    graft.sources.GraftDialects.registered
    var w = df.write.format("jdbc").mode(mode)
      .option("url", url).option("dbtable", table)
      .option("batchsize", 10000)
    options.foreach { case (k, v) => w = w.option(k, v) }
    w.save()
  }
}
