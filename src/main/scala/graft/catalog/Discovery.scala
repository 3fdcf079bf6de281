package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source discovery — the engine's `pipelinewise discover_tap`.
  *
  * The reference discovers schemas from source catalogs and stores them as
  * Singer catalogs with selection metadata breadcrumbs (`selected`,
  * `replication-method`, `replication-key`, `row-count`, `is-view`:
  * tap-postgres discovery_utils.py:52-174, tap-mysql
  * discover_utils.py:123-238; S3 CSV infers by sampling
  * tap-s3-csv/s3.py:73-127). Spark-native: schema inference IS the
  * discovery; this catalog captures the result per stream plus the
  * stats the planner uses (row counts for the resync size guard).
  */
final case class DiscoveredStream(
    name: String,
    schema: StructType,
    rowCount: Long,
    primaryKeyCandidates: Seq[String],
    metadata: Map[String, String] = Map.empty)

object Discovery {

  /** Discover a parquet-backed stream: schema from the footer, row count
    * from metadata, PK candidates = columns that are unique & non-null
    * (checked only when `checkKeys`, it costs a scan).
    */
  def parquetStream(spark: SparkSession, name: String, path: String,
                    checkKeys: Boolean = false): DiscoveredStream = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val pks =
      if (!checkKeys) Seq.empty
      else df.schema.fields.filter(f => !f.dataType.isInstanceOf[ArrayType])
        .map(_.name).filter { c =>
          df.agg(
            count(col(c)).as("nn"),
            approx_count_distinct(col(c), 0.01).as("nd")).head() match {
            case r =>
              // unique & non-null (approx distinct within 2% of n)
              r.getLong(0) == n && math.abs(r.getLong(1) - n) <= n / 50 + 1
          }
        }.toSeq
    DiscoveredStream(name, df.schema, n, pks,
      Map("source-format" -> "parquet", "path" -> path))
  }

  /** Infer a CSV stream's schema by sampling, like the S3 tap. */
  def csvStream(spark: SparkSession, name: String, glob: String,
                sampleRows: Int = 1000): DiscoveredStream = {
    val df = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .option("samplingRatio", "1.0")
      .csv(glob).limit(sampleRows)
    DiscoveredStream(name, df.schema, -1L, Seq.empty,
      Map("source-format" -> "csv", "path" -> glob))
  }

  /** Discover a JDBC-backed stream from the live source catalog — the
    * tap-postgres/tap-mysql discovery path (discovery_utils.py:52-131:
    * pg_catalog column/constraint queries). Spark-native: the column
    * set+types come from the Spark JDBC reader's schema resolution (one
    * prepared metadata query, no rows fetched), the primary key from the
    * driver's `DatabaseMetaData.getPrimaryKeys`, the row count from a
    * pushed-down `count(*)`.
    */
  def jdbcStream(spark: SparkSession, name: String, url: String,
                 table: String, props: Map[String, String] = Map.empty)
      : DiscoveredStream = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val schema = spark.read.jdbc(url, table, p).schema
    // "driver" is a Spark JDBC option, not a connection property — some
    // drivers (DuckDB) reject unknown properties outright
    val cp = new java.util.Properties()
    props.filterNot(_._1 == "driver")
      .foreach { case (k, v) => cp.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, cp)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT count(*) FROM $table")
      val n = if (rs.next()) rs.getLong(1) else -1L
      // best-effort: not every driver implements getPrimaryKeys
      val pks = try {
        val pkRs = conn.getMetaData.getPrimaryKeys(null, null, table)
        val b = Seq.newBuilder[String]
        while (pkRs.next()) b += pkRs.getString("COLUMN_NAME")
        b.result()
      } catch { case _: java.sql.SQLException => Seq.empty[String] }
      DiscoveredStream(name, schema, n, pks,
        Map("source-format" -> "jdbc", "url" -> url, "table" -> table))
    } finally conn.close()
  }

  /** Run-over-run catalog merge: `is-new` / `is-modified` flags
    * (pipelinewise.py:493-692 merge_schemas).
    */
  def mergeCatalogs(previous: Map[String, DiscoveredStream],
                    discovered: Seq[DiscoveredStream])
      : Seq[(DiscoveredStream, String)] =
    discovered.map { s =>
      previous.get(s.name) match {
        case None => (s, "is-new")
        case Some(p) if p.schema != s.schema => (s, "is-modified")
        case _ => (s, "unchanged")
      }
    }

  /** Table-size guard for auto-resync (`allowed_resync_max_size`,
    * pipelinewise.py:1115-1117): estimated from file sizes.
    */
  def tableSizeMb(spark: SparkSession, path: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength / (1024 * 1024)
  }
}
