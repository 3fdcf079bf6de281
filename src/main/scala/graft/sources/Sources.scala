package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch sources — the engine's tap surface.
  *
  * Each reference tap family maps to a declarative Spark read whose
  * pruning/pushdown Catalyst handles (SURVEY.md §2.1, §4):
  *  - full-table scan      -> spark.read (+ .select for column selection)
  *  - incremental scan     -> pushed predicate `repl_key >= bookmark`
  *  - file/S3 CSV tap      -> spark.read.csv + `_sdc_source_*` metadata
  *  - JDBC snapshot        -> partitioned JDBC read (FastSync analogue)
  *  - Kafka record shape   -> selectExpr over the kafka source schema
  */
object Sources {

  /** Full-table scan with column selection (column pruning reaches the
    * parquet/JDBC scan via Catalyst; tap-postgres full_table.py:75-168).
    */
  def fullTable(spark: SparkSession, path: String,
                columns: Option[Seq[String]] = None): DataFrame = {
    val df = spark.read.parquet(path)
    columns.map(cs => df.select(cs.map(col): _*)).getOrElse(df)
  }

  /** Incremental scan: `WHERE repl_key >= bookmark` — the filter is pushed
    * down to the scan (tap-postgres incremental.py:124-145). `bookmark`
    * None means initial sync (full scan).
    */
  def incremental(spark: SparkSession, path: String, replicationKey: String,
                  bookmark: Option[Any]): DataFrame = {
    val df = spark.read.parquet(path)
    bookmark match {
      case Some(b) => df.filter(col(replicationKey) >= lit(b))
      case None    => df
    }
  }

  /** Max replication-key value of a batch — the next bookmark
    * (fastsync/commons/tap_mysql.py:280-309).
    */
  def nextBookmark(df: DataFrame, replicationKey: String): Option[Any] = {
    val row = df.agg(max(col(replicationKey))).head()
    if (row.isNullAt(0)) None else Some(row.get(0))
  }

  /** File (S3/local) CSV source with per-row provenance columns
    * (tap-s3-csv/tap_s3_csv/sync.py:17-99): `_sdc_source_bucket`,
    * `_sdc_source_file`, `_sdc_source_lineno`. Incremental "files newer
    * than bookmark" uses Spark's `modifiedAfter` scan option — the same
    * new-files-only semantics as the reference's `modified_since`.
    */
  def csvFiles(spark: SparkSession, glob: String, schema: Option[StructType],
               modifiedAfter: Option[String] = None,
               bucket: String = "local"): DataFrame = {
    var r = spark.read.option("header", "true")
    schema.foreach(s => r = r.schema(s))
    modifiedAfter.foreach(m => r = r.option("modifiedAfter", m))
    r.csv(glob)
      .withColumn("_sdc_source_bucket", lit(bucket))
      .withColumn("_sdc_source_file",
        regexp_extract(input_file_name(), "([^/]+)$", 1))
  }

  /** Kafka-tap record shape (tap-kafka/tap_kafka/sync.py:177-200):
    * `{message, message_partition, message_offset, message_timestamp}` plus
    * PK extraction from the JSON payload. Works over any DataFrame with
    * kafka source columns (value/partition/offset/timestamp) — batch or
    * readStream.
    */
  def kafkaRecordShape(kafka: DataFrame, pkJsonPaths: Map[String, String])
      : DataFrame = {
    val base = kafka.select(
      col("value").cast("string").as("message"),
      col("partition").as("message_partition"),
      col("offset").as("message_offset"),
      col("timestamp").as("message_timestamp"))
    pkJsonPaths.foldLeft(base) { case (df, (name, path)) =>
      df.withColumn(name, get_json_object(col("message"), path))
    }
  }

  /** Incremental scan over JDBC: the bookmark predicate pushes into the
    * database as a WHERE clause (tap-postgres incremental.py:124-145 —
    * its `pg_speedup_trick` subquery exists because psycopg2 streams the
    * whole cursor; Spark's JDBC relation compiles the Catalyst filter to
    * SQL, so the database does the skipping).
    */
  def jdbcIncremental(spark: SparkSession, url: String, table: String,
                      replicationKey: String, bookmark: Option[Any],
                      props: Map[String, String] = Map.empty): DataFrame = {
    GraftDialects.registered
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val df = spark.read.jdbc(url, table, p)
    bookmark match {
      case Some(b) => df.filter(col(replicationKey) >= lit(b))
      case None    => df
    }
  }

  /** Kafka protobuf record shape (tap-kafka serialization/protobuf.py):
    * the binary `value` decodes via the engine-native wire-format
    * decoder into typed columns, plus the standard kafka provenance
    * columns. `from_protobuf` (spark-protobuf) replaces
    * [[graft.functions.ProtoLite]] when its jar + compiled descriptors
    * are available.
    */
  def kafkaProtobufShape(kafka: DataFrame,
                         fields: Seq[graft.functions.ProtoField])
      : DataFrame =
    kafka.select(
      graft.functions.ProtoLite.decode(col("value"), fields).as("m"),
      col("partition").as("message_partition"),
      col("offset").as("message_offset"),
      col("timestamp").as("message_timestamp"))
      .select((fields.map(f => col(s"m.${f.name}").as(f.name)) ++ Seq(
        col("message_partition"), col("message_offset"),
        col("message_timestamp"))): _*)

  /** Partitioned JDBC snapshot — the FastSync bulk-export analogue
    * (fastsync/commons/tap_mysql.py:327-501): Spark's partitioned JDBC read
    * replaces the reference's manual PK-range chunking + process pool. Not
    * exercised in local tests (no database in the container) but is the
    * production path for DB taps.
    */
  def jdbcSnapshot(spark: SparkSession, url: String, table: String,
                   partitionColumn: String, lowerBound: Long, upperBound: Long,
                   numPartitions: Int, fetchSize: Int = 50000,
                   props: Map[String, String] = Map.empty): DataFrame = {
    GraftDialects.registered
    var r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("fetchsize", fetchSize)
    props.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }
}
