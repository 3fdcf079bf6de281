package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.catalog.Discovery
import graft.sink.Sinks

/** End-to-end JDBC tap/target path against an embedded DuckDB database
  * (test-only driver from the local cache): live-catalog discovery →
  * partitioned snapshot read → transform → JDBC write-back → re-read.
  * This is the FastSync bulk path (fastsync/commons/tap_mysql.py:327-501)
  * and target-postgres write path (target_postgres/db_sync.py) with a
  * real database on the other side of the socket.
  */
class JdbcRoundTripSpec extends SparkSpecBase {

  private lazy val dbPath =
    java.nio.file.Files.createTempDirectory("graft-jdbc").toString + "/t.db"
  private lazy val url = s"jdbc:duckdb:$dbPath"
  private val driverProps = Map("driver" -> "org.duckdb.DuckDBDriver")

  // Pinned for the suite's lifetime and NEVER closed: duckdb_jdbc shuts
  // the embedded instance down (checkpointing the file) whenever the
  // last connection closes, and a Spark JDBC task reopening the file
  // mid-checkpoint intermittently sees a half-written database
  // ("Serialization Error: field id mismatch"). One live connection
  // keeps the instance resident across every test's open/close churn.
  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE src (
      id BIGINT PRIMARY KEY, name VARCHAR, amount DOUBLE)""")
    st.execute("""INSERT INTO src
      SELECT i, 'name-' || i, i * 1.5 FROM range(0, 1000) t(i)""")
  }

  test("discovery reads schema, row count and PK from the live catalog") {
    seeded
    val ds = Discovery.jdbcStream(spark, "src", url, "src", driverProps)
    assert(ds.schema.fieldNames.toSeq == Seq("id", "name", "amount"))
    assert(ds.rowCount == 1000L)
    assert(ds.primaryKeyCandidates == Seq("id"))
  }

  test("partitioned snapshot -> transform -> jdbc write-back round trips") {
    seeded
    val snap = Sources.jdbcSnapshot(spark, url, "src",
      partitionColumn = "id", lowerBound = 0L, upperBound = 1000L,
      numPartitions = 4, props = driverProps)
    assert(snap.rdd.getNumPartitions == 4)

    // FastSync-style safe-cast projection + a masking transform
    val shaped = snap.select(col("id"), upper(col("name")).as("name"),
      col("amount").cast("double").as("amount"))
    Sinks.jdbcWrite(shaped, url, "dst", SaveMode.Overwrite,
      driverProps ++ Map("numPartitions" -> "1"))

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "dst")
      .option("driver", "org.duckdb.DuckDBDriver").load()
    assert(back.count() == 1000L)
    val r = back.filter(col("id") === 7L).head()
    assert(r.getString(r.fieldIndex("name")) == "NAME-7")
    assert(r.getDouble(r.fieldIndex("amount")) == 10.5)
  }

  test("incremental JDBC scan pushes the bookmark predicate to the DB") {
    seeded
    val inc = Sources.jdbcIncremental(spark, url, "src", "id",
      Some(900L), driverProps)
    assert(inc.count() == 100)
    // the filter must reach the JDBC relation as a pushed predicate, not
    // run Spark-side over a full-table fetch
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThanOrEqual(ID,900)") ||
      plan.replaceAll("\\s", "").contains("GreaterThanOrEqual(id,900)"),
      s"bookmark filter not pushed:\n$plan")
  }

  test("bulk export splits into bounded files (FastSync split_gzip)") {
    seeded
    val snap = Sources.jdbcSnapshot(spark, url, "src",
      partitionColumn = "id", lowerBound = 0L, upperBound = 1000L,
      numPartitions = 4, props = driverProps)
    val dir = java.nio.file.Files.createTempDirectory("graft-split").toString
    Sinks.writeSplit(snap, dir, targetFiles = 5, maxRecordsPerFile = 100)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 5 && files.length <= 10,
      s"expected 5-10 chunk files, got ${files.length}")
    assert(spark.read.parquet(dir).count() == 1000L)
  }
}
