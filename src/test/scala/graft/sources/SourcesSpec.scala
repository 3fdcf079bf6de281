package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpecBase
import graft.catalog.Discovery

class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  test("incremental pushes the bookmark predicate to the scan") {
    val df = Sources.incremental(spark, s"$sfDir/lineitem.parquet",
      "l_shipdate", Some("1999-01-01"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_shipdate"))
    assert(df.count() > 0)
  }

  test("nextBookmark returns max replication key; None on empty") {
    val df = Seq((1L, 5L), (2L, 9L)).toDF("id", "seq")
    assert(Sources.nextBookmark(df, "seq").contains(9L))
    assert(Sources.nextBookmark(df.filter(col("id") > 99), "seq").isEmpty)
  }

  test("csv source adds provenance columns and honors modifiedAfter") {
    val dir = Files.createTempDirectory("csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data1.csv"),
      "id,name\n1,alice\n2,bob\n")
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType)))
    val df = Sources.csvFiles(spark, s"$dir/*.csv", Some(schema),
      bucket = "test-bucket")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("_sdc_source_bucket") == "test-bucket")
    assert(rows(0).getAs[String]("_sdc_source_file") == "data1.csv")
    // modifiedAfter in the future -> no files selected
    val none = Sources.csvFiles(spark, s"$dir/*.csv", Some(schema),
      modifiedAfter = Some("2099-01-01T00:00:00"))
    assert(none.count() == 0)
  }

  test("kafka record shape extracts PKs from the JSON payload") {
    val kafka = Seq(("""{"id": 7, "v": "x"}""", 0, 42L,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("value", "partition", "offset", "timestamp")
      .withColumn("value", col("value").cast("binary"))
    val out = Sources.kafkaRecordShape(kafka, Map("pk_id" -> "$.id"))
      .select("message_offset", "pk_id").as[(Long, String)].head()
    assert(out == ((42L, "7")))
  }

  test("kafka offset resolution precedence: offset > timestamp > start") {
    import KafkaOffsets._
    val withOffset = Seq(PartitionBookmark(0, Some(41L), Some(999L)),
      PartitionBookmark(1, None, None))
    assert(resolve("t", withOffset) ==
      StartingOffsets("""{"t": {"0": 42}}"""))
    val tsOnly = Seq(PartitionBookmark(0, None, Some(1700000000000L)))
    assert(resolve("t", tsOnly) == StartingTimestamp(1700000000000L))
    assert(resolve("t", Nil, "beginning") == Named("earliest"))
    assert(resolve("t", Nil, "latest") == Named("latest"))
    assert(resolve("t", Nil, "2019-12-09T13:32:12.991Z") ==
      StartingTimestamp(1575898332991L))
  }

  test("discovery: schema, row count, PK candidates, catalog merge") {
    val d = Discovery.parquetStream(spark, "orders",
      s"$sfDir/orders.parquet", checkKeys = true)
    assert(d.rowCount == 1500)
    assert(d.primaryKeyCandidates.contains("o_orderkey"))
    assert(d.schema.fieldNames.contains("o_totalprice"))
    val merged = Discovery.mergeCatalogs(
      Map("orders" -> d.copy(schema = StructType(Seq()))),
      Seq(d, d.copy(name = "brand_new")))
    assert(merged.toMap.apply(d) == "is-modified")
    assert(merged.find(_._1.name == "brand_new").get._2 == "is-new")
  }
}
