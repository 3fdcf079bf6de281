package graft.cli

import java.nio.file.{Files, Paths}
import graft.SparkSpecBase
import graft.state.Bookmarks

class CliSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeSpec(dir: String): String = {
    val spec = s"""{
      |  "id": "test-pipeline",
      |  "source_dir": "$dir/src",
      |  "target_path": "$dir/target",
      |  "state_path": "$dir/state.json",
      |  "hard_delete": false,
      |  "streams": [
      |    {"name": "src-t1", "table": "t1", "key_properties": ["id"],
      |     "replication_method": "INCREMENTAL", "replication_key": "seq",
      |     "transformations": [
      |       {"field_id": "secret", "type": "HASH"},
      |       {"field_id": "note", "type": "MASK-HIDDEN",
      |        "when": [{"column": "id", "equals": "1"}]}
      |     ]}
      |  ]
      |}""".stripMargin
    val p = s"$dir/pipeline.json"
    Files.writeString(Paths.get(p), spec)
    p
  }

  test("run applies masking + bookmarks; reset_state; partial_sync") {
    val dir = Files.createTempDirectory("cli").toString
    Seq((1L, "aaa", "n1", 1L), (2L, "bbb", "n2", 2L))
      .toDF("id", "secret", "note", "seq")
      .write.parquet(s"$dir/src/t1.parquet")
    val specPath = writeSpec(dir)

    Cli.run(spark, Seq("run", specPath))
    val t1 = spark.read.parquet(s"$dir/target/t1")
    assert(t1.count() == 2)
    val rows = t1.orderBy("id")
      .select("secret", "note").as[(String, String)].collect()
    assert(rows(0)._1.length == 64 && rows(0)._2 == "hidden")
    assert(rows(1)._2 == "n2")
    assert(Bookmarks.load(s"$dir/state.json").get("src-t1").nonEmpty)

    Cli.run(spark, Seq("status", specPath))
    Cli.run(spark, Seq("reset_state", specPath))
    assert(Bookmarks.load(s"$dir/state.json").bookmarks.isEmpty)

    Cli.run(spark, Seq("partial_sync", specPath, "t1", "seq", "1", "1"))
    assert(spark.read.parquet(s"$dir/target/t1").count() == 2)

    Cli.run(spark, Seq("sync_tables", specPath, "t1"))
    assert(spark.read.parquet(s"$dir/target/t1").count() == 2)
  }

  test("spec validation rejects transformations on PKs") {
    val dir = Files.createTempDirectory("cli2").toString
    val bad = s"""{"id": "x", "target_path": "$dir/t",
      |"state_path": "$dir/s.json", "streams": [
      |  {"name": "a", "table": "a", "key_properties": ["id"],
      |   "replication_method": "FULL_TABLE",
      |   "transformations": [{"field_id": "id", "type": "HASH"}]}]}"""
      .stripMargin
    val p = s"$dir/bad.json"
    Files.writeString(Paths.get(p), bad)
    assertThrows[IllegalArgumentException](Cli.loadSpec(p))
  }
}
