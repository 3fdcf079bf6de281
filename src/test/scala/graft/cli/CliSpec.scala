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

  test("init scaffolds a validatable spec; test_tap_connection reports") {
    val dir = Files.createTempDirectory("cli-init").toString
    Cli.run(spark, Seq("init", dir))
    val specPath = s"$dir/pipeline.json"
    Cli.run(spark, Seq("validate", specPath))
    // no source data yet: connection test must fail loudly
    intercept[RuntimeException] {
      Cli.run(spark, Seq("test_tap_connection", specPath))
    }
    Seq((1L, 1L)).toDF("id", "seq")
      .write.parquet(s"$dir/source/t.parquet")
    Cli.run(spark, Seq("test_tap_connection", specPath))
  }

  test("stop_tap marker halts the run at the next stream boundary") {
    val dir = Files.createTempDirectory("cli-stop").toString
    Seq((1L, "a", "n", 1L)).toDF("id", "secret", "note", "seq")
      .write.parquet(s"$dir/src/t1.parquet")
    val specPath = writeSpec(dir)
    Cli.run(spark, Seq("stop_tap", specPath))
    // marker pre-set: run starts, clears it... no — run deletes stale
    // markers at start, so a marker set BEFORE the run must not block it
    Cli.run(spark, Seq("run", specPath))
    assert(spark.read.parquet(s"$dir/target/t1").count() == 1)
  }

  test("vault: encrypt/decrypt round trip; plain passthrough") {
    val secret = "s3cret-key"
    val v = graft.spec.Vault.encrypt("password123", secret)
    assert(v.startsWith(graft.spec.Vault.Prefix))
    assert(graft.spec.Vault.decrypt(v, secret) == "password123")
    assert(graft.spec.Vault.resolve("plain-value") == "plain-value")
    assert(graft.spec.Vault.resolve(v, Some(secret)) == "password123")
    intercept[Exception] {
      graft.spec.Vault.decrypt(v, "wrong-key")
    }
    // two encryptions of the same plaintext differ (fresh salt+iv)
    assert(graft.spec.Vault.encrypt("x", secret) !=
      graft.spec.Vault.encrypt("x", secret))
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
