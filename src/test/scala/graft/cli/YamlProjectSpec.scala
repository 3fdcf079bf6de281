package graft.cli

import java.nio.file.{Files, Paths}

import graft.SparkSpecBase
import graft.planner.{Alerts, Planner}
import graft.spec.{ReplicationMethod, Vault}

/** YAML project front-end: tap/target YAML compile, inline
  * vault-encrypted values, config.yml alert handlers, and an
  * end-to-end run of the compiled pipeline.
  */
class YamlProjectSpec extends SparkSpecBase {
  import spark.implicits._

  private def write(path: String, text: String): Unit =
    Files.writeString(Paths.get(path), text)

  test("importProject compiles tap+target YAML with vaulted values") {
    val dir = Files.createTempDirectory("yamlproj").toString
    val secret = "s3cret"
    // the vault ciphertext sits INLINE in the YAML, like the reference's
    // ansible-vault strings; here it hides the target path
    val vaultedPath = Vault.encrypt(s"$dir/warehouse", secret)
    write(s"$dir/target_wh.yml",
      s"""id: "wh"
         |type: "target-parquet"
         |db_conn:
         |  path: "$vaultedPath"
         |""".stripMargin)
    write(s"$dir/tap_orders.yml",
      s"""id: "orders"
         |type: "tap-parquet"
         |target: "wh"
         |batch_size_rows: 5000
         |db_conn:
         |  directory: "$dir/src"
         |schemas:
         |  - source_schema: "public"
         |    target_schema: "repl"
         |    tables:
         |      - table_name: "t1"
         |        replication_method: "INCREMENTAL"
         |        replication_key: "seq"
         |        key_properties: ["id"]
         |        transformations:
         |          - column: "v"
         |            type: "HASH"
         |      - table_name: "t2"
         |        replication_method: "FULL_TABLE"
         |""".stripMargin)
    write(s"$dir/config.yml",
      s"""alert_handlers:
         |  file:
         |    path: "$dir/alerts.log"
         |""".stripMargin)

    val specs = YamlProject.importProject(dir, secret = Some(secret))
    assert(specs.size == 1)
    val p = specs.head
    assert(p.id == "orders" && p.targetPath == s"$dir/warehouse",
      "vaulted target path must decrypt at load time")
    assert(p.sourceDir.contains(s"$dir/src"))
    assert(p.batchSizeRows == 5000)
    assert(p.streams.map(_.name) == Seq("orders-t1", "orders-t2"))
    val t1 = p.streams.head
    assert(t1.replicationMethod == ReplicationMethod.Incremental &&
      t1.replicationKey.contains("seq") && t1.keyProperties == Seq("id"))
    assert(t1.transformations.map(t => (t.fieldId, t.transformType)) ==
      Seq(("v", "HASH")))

    val handlers = YamlProject.loadAlertHandlers(dir, secret = Some(secret))
    assert(handlers == Map("file" -> Map("path" -> s"$dir/alerts.log")))

    // the compiled spec RUNS: seed a parquet source, replicate, alert
    // handlers wired from config.yml fire on the (absent-table) failure
    Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("id", "v", "seq")
      .write.parquet(s"$dir/src/t1.parquet")
    val sender = new Alerts.AlertSender(handlers)
    Planner.run(spark, p, t => s"${p.sourceDir.get}/$t.parquet",
      onError = Alerts.onError(sender))
    assert(spark.read.parquet(s"$dir/warehouse/t1").count() == 2)
    val alerts = new String(Files.readAllBytes(Paths.get(s"$dir/alerts.log")),
      "UTF-8")
    assert(alerts.contains("orders-t2"),
      s"missing-table stream must alert via config.yml handler: $alerts")
  }

  test("import_project and run_project CLI commands drive a YAML project") {
    val dir = Files.createTempDirectory("yamlcli").toString
    write(s"$dir/target_wh.yml",
      s"""id: "wh"
         |db_conn:
         |  path: "$dir/wh"
         |""".stripMargin)
    write(s"$dir/tap_t.yml",
      s"""id: "t"
         |target: "wh"
         |db_conn:
         |  directory: "$dir/src"
         |schemas:
         |  - source_schema: "s"
         |    tables:
         |      - table_name: "a"
         |        replication_method: "FULL_TABLE"
         |""".stripMargin)
    Seq((1L, "x")).toDF("id", "v").write.parquet(s"$dir/src/a.parquet")
    Cli.run(spark, Seq("import_project", dir))
    Cli.run(spark, Seq("run_project", dir))
    assert(spark.read.parquet(s"$dir/wh/a").count() == 1)
    assert(Files.exists(Paths.get(s"$dir/.logs/t-t-a.log.success")),
      "run_project must leave a .success status log")
  }

  test("a bare config-less handler key parses as an empty config") {
    val dir = Files.createTempDirectory("yamlnull").toString
    write(s"$dir/config.yml",
      """alert_handlers:
        |  stderr:
        |""".stripMargin)
    assert(YamlProject.loadAlertHandlers(dir, secret = None) ==
      Map("stderr" -> Map.empty[String, String]),
      "stderr takes no config keys; a null value must not drop it")
  }

  test("unknown target and missing files fail with clear errors") {
    val dir = Files.createTempDirectory("yamlbad").toString
    write(s"$dir/tap_a.yml",
      """id: "a"
        |target: "nope"
        |""".stripMargin)
    val e = intercept[RuntimeException] {
      YamlProject.importProject(dir, secret = None)
    }
    assert(e.getMessage.contains("unknown target 'nope'"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      YamlProject.importProject(
        Files.createTempDirectory("yamlempty").toString, secret = None)
    }
    assert(e2.getMessage.contains("no tap_*.yml"), e2.getMessage)
  }
}
