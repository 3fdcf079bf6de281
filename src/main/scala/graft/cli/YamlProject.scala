package graft.cli

import scala.jdk.CollectionConverters._

import graft.spec._

/** YAML project front-end — the reference's project format: a directory
  * of `tap_*.yml` + `target_*.yml` + `config.yml`
  * (cli/utils.py:150-222 get_tap_target_names / load_yaml, and the
  * sample YAMLs under cli/samples), compiled into runnable pipeline
  * specs the way `pipelinewise import` compiles YAML into per-tap JSON.
  *
  * Vault-encrypted values: any string scalar anywhere in the tree may be
  * a `!graft-vault:` ciphertext ([[graft.spec.Vault]] — the engine's
  * ansible-vault analogue); every string is passed through
  * [[graft.spec.Vault.resolve]] before mapping, so secrets decrypt
  * exactly at load time like the reference's inline-vaulted YAML values.
  *
  * Parsing uses snakeyaml's SafeConstructor (plain maps/lists/scalars,
  * no object instantiation) — the jar ships with Spark itself.
  *
  * Engine mapping (file-backed connections, SURVEY §2.1):
  *   tap `db_conn.directory`   -> PipelineSpec.sourceDir (parquet dir)
  *   target `db_conn.path`     -> PipelineSpec.targetPath
  *   tap `schemas[].tables[]`  -> StreamSpec (replication method/key,
  *                                key_properties, transformations)
  *   `config.yml` alert_handlers -> [[graft.planner.Alerts.AlertSender]]
  */
object YamlProject {

  private def yaml(): org.yaml.snakeyaml.Yaml = {
    val opts = new org.yaml.snakeyaml.LoaderOptions()
    new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(opts))
  }

  /** Load one YAML file into Scala collections, resolving vaulted
    * strings everywhere in the tree.
    */
  def loadYaml(path: String,
               secret: Option[String] = sys.env.get("GRAFT_VAULT_SECRET"))
      : Map[String, Any] = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    resolveTree(toScala(yaml().load[Object](text)), secret) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => sys.error(s"$path: expected a YAML mapping, got $other")
    }
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toList
    case other => other
  }

  private def resolveTree(v: Any, secret: Option[String]): Any = v match {
    case s: String => Vault.resolve(s, secret)
    case m: Map[_, _] =>
      m.map { case (k, x) => k -> resolveTree(x, secret) }
    case l: List[_] => l.map(resolveTree(_, secret))
    case other => other
  }

  /** tap_*.yml / target_*.yml partition of a project directory
    * (utils.py:150-172).
    */
  def tapTargetFiles(dir: String): (Seq[String], Seq[String]) = {
    val d = new java.io.File(dir)
    val ymls = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile &&
        (f.getName.endsWith(".yml") || f.getName.endsWith(".yaml")))
      .map(_.getAbsolutePath).toSeq.sorted
    (ymls.filter(p => new java.io.File(p).getName.startsWith("tap_")),
      ymls.filter(p => new java.io.File(p).getName.startsWith("target_")))
  }

  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).collect { case s: String => s }

  private def int(m: Map[String, Any], k: String): Option[Int] =
    m.get(k).collect { case i: Int => i; case l: Long => l.toInt }

  private def listOfMaps(m: Map[String, Any], k: String)
      : List[Map[String, Any]] =
    m.get(k).collect { case l: List[_] =>
      l.collect { case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]] }
    }.getOrElse(Nil)

  /** Compile one tap YAML (joined with its target YAML) into the
    * engine's PipelineSpec.
    */
  def compileTap(tap: Map[String, Any], targets: Map[String, Map[String, Any]],
                 stateDir: String): PipelineSpec = {
    val tapId = str(tap, "id").getOrElse(sys.error("tap yaml needs id"))
    val targetId = str(tap, "target")
      .getOrElse(sys.error(s"tap $tapId: missing target"))
    val target = targets.getOrElse(targetId,
      sys.error(s"tap $tapId: unknown target '$targetId' " +
        s"(have: ${targets.keys.toSeq.sorted.mkString(", ")})"))
    val targetConn = target.get("db_conn")
      .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
      .getOrElse(Map.empty[String, Any])
    val tapConn = tap.get("db_conn")
      .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
      .getOrElse(Map.empty[String, Any])
    val streams = listOfMaps(tap, "schemas").flatMap { schema =>
      listOfMaps(schema, "tables").map { t =>
        val tableName = str(t, "table_name")
          .getOrElse(sys.error(s"tap $tapId: table_name missing"))
        val transformations = listOfMaps(t, "transformations").map { tr =>
          Transformation(
            str(tr, "column").getOrElse(sys.error("transformation column")),
            str(tr, "type").getOrElse(sys.error("transformation type")),
            listOfMaps(tr, "when").map { c =>
              TransformCondition(
                str(c, "column").getOrElse(sys.error("condition column")),
                str(c, "equals"), str(c, "regex_match"))
            })
        }
        val pks = t.get("key_properties").collect { case l: List[_] =>
          l.collect { case s: String => s } }.getOrElse(Nil)
        StreamSpec(
          s"$tapId-$tableName", tableName, pks,
          ReplicationMethod.parse(
            str(t, "replication_method").getOrElse("FULL_TABLE")),
          str(t, "replication_key"), None, transformations)
      }
    }
    val spec = PipelineSpec(
      tapId, streams,
      targetPath = str(targetConn, "path").getOrElse(
        sys.error(s"target $targetId: db_conn.path missing")),
      statePath = s"$stateDir/$tapId.state.json",
      sourceDir = str(tapConn, "directory"),
      hardDelete = tap.get("hard_delete").contains(true),
      batchSizeRows = int(tap, "batch_size_rows").getOrElse(100000))
    spec.streams.foreach(_.validate())
    spec
  }

  /** Import a whole project directory: every tap compiled against its
    * target. Mirrors `pipelinewise import_project`.
    */
  def importProject(dir: String,
                    secret: Option[String] =
                      sys.env.get("GRAFT_VAULT_SECRET"))
      : Seq[PipelineSpec] = {
    val (taps, targets) = tapTargetFiles(dir)
    require(taps.nonEmpty, s"$dir: no tap_*.yml files")
    val targetById = targets.map(loadYaml(_, secret))
      .map(t => str(t, "id").getOrElse(sys.error("target yaml needs id")) -> t)
      .toMap
    taps.map(p => compileTap(loadYaml(p, secret), targetById,
      stateDir = s"$dir/.state"))
  }

  /** `config.yml` alert handlers (cli/samples/config.yml) as the
    * AlertSender's handler-config map; absent file or key -> no handlers.
    */
  def loadAlertHandlers(dir: String,
                        secret: Option[String] =
                          sys.env.get("GRAFT_VAULT_SECRET"))
      : Map[String, Map[String, String]] = {
    val f = java.nio.file.Paths.get(dir, "config.yml")
    if (!java.nio.file.Files.exists(f)) return Map.empty
    loadYaml(f.toString, secret).get("alert_handlers") match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].map {
          case (t, cfg: Map[_, _]) =>
            t -> cfg.asInstanceOf[Map[String, Any]]
              .map { case (k, v) => k -> String.valueOf(v) }
          // a bare `stderr:` key parses as null — a handler with no
          // config keys, NOT a handler to silently drop
          case (t, null) => t -> Map.empty[String, String]
          case (t, other) => sys.error(
            s"alert handler '$t': expected a config mapping, got $other")
        }
      case _ => Map.empty
    }
  }
}
