package graft.planner

/** Pluggable alert-handler surface, mirroring the reference's
  * AlertSender registry (pipelinewise/cli/alert_sender.py:24-150: a
  * type->class table, per-handler config dicts, send_to_handler /
  * send_to_all_handlers) and its error taxonomy
  * (cli/alert_handlers/errors.py).
  *
  * The reference ships slack and victorops handlers; both are HTTP
  * webhooks, unreachable from this sandbox (zero egress), so the
  * built-in registry carries the offline-testable handlers — `stderr`
  * (the engine's previous hardcoded behavior) and `file` (append one
  * line per alert, the fake used by specs). The registry constructor
  * parameter is the seam where a slack/victorops handler plugs in
  * unchanged: `new AlertSender(handlers, Alerts.registryWith(...))`.
  */
object Alerts {

  /** Alert levels (base_alert_handler.py:13-16). */
  object Level {
    val Log = "log"
    val Info = "info"
    val Warning = "warning"
    val Error = "error"
  }

  /** One handler implementation (base_alert_handler.py:8-32). */
  trait AlertHandler {
    def send(message: String, level: String = Level.Error,
             exc: Option[Throwable] = None): Unit
  }

  final case class InvalidAlertHandlerException(msg: String)
      extends RuntimeException(msg)
  final case class NotImplementedAlertHandlerException(msg: String)
      extends RuntimeException(msg)
  final case class NotConfiguredAlertHandlerException(msg: String)
      extends RuntimeException(msg)

  /** Append-a-line file handler — the offline stand-in for a webhook
    * handler; also what a production deployment tails into its own
    * alerting bus.
    */
  final class FileAlertHandler(path: String) extends AlertHandler {
    override def send(message: String, level: String,
                      exc: Option[Throwable]): Unit = {
      val line = s"[$level] $message" +
        exc.map(e => s" (${e.getClass.getSimpleName}: ${e.getMessage})")
          .getOrElse("") + "\n"
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        line.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  final class StderrAlertHandler extends AlertHandler {
    override def send(message: String, level: String,
                      exc: Option[Throwable]): Unit =
      System.err.println(s"[graft-alert][$level] $message" +
        exc.map(e => s": ${e.getMessage}").getOrElse(""))
  }

  /** Generic JSON-POST webhook handler — the transport both reference
    * webhook handlers share. `payload` renders the service-specific
    * body; a response outside `okStatus` raises (mirroring the
    * reference's victorops_alert_handler.py:74-80 behavior of failing
    * the send loudly rather than dropping the alert).
    */
  final class WebhookAlertHandler(
      url: String,
      payload: (String, String, Option[Throwable]) => String,
      okStatus: Int => Boolean = _ / 100 == 2) extends AlertHandler {
    override def send(message: String, level: String,
                      exc: Option[Throwable]): Unit = {
      val body = payload(message, level, exc)
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", "application/json")
        .timeout(java.time.Duration.ofSeconds(10))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = java.net.http.HttpClient.newHttpClient()
        .send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (!okStatus(resp.statusCode()))
        throw new IllegalStateException(
          s"webhook returned ${resp.statusCode()}: ${resp.body()}")
    }
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Slack-shaped payload (slack_alert_handler.py:10-15,62-73): the
    * exception rides as a code-fenced `text`, the message as a colored
    * attachment title, colors keyed by level.
    */
  def slackWebhook(cfg: Map[String, String]): AlertHandler = {
    val url = cfg.getOrElse("url", throw InvalidAlertHandlerException(
      "slack alert handler needs a 'url' config key (incoming webhook)"))
    val channel = cfg.get("channel")
    val colors = Map(Level.Log -> "36C5F0", Level.Info -> "good",
      Level.Warning -> "warning", Level.Error -> "danger")
    new WebhookAlertHandler(url, (message, level, exc) => {
      val fields = Seq(
        channel.map(c => s""""channel": ${jstr(c)}"""),
        exc.map(e => s""""text": ${jstr(s"```$e```")}"""),
        Some(s""""attachments": [{"color": ${jstr(
          colors.getOrElse(level, "danger"))}, "title": ${jstr(message)}}]""")
      ).flatten
      fields.mkString("{", ", ", "}")
    })
  }

  /** VictorOps REST payload (victorops_alert_handler.py:11-16,56-80):
    * POST to `<base_url>/<routing_key>`, level mapped to message_type,
    * non-200 raises.
    */
  def victoropsWebhook(cfg: Map[String, String]): AlertHandler = {
    val baseUrl = cfg.getOrElse("base_url",
      throw InvalidAlertHandlerException(
        "victorops alert handler needs a 'base_url' config key"))
    val routingKey = cfg.getOrElse("routing_key",
      throw InvalidAlertHandlerException(
        "victorops alert handler needs a 'routing_key' config key"))
    val types = Map(Level.Log -> "INFO", Level.Info -> "INFO",
      Level.Warning -> "WARNING", Level.Error -> "CRITICAL")
    new WebhookAlertHandler(s"$baseUrl/$routingKey",
      (message, level, exc) =>
        s"""{"message_type": ${jstr(types.getOrElse(level, "CRITICAL"))}, """ +
        s""""entity_display_name": ${jstr(message)}, """ +
        s""""state_message": ${exc.map(e => jstr(e.toString))
          .getOrElse("null")}}""",
      okStatus = _ == 200)
  }

  /** type -> (config -> handler), the ALERT_HANDLER_TYPES_TO_CLASS table
    * (alert_sender.py:24-27).
    */
  type Registry = Map[String, Map[String, String] => AlertHandler]

  val DefaultRegistry: Registry = Map(
    "stderr" -> (_ => new StderrAlertHandler),
    "file" -> (cfg => new FileAlertHandler(cfg.getOrElse("path",
      throw InvalidAlertHandlerException(
        "file alert handler needs a 'path' config key")))),
    "slack" -> slackWebhook,
    "victorops" -> victoropsWebhook)

  def registryWith(extra: (String, Map[String, String] => AlertHandler)*)
      : Registry = DefaultRegistry ++ extra

  /** The dispatcher (alert_sender.py:30-150): configured handler types
    * with their configs; unknown types surface as NotImplemented at send
    * time, unconfigured ones as NotConfigured.
    */
  final class AlertSender(handlers: Map[String, Map[String, String]],
                          registry: Registry = DefaultRegistry) {

    def sendToHandler(handlerType: String, message: String,
                      level: String = Level.Error,
                      exc: Option[Throwable] = None): Boolean = {
      val config = handlers.getOrElse(handlerType,
        throw NotConfiguredAlertHandlerException(
          s"Alert handler type not configured: $handlerType"))
      val build = registry.getOrElse(handlerType,
        throw NotImplementedAlertHandlerException(
          s"Alert handler type not implemented: $handlerType"))
      build(config).send(message, level, exc)
      true
    }

    /** Returns the number of handlers alerted (send_to_all_handlers'
      * `{'sent': n}`).
      */
    def sendToAllHandlers(message: String, level: String = Level.Error,
                          exc: Option[Throwable] = None): Int =
      handlers.keys.toSeq.sorted
        .count(t => sendToHandler(t, message, level, exc))
  }

  /** Adapter for [[Planner.run]]'s onError callback: one alert per failed
    * stream, like pipelinewise.py:119-142's send_alert on tap failure.
    */
  def onError(sender: AlertSender): (String, Throwable) => Unit =
    (stream, e) => sender.sendToAllHandlers(
      s"stream $stream failed: ${e.getMessage}", Level.Error, Some(e))
}
