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

  /** type -> (config -> handler), the ALERT_HANDLER_TYPES_TO_CLASS table
    * (alert_sender.py:24-27).
    */
  type Registry = Map[String, Map[String, String] => AlertHandler]

  val DefaultRegistry: Registry = Map(
    "stderr" -> (_ => new StderrAlertHandler),
    "file" -> (cfg => new FileAlertHandler(cfg.getOrElse("path",
      throw InvalidAlertHandlerException(
        "file alert handler needs a 'path' config key")))))

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
