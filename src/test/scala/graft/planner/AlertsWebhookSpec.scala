package graft.planner

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Webhook alert handlers driven against a real local HTTP server:
  * payload shapes and level mappings mirror the reference's slack /
  * victorops handlers, and a non-2xx response fails the send loudly
  * (an alert silently dropped is an outage nobody hears about).
  */
class AlertsWebhookSpec extends AnyFunSuite {

  private case class Received(path: String, body: String)

  private def withServer(status: Int)(
      run: (String, ConcurrentLinkedQueue[Received]) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[Received]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      received.add(Received(ex.getRequestURI.getPath, body))
      val resp = "{}".getBytes("UTF-8")
      ex.sendResponseHeaders(status, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}", received)
    finally server.stop(0)
  }

  test("slack handler posts colored attachment; exc rides code-fenced") {
    withServer(200) { (base, received) =>
      val sender = new Alerts.AlertSender(Map("slack" ->
        Map("url" -> s"$base/hook", "channel" -> "#ops")))
      sender.sendToHandler("slack", "tap mysql-fx failed",
        Alerts.Level.Error, Some(new RuntimeException("boom")))
      sender.sendToHandler("slack", "all green", Alerts.Level.Info, None)
      val msgs = received.toArray(Array.empty[Received])
      assert(msgs.length == 2)
      assert(msgs(0).path == "/hook")
      assert(msgs(0).body.contains("\"channel\": \"#ops\""))
      assert(msgs(0).body.contains("\"color\": \"danger\""))
      assert(msgs(0).body.contains("\"title\": \"tap mysql-fx failed\""))
      assert(msgs(0).body.contains("```java.lang.RuntimeException: boom```"))
      assert(msgs(1).body.contains("\"color\": \"good\""))
      assert(!msgs(1).body.contains("\"text\""), "no exc -> no text field")
    }
  }

  test("victorops handler maps levels and targets base_url/routing_key") {
    withServer(200) { (base, received) =>
      val sender = new Alerts.AlertSender(Map("victorops" ->
        Map("base_url" -> base, "routing_key" -> "team-data")))
      sender.sendToHandler("victorops", "db down", Alerts.Level.Error, None)
      sender.sendToHandler("victorops", "lag", Alerts.Level.Warning, None)
      val msgs = received.toArray(Array.empty[Received])
      assert(msgs.length == 2)
      assert(msgs.forall(_.path == "/team-data"))
      assert(msgs(0).body.contains("\"message_type\": \"CRITICAL\""))
      assert(msgs(0).body.contains("\"entity_display_name\": \"db down\""))
      assert(msgs(0).body.contains("\"state_message\": null"))
      assert(msgs(1).body.contains("\"message_type\": \"WARNING\""))
    }
  }

  test("a non-2xx webhook response fails the send loudly") {
    withServer(503) { (base, _) =>
      val sender = new Alerts.AlertSender(Map("victorops" ->
        Map("base_url" -> base, "routing_key" -> "k")))
      val ex = intercept[IllegalStateException] {
        sender.sendToHandler("victorops", "x", Alerts.Level.Error, None)
      }
      assert(ex.getMessage.contains("503"))
    }
  }

  test("missing config keys surface as InvalidAlertHandlerException") {
    intercept[Alerts.InvalidAlertHandlerException] {
      Alerts.slackWebhook(Map.empty)
    }
    intercept[Alerts.InvalidAlertHandlerException] {
      Alerts.victoropsWebhook(Map("base_url" -> "http://x"))
    }
  }
}
