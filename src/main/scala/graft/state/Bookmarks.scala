package graft.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Singer-style resumable state: `{"bookmarks": {stream: {...}}}`.
  *
  * Mirrors the reference's state file handling
  * (pipelinewise/cli/pipelinewise.py:1033-1072): the orchestrator persists
  * the last STATE emitted by the target. Here the engine owns the file;
  * writes are atomic (temp + rename) so a killed job never truncates state
  * — the Spark-side analogue of Structured Streaming's commit log for the
  * batch paths (FULL_TABLE / INCREMENTAL).
  *
  * Bookmark values are engine-defined per replication method:
  *  - INCREMENTAL: {"replication_key": k, "replication_key_value": v}
  *  - FULL_TABLE:  {"version": n} (ACTIVATE_VERSION analogue)
  *  - LOG_BASED:   delegated to the streaming checkpoint dir; the entry
  *                 stores {"checkpoint": dir}.
  */
final case class Bookmarks(bookmarks: Map[String, Map[String, JValue]]) {

  def get(stream: String): Option[Map[String, JValue]] = bookmarks.get(stream)

  def replicationKeyValue(stream: String): Option[JValue] =
    get(stream).flatMap(_.get("replication_key_value"))

  def updated(stream: String, value: Map[String, JValue]): Bookmarks =
    copy(bookmarks = bookmarks + (stream -> value))

  def cleared(streams: Seq[String]): Bookmarks =
    copy(bookmarks = bookmarks -- streams)

  def toJson: String = {
    val obj = JObject("bookmarks" -> JObject(
      bookmarks.toList.sortBy(_._1).map { case (k, v) =>
        k -> JObject(v.toList.sortBy(_._1))
      }))
    JsonMethods.compact(JsonMethods.render(obj))
  }

  def save(path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, toJson)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}

object Bookmarks {
  val empty: Bookmarks = Bookmarks(Map.empty)

  /** Throttled writer: persists at most once per `minIntervalMs` (the
    * reference throttles state-file writes to >= 2 s apart,
    * pipelinewise.py:1033-1052) but `flush()` always writes the latest
    * state — the final write after a run must never be dropped.
    */
  final class ThrottledWriter(path: String, minIntervalMs: Long = 2000L) {
    private var lastWrite = 0L
    private var pending: Option[Bookmarks] = None

    def offer(b: Bookmarks): Unit = synchronized {
      val now = System.currentTimeMillis()
      if (now - lastWrite >= minIntervalMs) {
        b.save(path); lastWrite = now; pending = None
      } else pending = Some(b)
    }

    def flush(): Unit = synchronized {
      pending.foreach { b =>
        b.save(path); lastWrite = System.currentTimeMillis()
      }
      pending = None
    }
  }

  def load(path: String): Bookmarks = {
    val p: Path = Paths.get(path)
    if (!Files.exists(p)) empty
    else parse(Files.readString(p))
  }

  def parse(json: String): Bookmarks = {
    JsonMethods.parse(json) \ "bookmarks" match {
      case JObject(fields) =>
        Bookmarks(fields.map { case (stream, v) =>
          stream -> (v match {
            case JObject(inner) => inner.toMap
            case other          => Map("value" -> other)
          })
        }.toMap)
      case _ => empty
    }
  }
}
