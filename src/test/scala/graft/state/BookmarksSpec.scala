package graft.state

import java.nio.file.Files
import org.json4s.{JLong, JString}
import org.scalatest.funsuite.AnyFunSuite

class BookmarksSpec extends AnyFunSuite {

  test("roundtrip save/load") {
    val dir = Files.createTempDirectory("bm").toString
    val path = s"$dir/state.json"
    val b = Bookmarks.empty
      .updated("public-city", Map(
        "replication_key" -> JString("id"),
        "replication_key_value" -> JLong(1000L)))
      .updated("s3_feed-my_table", Map(
        "modified_since" -> JString("2022-01-01T00:00:00+00:00")))
    b.save(path)
    val loaded = Bookmarks.load(path)
    // json4s parses integral numbers as JInt (BigInt) — compare numerically
    assert(loaded.replicationKeyValue("public-city")
      .exists(v => v.values == BigInt(1000) || v.values == 1000L))
    assert(loaded.get("s3_feed-my_table").get("modified_since") ==
      JString("2022-01-01T00:00:00+00:00"))
  }

  test("missing file loads empty; singer-shape json parses") {
    assert(Bookmarks.load("/tmp/does-not-exist-graft.json").bookmarks.isEmpty)
    val b = Bookmarks.parse(
      """{"currently_syncing": null, "bookmarks":
        |{"mysql-orders": {"log_file": "binlog.000002", "log_pos": 334}}}"""
        .stripMargin)
    assert(b.get("mysql-orders").get("log_file") == JString("binlog.000002"))
  }

  test("throttled writer coalesces rapid saves but never drops the last") {
    val dir = Files.createTempDirectory("bmthrottle").toString
    val path = s"$dir/state.json"
    val w = new Bookmarks.ThrottledWriter(path, minIntervalMs = 60000)
    val b1 = Bookmarks.empty.updated("a", Map("v" -> JLong(1L)))
    val b2 = Bookmarks.empty.updated("a", Map("v" -> JLong(2L)))
    w.offer(b1) // first write goes through
    w.offer(b2) // throttled -> pending
    assert(Bookmarks.load(path).get("a").get("v").values == BigInt(1))
    w.flush()   // final write must not be dropped
    assert(Bookmarks.load(path).get("a").get("v").values == BigInt(2))
  }

  test("cleared removes stream bookmarks (reset_state)") {
    val b = Bookmarks.empty.updated("a", Map("v" -> JLong(1L)))
      .updated("b", Map("v" -> JLong(2L)))
    assert(b.cleared(Seq("a")).get("a").isEmpty)
    assert(b.cleared(Seq("a")).get("b").nonEmpty)
  }
}
