package graft.transform

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpecBase

class FlatteningSpec extends SparkSpecBase {
  import spark.implicits._

  test("nested structs flatten to parent__child up to maxLevel") {
    val df = Seq((1L, "a", "b")).toDF("id", "x", "y")
      .select(col("id"), struct(col("x"),
        struct(col("y")).as("inner")).as("outer"))
    val full = Flattening.apply(df, maxLevel = 5)
    assert(full.columns.toSeq == Seq("id", "outer__x", "outer__inner__y"))
    val lvl1 = Flattening.apply(df, maxLevel = 1)
    assert(lvl1.columns.toSeq == Seq("id", "outer__x", "outer__inner"))
    // beyond-level structs are JSON-stringified
    assert(lvl1.select("outer__inner").as[String].head() == """{"y":"b"}""")
  }

  test("maxLevel=0 is a no-op") {
    val df = Seq((1, 2)).toDF("a", "b")
    assert(Flattening.apply(df, 0) eq df)
  }

  test("overlong keys are camel-compressed at 255 chars") {
    val longKey = (1 to 30).map(i => s"field$i").mkString("__")
    val key300 = "a" * 120 + "__middlepart__" + "b" * 140
    assert(Flattening.compressKey("short__key") == "short__key")
    val c = Flattening.compressKey(key300)
    assert(c.length <= 255 && c.startsWith("a" * 120) && c.contains("__M__"))
  }

  test("property: timestamp clamp never exceeds the sentinel") {
    val gen = Gen.oneOf(
      Gen.choose(0L, 253402300799L).map(s =>
        java.time.Instant.ofEpochSecond(s).toString.replace("T", " ")
          .stripSuffix("Z")),
      Gen.const("not a date"),
      Gen.const("20107-05-28 00:00:00"),
      Gen.alphaNumStr)
    val samples = Gen.listOfN(200, gen).sample.getOrElse(Nil)
    assert(samples.nonEmpty)
    val out = samples.toDF("ts")
      .select(Metadata.clampTimestampString(col("ts")).cast("string"))
      .as[String].collect()
    out.foreach(v =>
      assert(v == null || v <= "9999-12-31 23:59:59.999999"))
  }
}
