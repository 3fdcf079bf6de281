package graft.transform

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.spec.{TransformCondition, Transformation}

class MaskingSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(t: Transformation, value: String): String = {
    val df = Seq((value, "B")).toDF("f", "guard")
    Masking.apply(df, t).select(col("f")).as[String].head()
  }

  test("SET-NULL / MASK-HIDDEN / MASK-NUMBER") {
    assert(one(Transformation("f", "SET-NULL"), "secret") == null)
    assert(one(Transformation("f", "MASK-HIDDEN"), "secret") == "hidden")
    val n = Seq((42.0, "x")).toDF("f", "g")
    assert(Masking.apply(n, Transformation("f", "MASK-NUMBER"))
      .select(col("f")).as[Long].head() == 0L)
  }

  test("HASH is sha256 hex; HASH-SKIP-FIRST keeps prefix") {
    val h = one(Transformation("f", "HASH"), "abc")
    assert(h ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    val hs = one(Transformation("f", "HASH-SKIP-FIRST-2"), "abcdef")
    assert(hs.startsWith("ab") && hs.length == 2 + 64)
  }

  test("MASK-STRING-SKIP-ENDS: long keeps ends, short all-stars") {
    assert(one(Transformation("f", "MASK-STRING-SKIP-ENDS-3"),
      "abcdefghij") == "abc****hij")
    assert(one(Transformation("f", "MASK-STRING-SKIP-ENDS-3"),
      "abcdef") == "******")
  }

  test("MASK-DATE keeps year and time-of-day") {
    val df = Seq("2019-07-24 13:45:59").toDF("s")
      .select(to_timestamp(col("s")).as("f"))
    val out = Masking.apply(df, Transformation("f", "MASK-DATE"))
      .select(date_format(col("f"), "yyyy-MM-dd HH:mm:ss")).as[String].head()
    assert(out == "2019-01-01 13:45:59")
  }

  test("conditions gate the mask (equals AND regex)") {
    val df = Seq(("lorem x", "B"), ("lorem x", "A"), ("other", "B"))
      .toDF("f", "guard")
    val t = Transformation("f", "MASK-HIDDEN", Seq(
      TransformCondition("guard", equals = Some("B")),
      TransformCondition("f", regexMatch = Some("^lorem.*"))))
    val out = Masking.apply(df, t).select(col("f")).as[String].collect()
    assert(out.toSeq == Seq("hidden", "lorem x", "other"))
  }

  test("transformations on PK/replication key are rejected") {
    import graft.spec._
    val s = StreamSpec("public-t", "t", Seq("id"),
      ReplicationMethod.Incremental, Some("updated_at"),
      transformations = Seq(Transformation("id", "HASH")))
    assertThrows[IllegalArgumentException](s.validate())
  }
}
