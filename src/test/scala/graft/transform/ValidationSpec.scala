package graft.transform

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.transform.Validation._

class ValidationSpec extends SparkSpecBase {
  import spark.implicits._

  test("constraints split valid rows from dead-letter rejects") {
    val df = Seq((1L, "ok", 10.0), (2L, null, 20.0), (3L, "ok", -5.0),
      (4L, "bad type!", 999.0)).toDF("id", "kind", "value")
    val v = validate(df, Seq(NotNull("kind"), InRange("value", 0, 100),
      Matches("kind", "^[a-z]+$")))
    assert(v.valid.select("id").as[Long].collect().toSeq == Seq(1L))
    val rejects = v.rejects.orderBy("id")
      .select(col("id"), col("_violations"))
      .as[(Long, Seq[String])].collect()
    assert(rejects.map(_._1).toSeq == Seq(2L, 3L, 4L))
    // null kind violates both not_null and matches
    assert(rejects(0)._2.toSet ==
      Set("not_null(kind)", "matches(kind)"))
    assert(rejects(2)._2.toSet ==
      Set("in_range(value,0.0,100.0)", "matches(kind)"))
  }

  test("nested field_paths mask only the addressed leaf") {
    val df = Seq((1L, ("alice", ("SEG", 10.5))))
      .toDF("id", "profile")
      .select(col("id"), struct(
        col("profile._1").as("name"),
        struct(col("profile._2._1").as("segment"),
          col("profile._2._2").as("balance")).as("account"))
        .as("profile"))
    val out = Masking.applyNested(df, graft.spec.Transformation(
      "profile", "MASK-HIDDEN", fieldPaths = Seq("account/segment")))
    val row = out.select("profile.name", "profile.account.segment",
      "profile.account.balance").as[(String, String, Double)].head()
    assert(row == (("alice", "hidden", 10.5)))
  }

  test("embedding near-dups: identical vectors share a bucket and pass") {
    val vecs = (0L to 9L).map(i =>
      (i, Seq.tabulate(8)(j => if (j == i % 4) 1.0f else 0.1f))) :+
      (10L, Seq.tabulate(8)(j => if (j == 0) 1.0f else 0.1f)) // dup of 0/4/8
    val df = vecs.toDF("vec_id", "embedding")
    val pairs = graft.operators.Dedup.embeddingNearDups(df,
      "vec_id", "embedding", numPlanes = 4, bandBits = 2, threshold = 0.999)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 10L)))
  }
}
