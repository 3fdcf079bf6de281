package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.operators.Dedup

/** The one-pass kernel must be indistinguishable from the composed
  * concat(unigrams, bigrams) + per-feature hash-bucket-sum formulation
  * it replaced — including on whitespace/unicode edge cases.
  */
class HashedBagScoreSpec extends SparkSpecBase {
  import spark.implicits._

  test("kernel matches the composed HOF formulation on edge cases") {
    val texts = Seq("", " ", "a", "a b", "  a  b  ", "héllo wörld",
      "tab\tsep words", "line\nbreak", "ümlaut STRASSE ss",
      "trailing space ", " leading", "many   inner   spaces",
      ("repeat " * 40).trim, "punct, marks! kept?")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val w = (0 until 97).map(i => i * 7 % 201 - 100)
    val dim = w.length
    val warr = array(w.map(x => lit(x)): _*)
    val f = concat(split(trim(lower(col("text"))), "\\s+"),
      Dedup.shingles(col("text"), 2))
    val ref = docs.select(col("doc_id"),
        size(f).cast("long").as("n"),
        aggregate(
          transform(f, x => element_at(warr,
            (StableHash.hash60(x) % dim + 1).cast("int")).cast("long")),
          lit(0L), (acc, x) => acc + x).as("r"))
      .as[(Long, Long, Long)].collect().toSet
    val ker = docs.select(col("doc_id"),
        HashedBagScore.score(col("text"), w).as("s"))
      .select(col("doc_id"), col("s.n_feats"), col("s.raw_score"))
      .as[(Long, Long, Long)].collect().toSet
    assert(ker == ref)
  }

  test("graft_bag_score SQL surface matches the Column API") {
    GraftFunctions.register(spark)
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta beta"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("bag_docs")
    val w = Seq(5, -3, 11)
    val sql = spark.sql(
      """SELECT doc_id, graft_bag_score(text, array(5, -3, 11)).n_feats
        |    AS n, graft_bag_score(text, array(5, -3, 11)).raw_score AS r
        |FROM bag_docs""".stripMargin)
      .as[(Long, Long, Long)].collect().toSet
    val api = docs.select(col("doc_id"),
        HashedBagScore.score(col("text"), w).as("s"))
      .select(col("doc_id"), col("s.n_feats"), col("s.raw_score"))
      .as[(Long, Long, Long)].collect().toSet
    assert(sql == api)
  }
}
