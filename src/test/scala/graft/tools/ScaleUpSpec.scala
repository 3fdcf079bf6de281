package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.operators.Dedup

/** ScaleUp's salt docMode (r17): per-replica token salt must preserve
  * intra-replica shingle-set structure EXACTLY (the pair families
  * measure real pair growth, not a duplication artifact) while
  * decorrelating fingerprints across replicas — the text/media
  * analogue of the r16 embedding sign pattern.
  */
// driver-excluded slow suite (r21): run with SPARK_GRAFT_SLOW_TESTS=1
@graft.tags.Slow
class ScaleUpSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltTokens drops empty whitespace fragments: no bare ~i " +
      "tokens on multi-space / padded text (r17)") {
    val out = Seq("a  b", " lead", "trail ", "a b")
      .toDF("text")
      .select(ScaleUp.saltTokens(col("text"), 3).as("t"))
      .as[String].collect().toSeq
    assert(out == Seq("a~3 b~3", "lead~3", "trail~3", "a~3 b~3"),
      s"empty fragments must not mint bare salt tokens: $out")
  }

  test("salt replicas: intra-replica jaccard pairs are replica-0's " +
      "shifted with identical J; cross-replica shingles are disjoint; " +
      "fingerprints and media payloads decorrelate (suffix mode " +
      "collapses them — the artifact the mode exists to fix)") {
    val saltDir = Files.createTempDirectory("scaleup-salt").toString
    val sufDir = Files.createTempDirectory("scaleup-suf").toString
    ScaleUp.run(spark, sfDir, saltDir, 3, "salt")
    ScaleUp.run(spark, sfDir, sufDir, 3, "suffix")
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = src.count()
    val ds = src.agg(max(col("doc_id"))).head().getLong(0) + 1
    val salted = spark.read.parquet(s"$saltDir/documents.parquet")
    assert(salted.count() == 3 * n)
    // the salt separator must not occur in the source vocabulary, or
    // the per-token map loses injectivity
    assert(src.filter(col("text").contains("~")).count() == 0,
      "fixture sanity: '~' must be absent from source text")

    def pairs(docs: DataFrame): Set[(Long, Long, Double)] =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val p0 = pairs(salted.filter(col("doc_id") < ds))
    assert(p0.nonEmpty, "fixture sanity: replica 0 must have near-dups")
    (1 to 2).foreach { i =>
      val pi = pairs(salted.filter(col("doc_id") >= i * ds &&
        col("doc_id") < (i + 1) * ds))
      assert(pi == p0.map { case (a, b, j) =>
        (a + i * ds, b + i * ds, j) },
        s"replica $i must carry replica 0's exact pair structure " +
          "(per-token injective map => identical shingle-set relations)")
    }
    // cross-replica shingle sets are DISJOINT: every pair over the
    // full salted fixture stays inside one replica
    val all = pairs(salted)
    assert(all.nonEmpty &&
      all.forall { case (a, b, _) => a / ds == b / ds },
      "salted replicas must share no shingles across replicas")

    // fingerprint decorrelation, measured against suffix mode: count
    // cross-replica banded-Hamming pairs both ways. Suffix replicas
    // collapse (a trailing token barely moves a 32-bit simhash);
    // salted replicas look like independent corpora
    def crossSimhashPairs(dir: String): Long =
      Dedup.simhashNearDups(
          spark.read.parquet(s"$dir/documents.parquet"),
          "doc_id", "text", 32, 3)
        .filter(expr(s"id_a DIV $ds") =!= expr(s"id_b DIV $ds"))
        .count()
    val sufCross = crossSimhashPairs(sufDir)
    val saltCross = crossSimhashPairs(saltDir)
    assert(sufCross > n,
      s"fixture sanity: suffix replicas must collapse fingerprints " +
        s"(saw $sufCross cross-replica pairs for $n docs)")
    assert(saltCross * 20 < sufCross,
      s"salted fingerprints must decorrelate: $saltCross cross pairs " +
        s"vs suffix mode's $sufCross")

    // the salt reaches the derived media payloads: the media fixture
    // fills pixels from the text's LEADING bytes (rpad truncates), so
    // suffix replicas give byte-identical payloads — salted ones differ
    def payloadFor(dir: String): DataFrame =
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          expr("cast(rpad(text, 64, text) as binary)").as("payload"))
    val pl = payloadFor(saltDir)
    val collapsed = pl.filter(col("doc_id") < ds)
      .select(col("doc_id"), col("payload"))
      .join(pl.filter(col("doc_id") >= ds && col("doc_id") < 2 * ds)
          .select((col("doc_id") - ds).as("doc_id"),
            col("payload").as("p2")),
        Seq("doc_id"))
      .filter(col("payload") === col("p2")).count()
    assert(collapsed == 0,
      s"salted replica payload bytes must differ from replica 0 " +
        s"($collapsed identical)")
    val plSuf = payloadFor(sufDir)
    val sufCollapsed = plSuf.filter(col("doc_id") < ds)
      .join(plSuf.filter(col("doc_id") >= ds && col("doc_id") < 2 * ds)
          .select((col("doc_id") - ds).as("doc_id"),
            col("payload").as("p2")),
        Seq("doc_id"))
      .filter(col("payload") === col("p2")).count()
    assert(sufCollapsed > n / 2,
      s"fixture sanity: suffix-mode payloads must collapse " +
        s"($sufCollapsed of $n identical) — the artifact under test")
  }
}
