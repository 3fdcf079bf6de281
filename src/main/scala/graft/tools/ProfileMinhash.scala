package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only: A/B the minhash-LSH pair-generation spellings at sf0.1 —
  * (a) persist sigs, band per join side (pre-r20), (b) persist the
  * pre-clustered banded frame (r20), (c) no self-join at all: per-bucket
  * collect_list + in-row pair expansion. Each timed bench-style (cold +
  * 3 passes, canary-normalized) with the executed-plan exchange count.
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (k, numHashes, rowsPerBand, threshold) = (3, 12, 3, 0.5)
    val numBands = numHashes / rowsPerBand

    def sigs: DataFrame =
      Dedup.minhashSignatures(docs, "doc_id", "text", k, numHashes)
    val sigArr = array((0 until numHashes).map(i => col(s"sig_$i")): _*)
    val bandKeys = array((0 until numBands).map { b =>
      concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*)
    }: _*)
    def banded(s: DataFrame): DataFrame =
      s.select(col("doc_id").as("id"), sigArr.as("sig"),
        posexplode(bandKeys).as(Seq("band_no", "bk")))
    val agree = aggregate(
      zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    def verify(cand: DataFrame): DataFrame = cand
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / numHashes).as("sig_agreement"))
      .filter(col("sig_agreement") >= threshold)
      .distinct()

    def variantA(): DataFrame = { // pre-r20
      val sg = sigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val b = banded(sg)
      val l = b.select(col("band_no"), col("bk"), col("id").as("id_a"), col("sig").as("sig_a"))
      val r = b.select(col("band_no"), col("bk"), col("id").as("id_b"), col("sig").as("sig_b"))
      Dedup.releaseAfter(verify(
        l.join(r, Seq("band_no", "bk")).filter(col("id_a") < col("id_b"))), sg)
    }
    def variantB(): DataFrame = { // r20
      val b = banded(sigs).repartition(col("band_no"), col("bk"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val l = b.select(col("band_no"), col("bk"), col("id").as("id_a"), col("sig").as("sig_a"))
      val r = b.select(col("band_no"), col("bk"), col("id").as("id_b"), col("sig").as("sig_b"))
      Dedup.releaseAfter(verify(
        l.join(r, Seq("band_no", "bk")).filter(col("id_a") < col("id_b"))), b)
    }
    def variantC(): DataFrame = { // grouped in-row pair expansion
      val b = banded(sigs)
      val grouped = b.groupBy(col("band_no"), col("bk"))
        .agg(sort_array(collect_list(struct(col("id"), col("sig")))).as("ms"))
        .filter(size(col("ms")) > 1)
      val pairs = grouped.select(explode(expr(
        """flatten(transform(ms, (x, i) ->
          |  transform(slice(ms, i + 2, size(ms) - i - 1), y ->
          |    struct(x.id as id_a, y.id as id_b,
          |           x.sig as sig_a, y.sig as sig_b))))""".stripMargin))
        .as("p")).select(col("p.*"))
      verify(pairs).localCheckpoint(true)
    }

    def time(name: String)(f: () => DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save() // cold
      spark.catalog.clearCache()
      val ts = (1 to 3).map { _ =>
        val c = graft.BenchEnv.canary()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (w, w / c.mtSec)
      }
      val raw = ts.map(_._1).sorted.apply(1)
      val norm = ts.map(_._2).sorted.apply(1)
      println(f"[minhash] $name%-10s median=$raw%6.3fs canary_units=$norm%7.2f")
    }
    // result parity first — variants must agree exactly
    val (ra, rb, rc) = (variantA().count(), variantB().count(), variantC().count())
    require(ra == rb && rb == rc, s"row counts diverge: $ra $rb $rc")
    val da = variantA().union(variantB()).union(variantC())
      .distinct().count()
    println(s"[minhash] parity: rows=$ra distinct-union=$da")
    time("A(pre-r20)")(variantA)
    time("B(r20)")(variantB)
    time("C(grouped)")(variantC)
    spark.stop()
  }
}
