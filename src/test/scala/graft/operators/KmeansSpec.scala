package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class KmeansSpec extends SparkSpecBase {
  import spark.implicits._

  // two tight, well-separated direction blobs (cosine geometry): ids
  // 0..49 hug +x, ids 50..99 hug +y. Fixed-k hash seeding with k=2
  // picks the 2 smallest hash60(id) rows — over 0..99 those are id 27
  // (+x blob) and id 63 (+y blob), one seed per blob.
  private val SeedX = 27L
  private val SeedY = 63L
  private def blobs = {
    val rnd = new scala.util.Random(7)
    (0 until 100).map { i =>
      val base = if (i < 50) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      val v = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("the k smallest-hash rows seed, one per blob, cid = own id") {
    // independent recomputation of the seeding rule: smallest
    // hash60(CAST(id AS STRING)), ties by id
    val expected = blobs
      .select(col("vec_id"),
        graft.functions.StableHash.hash60(col("vec_id").cast("string"))
          .as("h"))
      .orderBy(col("h").asc, col("vec_id").asc)
      .limit(2).select("vec_id").as[Long].collect().toSet
    assert(expected == Set(SeedX, SeedY), s"hash order moved: $expected")
  }

  test("separated blobs resolve to their seed centroids") {
    val a = Similarity.kmeansAssignExact(blobs, "vec_id", "embedding",
      k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert((0L until 50L).forall(a(_) == SeedX))
    assert((50L until 100L).forall(a(_) == SeedY))
  }

  test("train and assign agree: n_members matches the assignment counts") {
    val cents = Similarity.kmeansTrainExact(blobs, "vec_id", "embedding",
      k = 2, iters = 2)
      .select("centroid_id", "n_members").as[(Long, Long)].collect().toMap
    val counts = Similarity.kmeansAssignExact(blobs, "vec_id", "embedding",
      k = 2, iters = 2)
      .groupBy("cluster").count()
      .as[(Long, Long)].collect().toMap
    // n_members reports the LAST update round; on converged blobs the
    // final assignment is identical
    assert(cents == counts)
  }

  test("centroid sums are exact under any partitioning") {
    val one = Similarity.kmeansTrainExact(blobs.repartition(1), "vec_id",
      "embedding", k = 2, iters = 2).collect()
    val many = Similarity.kmeansTrainExact(blobs.repartition(13), "vec_id",
      "embedding", k = 2, iters = 2).collect()
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toList)).sortBy(_._1).toList
    assert(canon(one) == canon(many))
  }

  test("a corpus smaller than k seeds min(k, n) and never fails") {
    // 3 rows, k=10: exactly 3 seeds exist — the old modulo seeding
    // could silently under- or over-seed on odd id spaces
    val tiny = Seq((7L, Array(1f, 0f, 0f, 0f)),
      (8L, Array(0f, 1f, 0f, 0f)), (9L, Array(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansTrainExact(tiny, "vec_id", "embedding",
      k = 10, iters = 2).collect()
    assert(cents.length == 3)
  }

  test("a seed that attracts no vectors drops from the output") {
    // 3 seeds over 6 identical vectors: every sim ties, the min-cid
    // tie-break sends everything to the smallest seed id; the other
    // two seeds attract nothing and vanish
    val same = (0 until 6).map(i =>
      (i.toLong, Array(1f, 0.5f, 0f, 0f))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansTrainExact(same, "vec_id", "embedding",
      k = 3, iters = 2).collect()
    assert(cents.length == 1 && cents.head.getLong(1) == 6L)
    // the survivor is the smallest of the 3 seed ids (hash order over
    // 0..5 opens 4, 1, 2 — min is 1)
    assert(cents.head.getLong(0) == 1L)
  }

  test("diagnostics flag a planted orthogonal outlier") {
    // blobs live in the x/y plane; vector 101 points along z. 101 is
    // not among the 2 smallest hashes of 0..101 (seeds stay 27/63), so
    // it cannot seed its own centroid — far from both trained
    // centroids, it must carry the smallest sim_q
    val planted = blobs.union(
      Seq((101L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding"))
    val d = Similarity.kmeansDiagnostics(planted, "vec_id", "embedding",
      k = 2, iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val outlier = d(101L)
    assert(d.filter(_._1 != 101L).values.forall(_ > outlier),
      s"planted outlier not minimal: $outlier")
    // fixed-point cosines stay in [-1e9, 1e9]
    assert(d.values.forall(v => v >= -1000000000L && v <= 1000000000L))
  }

  test("the seed selection plans as TakeOrderedAndProject, k-row collect") {
    // the scale contract: no global sort, no corpus-sized collect —
    // the limit(k) over the hash order must compile to a bounded-heap
    // TakeOrderedAndProject (the same plan shape seedCentroidsK pins)
    val q = blobs
      .select(graft.functions.StableHash.hash60(col("vec_id")
          .cast("string")).as("__h"),
        col("vec_id"), col("embedding"))
      .orderBy(col("__h").asc, col("vec_id").asc)
      .limit(2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"seed selection lost its bounded-heap plan:\n$plan")
  }

  test("trained centroids serve the IVF index at least as well as seeds") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 10)
    def meanRecall(cents: org.apache.spark.sql.DataFrame): Double = {
      val assigned = Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
      val approx = Similarity.ivfTopK(assigned, cents, queries, "vec_id",
        "embedding", 10, nprobe = 4)
      Similarity.recallAudit(exact, approx)
        .agg(avg(col("recall"))).head().getDouble(0)
    }
    // same centroid count on both sides: seedCentroids every=50 yields
    // 10 seeds over the 500-vector fixture; train with k=10
    val seeded = meanRecall(
      Similarity.seedCentroids(emb, "vec_id", "embedding", every = 50))
    val trained = meanRecall(
      Similarity.kmeansTrainExact(emb, "vec_id", "embedding", 10, 2)
        .select(col("centroid_id"),
          expr("transform(cent_sum, x -> CAST(CAST(x AS DOUBLE) AS FLOAT))")
            .as("embedding")))
    info(f"recall@10 nprobe=4: seeded=$seeded%.3f trained=$trained%.3f")
    assert(trained >= seeded,
      s"training degraded index recall: $trained < $seeded")
  }

  test("trainCentroids is partitioning-invariant (decimal means)") {
    val df = blobs
    def run(parts: Int) =
      Similarity.trainCentroids(df.repartition(parts), "vec_id",
        "embedding", k = 2, iterations = 2)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toList))
        .sortBy(_._1).toList
    assert(run(1) == run(11))
  }
}
