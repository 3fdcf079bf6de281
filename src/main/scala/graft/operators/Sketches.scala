package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.MinKDistinct

/** Deterministic cardinality sketches for corpus audits.
  *
  * `approx_count_distinct` (HyperLogLog++) is the usual answer to
  * "how many distinct tokens/n-grams in 100 TB", but its sketches are
  * engine-specific: estimates differ between Spark and any other system,
  * between versions, and cannot be oracle-checked. KMV over
  * [[graft.functions.StableHash]] trades a little precision
  * (~1/sqrt(k) relative error) for full determinism — the same corpus
  * yields the same estimate everywhere, which is what dataset cards and
  * regression audits need.
  */
object Sketches {

  /** 2^60, the StableHash range, exactly representable as a double. */
  val HashRange: Double = 1152921504606846976.0

  /** Per-group distinct-cardinality estimate of a hashed long column:
    * `(group, kmv_size, est_distinct)` where `est_distinct` is exact
    * (= the sketch size) when the group has fewer than k distinct
    * values, else the KMV estimator `(k-1) * range / h_(k)`.
    *
    * One exchange of <= k longs per group (ObjectHashAggregate map-side
    * partial) — never the distinct set, unlike `count(DISTINCT x)`.
    */
  /** The KMV estimator over a [[MinKDistinct]] sketch column: exact
    * (= the sketch size) when the group holds fewer than k distinct
    * values, else `(k-1) * range / h_(k)`. Shared by [[kmvDistinct]]
    * and [[Profiling.columnProfileSketch]] so the formula cannot drift.
    */
  def kmvEstimate(mins: Column, k: Int): Column =
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashRange) /
        element_at(mins, k).cast("double"))

  def kmvDistinct(df: DataFrame, groupCol: String, hash: Column, k: Int)
      : DataFrame = {
    require(k > 1, s"kmv k ($k) must be > 1")
    df.groupBy(col(groupCol))
      .agg(MinKDistinct.minK(hash, k).as("__mins"))
      .select(col(groupCol),
        size(col("__mins")).as("kmv_size"),
        kmvEstimate(col("__mins"), k).as("est_distinct"))
  }

  /** Deterministic discrete quantiles over a hash sample:
    * `(p, n_sample, value)` per requested probability, where `value` is
    * the element at rank `max(1, ceil(p * n))` of the sample ordered by
    * `(value, key)`.
    *
    * Scale design: t-digest/`approx_percentile` sketches are
    * engine-specific and merge-order sensitive; this uses the other
    * standard trick — a DETERMINISTIC hash sample (same
    * [[Sampling.bucket]] membership everywhere, stable under corpus
    * growth) followed by EXACT rank selection on the sample. The global
    * rank is computed DISTRIBUTED: range-partition on the sort key,
    * rank within each partition, add per-partition offsets (a
    * bounded-by-#partitions frame) — no single-reducer window anywhere,
    * so even a generous sample never funnels through one task. The rank
    * a row gets is its position in the total order, independent of
    * where the sampled range boundaries land ((value, key) is unique),
    * so results are partitioning-deterministic. Quantile precision is
    * the sample's, ~1/sqrt(n_sample).
    */
  def hashSampleQuantiles(df: DataFrame, keyCol: String, value: Column,
                          sampleFrac: Double, probs: Seq[Double])
      : DataFrame = {
    require(sampleFrac > 0 && sampleFrac <= 1,
      s"sampleFrac ($sampleFrac) must be in (0, 1]")
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val t = math.round(sampleFrac * Sampling.Buckets)
    val sample = df.filter(Sampling.bucket(col(keyCol)) < t)
      .select(col(keyCol).as("__k"), value.as("value"))
    val parts = sample
      .repartitionByRange(col("value"), col("__k"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local_rn", row_number().over(
        Window.partitionBy(col("__pid"))
          .orderBy(col("value"), col("__k"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition counts -> exclusive prefix offsets, computed on the
    // PACKED #partitions-row frame (array_sort + slice/aggregate prefix
    // sums): bounded by partition count AND window-free — no
    // partition-less WindowExec anywhere, per the registry plan lint
    val offsets = parts.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"))
      .agg(array_sort(collect_list(struct(col("__pid"), col("__c"))))
        .as("__a"))
      .select(col("__a"), posexplode(col("__a")).as(Seq("__i", "__e")))
      .select(col("__e.__pid").as("__pid"), col("__e.__c").as("__c"),
        aggregate(slice(col("__a"), lit(1), col("__i")), lit(0L),
          (acc, x) => acc + x.getField("__c")).as("__off"))
    val total = offsets.agg(sum(col("__c")).as("n_sample"))
    import df.sparkSession.implicits._
    val ps = probs.toDF("p")
    val out = parts
      .join(broadcast(offsets.select(col("__pid"), col("__off"))),
        "__pid")
      .withColumn("__rn", col("__local_rn") + col("__off"))
      .crossJoin(broadcast(total))
      .join(ps, col("__rn") ===
        greatest(lit(1L), ceil(col("p") * col("n_sample")).cast("long")))
      .select(col("p"), col("n_sample"), col("value"))
    graft.operators.Dedup.releaseAfter(out, parts)
  }

  /** Frequency estimate of a hashed key against a [[graft.functions.CountMin]]
    * sketch column: `min_i sketch[i*w + perm_i(h) mod w]` — pure
    * built-in expressions (element_at + least), codegen'd per row.
    * Upper-bounds the true count; error ~ N/w with probability
    * 1 - 2^-d.
    */
  def cmsEstimate(sketch: Column, h: Column, d: Int, w: Int): Column = {
    import graft.functions.StableHash
    // pmod at BOTH reduction steps mirrors CountMin.update's floorMod:
    // with a signed % a negative hash would land in a different (or,
    // via element_at's negative indexing, a silently wrong) bucket
    val hm = pmod(h, lit(StableHash.MinhashPrime))
    val terms = StableHash.minhashParams(d).zipWithIndex.map {
      case ((a, b), i) =>
        val perm = (lit(a) * hm + lit(b)) % StableHash.MinhashPrime
        element_at(sketch,
          (lit(i.toLong * w) + perm % w + 1L).cast("int"))
    }
    least(terms: _*)
  }

  /** Bloom-filter membership probe against a [[graft.functions.BloomBits]]
    * sketch: true iff ALL k probe bits are set — definite-miss rows can
    * be discarded before an expensive index join (no false negatives;
    * false positives pass through to the exact check). Pure built-in
    * expressions mirroring BloomBits.update's arithmetic.
    */
  def bloomMightContain(sketch: Column, h: Column, k: Int, m: Int)
      : Column = {
    import graft.functions.StableHash
    val hm = pmod(h, lit(StableHash.MinhashPrime))
    StableHash.minhashParams(k).map { case (a, b) =>
      val perm = (lit(a) * hm + lit(b)) % StableHash.MinhashPrime
      element_at(sketch, (perm % m + 1L).cast("int")) === 1L
    }.reduce(_ && _)
  }

  /** Deterministic quantile-bucket assignment — the curriculum /
    * length-binning step: every row learns which inter-quantile bucket
    * its `value` falls into (`bucket` = number of thresholds strictly
    * below the value, 0..|probs|). Thresholds come from
    * [[hashSampleQuantiles]], so membership is reproducible and stable
    * under corpus growth. Emits `(key, value, bucket)`.
    *
    * Scale shape: the |probs| thresholds collapse to ONE array row that
    * broadcasts into the corpus scan (catalyst folds the constant join
    * key into a single-row broadcast nested loop — one broadcast, zero
    * corpus shuffle); the bucket is a codegen'd array filter per row.
    */
  def quantileBuckets(df: DataFrame, keyCol: String, value: Column,
                      sampleFrac: Double, probs: Seq[Double]): DataFrame = {
    val th = hashSampleQuantiles(df, keyCol, value, sampleFrac, probs)
      .agg(sort_array(collect_list(col("value"))).as("__ths"))
      .withColumn("__k", lit(1))
    // an empty/undersized hash sample (tiny df x small sampleFrac)
    // yields fewer thresholds than probs — every row would silently
    // land in bucket 0 looking like a clean run; fail loudly instead
    val checked = when(size(col("__ths")) === probs.size, col("__ths"))
      .otherwise(raise_error(concat(
        lit(s"quantileBuckets: hash sample produced "),
        size(col("__ths")).cast("string"),
        lit(s" of ${probs.size} thresholds — raise sampleFrac"))))
    df.select(col(keyCol), value.as("value"))
      .withColumn("__k", lit(1))
      .join(broadcast(th), Seq("__k"))
      .select(col(keyCol), col("value"),
        size(filter(checked, t => col("value") > t)).as("bucket"))
  }
}
