package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableHash._

/** Document deduplication operators for training-data pipelines.
  *
  * All hashing uses [[graft.functions.StableHash]] so every operator has a
  * bit-identical DuckDB oracle. Scale notes per operator inline — the
  * design constraint is 100 TB of documents on a 1000-executor cluster:
  * never materialize O(n^2) pairs; always go through an inverted index
  * (explode -> shuffle on the index key -> pair join within buckets).
  */
object Dedup {

  /** Exact dedup by content hash: one shuffle on the 60-bit text hash,
    * keep the smallest id per group. At 100 TB this is a single
    * hash-partitioned aggregation — the optimal plan.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(hash60(col(textCol)).as("text_hash"), col(idCol))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word shingles (k-grams) of a text column as array<string>.
    * Lowercased, whitespace-tokenized.
    */
  def shingles(text: Column, k: Int): Column = {
    val words = split(trim(lower(text)), "\\s+")
    filter(
      transform(words, (_, i) =>
        when(i <= size(words) - k,
          concat_ws(" ", slice(words, i + 1, lit(k))))),
      c => c.isNotNull)
  }

  /** MinHash signatures: explode distinct shingles, one shuffle to
    * aggregate `min((a_i*h + b_i) mod P)` per doc for each of `numHashes`
    * permutations — map-side partial aggregation keeps the shuffle small
    * regardless of document size. Output: (id, sig_0..sig_{n-1}).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, numHashes: Int = 12): DataFrame = {
    val sh = docs.select(col(idCol),
        explode(array_distinct(shingles(col(textCol), k))).as("shingle"))
      .withColumn("h", hash60(col("shingle")))
    val aggs = minhashParams(numHashes).zipWithIndex.map {
      case ((a, b), i) => min(minhashPerm(col("h"), a, b)).as(s"sig_$i")
    }
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH near-dup candidate pairs: band the signature (bands of
    * `rowsPerBand`), self-join docs sharing a band bucket, then verify with
    * exact signature agreement fraction >= `threshold`.
    *
    * The band join is the scale path: candidates are generated per-bucket
    * (shuffle on band hash), never as a global cross join.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, numHashes: Int = 12, rowsPerBand: Int = 3,
                      threshold: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, k, numHashes)
    val numBands = numHashes / rowsPerBand
    val sigCols = (0 until numHashes).map(i => col(s"sig_$i"))
    val banded = sigs.select(col(idCol) +: (0 until numBands).map { b =>
      concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*)
        .as(s"band_$b")
    }: _*)
    val pairsPerBand = (0 until numBands).map { b =>
      val l = banded.select(col(idCol).as("id_a"), col(s"band_$b").as("bk"))
      val r = banded.select(col(idCol).as("id_b"), col(s"band_$b").as("bk"))
      l.join(r, Seq("bk")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    }
    val candidates = pairsPerBand.reduce(_ union _).distinct()
    val a = sigs.toDF(sigs.columns.map(c => s"a_$c"): _*)
    val b = sigs.toDF(sigs.columns.map(c => s"b_$c"): _*)
    val agree = (0 until numHashes).map(i =>
      when(col(s"a_sig_$i") === col(s"b_sig_$i"), 1).otherwise(0))
      .reduce(_ + _)
    candidates
      .join(a, col("id_a") === col(s"a_$idCol"))
      .join(b, col("id_b") === col(s"b_$idCol"))
      .withColumn("sig_agreement", agree.cast("double") / numHashes)
      .filter(col("sig_agreement") >= threshold)
      .select(col("id_a"), col("id_b"), col("sig_agreement"))
  }

  /** SimHash: 32-bit locality-sensitive fingerprint from word hashes.
    * For each bit b, sum +1/-1 over words by bit b of the word hash; the
    * sign gives the fingerprint bit. One explode + one aggregation — same
    * scale shape as minhash.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 32): DataFrame = {
    val words = docs.select(col(idCol),
      explode(array_distinct(split(trim(lower(col(textCol))), "\\s+")))
        .as("w"))
      .withColumn("h", hash60(col("w")))
    val bitSums = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"bs_$b")
    }
    val summed = words.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until bits).map { b =>
      when(col(s"bs_$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    summed.select(col(idCol), fp.as("simhash"))
  }

  /** SimHash near-dup pairs: candidates via byte-band buckets (any shared
    * 8-bit band of the fingerprint), verified by Hamming distance <=
    * `maxHamming`. Bucketed join, not cross join.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      bits: Int = 32, maxHamming: Int = 3): DataFrame = {
    val fps = simhash(docs, idCol, textCol, bits)
    val nBands = bits / 8
    val banded = fps.select(col(idCol), col("simhash"),
      posexplode(array((0 until nBands).map(b =>
        concat_ws("_", lit(b),
          shiftright(col("simhash"), b * 8).bitwiseAND(255))): _*))
        .as(Seq("band_no", "bk")))
    val l = banded.select(col(idCol).as("id_a"), col("simhash").as("fp_a"),
      col("bk"))
    val r = banded.select(col(idCol).as("id_b"), col("simhash").as("fp_b"),
      col("bk"))
    l.join(r, Seq("bk")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard near-dup pairs via inverted index: explode distinct
    * n-grams, join postings on the n-gram (bucketed shuffle), count
    * intersections per pair, and compute |A∩B| / (|A|+|B|-|A∩B|).
    * `minIntersection` prunes the long tail of 1-shingle matches before
    * the pair aggregation (a crucial reducer of shuffle volume at scale).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
      explode(array_distinct(shingles(col(textCol), k))).as("g"))
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val l = grams.select(col("id").as("id_a"), col("g"))
    val r = grams.select(col("id").as("id_b"), col("g"))
    val inter = l.join(r, Seq("g")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
