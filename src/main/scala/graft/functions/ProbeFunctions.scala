package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Zero-shuffle scalar twins of the dedup-probe primitives, built for
  * the `graft_*` SQL surface: a SQL-first user can fingerprint an
  * ingest batch and band-join it against a persisted signature /
  * fingerprint index entirely from `spark.sql(...)`, without touching
  * the DataFrame API. Each scalar is value-identical to its aggregate
  * sibling in [[graft.operators.Dedup]] (same StableHash primitives,
  * same band-key encoding), which the `sql_minhash_probe` /
  * `sql_simhash_probe` oracle queries prove by hash-equality against
  * the same DuckDB oracles as the DataFrame probes.
  *
  * Scale note: these are per-row expressions over the document's OWN
  * token/shingle array — array higher-order functions, fully
  * codegen'd, no exchange. The aggregate siblings exist because a
  * whole-corpus signature build wants map-side partial aggregation
  * over exploded shingles; a batch probe is happy computing each doc's
  * signature in place.
  */
object ProbeFunctions {

  /** Per-row minhash signature array — the scalar twin of
    * [[graft.operators.Dedup.minhashSignatures]] (identical values
    * doc-for-doc): `array_min` over the permuted distinct-shingle
    * hashes, one entry per permutation. A doc with no shingles yields
    * null entries (the aggregate twin simply emits no row — filter
    * empty docs before probing).
    */
  def minhashSigs(text: Column, k: Int, numHashes: Int): Column = {
    val hs = transform(
      array_distinct(TextShingles.wordShingles(text, k)),
      g => StableHash.hash60(g))
    array(StableHash.minhashParams(numHashes).map { case (a, b) =>
      array_min(transform(hs, h => StableHash.minhashPerm(h, a, b)))
    }: _*)
  }

  /** LSH band keys of a signature array — the '_'-joined
    * `rowsPerBand`-run encoding of [[graft.operators.Dedup]]'s band
    * keys, so a SQL probe joins against a stored `sig_0..sig_{n-1}`
    * index banded identically (`array(sig_0, ..)` on the stored side).
    */
  def minhashBands(sigs: Column, numHashes: Int,
                   rowsPerBand: Int): Column = {
    require(rowsPerBand > 0 && numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a positive multiple of " +
        s"rowsPerBand ($rowsPerBand)")
    array((0 until numHashes / rowsPerBand).map { b =>
      concat_ws("_", (0 until rowsPerBand).map(r =>
        element_at(sigs, b * rowsPerBand + r + 1)): _*)
    }: _*)
  }

  /** Per-row simhash — the scalar twin of
    * [[graft.operators.Dedup.simhash]] (identical values): signed
    * bit-sums over the distinct lowercased whitespace tokens' hashes.
    */
  def simhashScalar(text: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 64, s"bits ($bits) must be in [1, 64]")
    val hs = transform(
      array_distinct(split(trim(lower(text)), "\\s+")),
      w => StableHash.hash60(w))
    (0 until bits).map { b =>
      val bs = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L))
      when(bs > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Banded Hamming keys of a fingerprint — the `band_no` +
    * band-value encoding of
    * [[graft.operators.Dedup.hammingNearDupsAgainst]]'s band join.
    */
  def hammingBands(fp: Column, bits: Int, bandBits: Int): Column = {
    require(bandBits > 0 && bandBits < 64 &&
        bits % bandBits == 0 && bits > 0 && bits <= 64,
      s"bits ($bits) must be a positive multiple of bandBits " +
        s"($bandBits in [1, 63]), at most 64")
    val mask = (1L << bandBits) - 1
    array((0 until bits / bandBits).map(b =>
      concat_ws("_", lit(b),
        shiftright(fp, b * bandBits).bitwiseAND(mask))): _*)
  }
}
