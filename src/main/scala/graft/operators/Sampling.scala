package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * At 100 TB, RNG-based sampling (`df.sample`) is the wrong tool for
  * corpus prep: membership changes across runs, partitionings, and Spark
  * versions, so train/test contamination can't be audited. Hash-based
  * assignment is reproducible everywhere (the same [[StableHash]] the
  * dedup family uses — md5-derived, identical in DuckDB, so every split
  * is oracle-checkable), stable under corpus growth (a document's split
  * never changes when other documents arrive), and embarrassingly
  * parallel (a codegen'd projection; no shuffle, no state).
  *
  * The reference has no sampling surface (replication engine); these are
  * engine-level operators for the training-data north star.
  */
object Sampling {

  /** Granularity of the hash bucket space. 10k buckets = 0.01%
    * resolution, plenty for split fractions while keeping the modulus
    * exact in both engines' integer arithmetic.
    */
  val Buckets = 10000L

  /** Hash bucket in [0, Buckets) for a key column. The key goes through
    * an explicit string cast so numeric keys hash their decimal text in
    * BOTH engines (Spark's binary cast of a long is its 8-byte encoding,
    * which DuckDB's md5-of-varchar would never see).
    */
  def bucket(key: Column): Column =
    pmod(StableHash.hash60(key.cast("string")), lit(Buckets))

  /** DuckDB fragment equivalent to [[bucket]] (hash60 is non-negative,
    * so plain % matches pmod).
    */
  def bucketSql(expr: String): String =
    s"(${StableHash.hash60Sql(s"CAST($expr AS VARCHAR)")} % ${Buckets})"

  /** Assign each row to a named split by hash range — e.g.
    * `Seq("train" -> 0.98, "valid" -> 0.01, "test" -> 0.01)`. Fractions
    * must sum to 1 (± one bucket of rounding; the last split absorbs the
    * remainder). Adds a `split` column.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Buckets)
    }.tail
    val b = bucket(col(keyCol))
    val expr = splits.init.zip(bounds.init).reverse.foldLeft(
      lit(splits.last._1): Column) { case (rest, ((name, _), hi)) =>
      when(b < hi, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Keep a per-stratum fraction of rows, deterministically: a row
    * survives iff its key bucket falls below `fraction(stratum) *
    * Buckets`. Unlisted strata default to `defaultFraction`.
    */
  def stratifiedSampleByHash(df: DataFrame, keyCol: String,
                             strataCol: String,
                             fractions: Map[String, Double],
                             defaultFraction: Double = 0.0): DataFrame = {
    val b = bucket(col(keyCol))
    val threshold = fractions.foldLeft(
      lit(math.round(defaultFraction * Buckets)): Column) {
      case (rest, (stratum, f)) =>
        when(col(strataCol) === stratum,
          lit(math.round(f * Buckets))).otherwise(rest)
    }
    df.filter(b < threshold)
  }
}
