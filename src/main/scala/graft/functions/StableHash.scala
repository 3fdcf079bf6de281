package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine (Spark <-> DuckDB oracle) hashing.
  *
  * The engine needs hashes that are *identical* in Spark and in the DuckDB
  * oracle SQL so that dedup / minhash / simhash operators can be verified
  * differentially. Spark's `hash`/`xxhash64` have no DuckDB twin, so we
  * derive a 60-bit integer from the md5 hex digest, which both engines
  * compute identically:
  *
  *   Spark :  cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)
  *   DuckDB:  ('0x' || substr(md5(x), 1, 15))::BIGINT
  *
  * 15 hex chars = 60 bits, always positive, no overflow in either engine.
  */
object StableHash {

  /** 60-bit stable hash of a string column (see object doc). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL fragment equivalent to [[hash60]]. */
  def hash60Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  /** Prime modulus > 2^32 used by the minhash permutation family.
    * Chosen so that a * (h % P) + b stays < 2^63 (no ANSI overflow):
    * a < 2^31, (h % P) < 2^33.
    */
  val MinhashPrime: Long = 4294967311L

  /** Fixed, public permutation parameters (a_i, b_i) for minhash.
    * Deterministic small odd multipliers / offsets; any fixed family works
    * as long as Spark and the oracle share it.
    */
  def minhashParams(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val a = 2L * i + 3L        // odd, coprime-ish with P (P is prime)
      val b = 104729L * (i + 1)  // 10000th prime spaced offsets
      (a, b)
    }

  /** i-th minhash permutation applied to a 60-bit hash column. */
  def minhashPerm(h: Column, a: Long, b: Long): Column =
    (lit(a) * (h % MinhashPrime) + lit(b)) % MinhashPrime

  /** DuckDB SQL for [[minhashPerm]] over a hash SQL fragment. */
  def minhashPermSql(hSql: String, a: Long, b: Long): String =
    s"(($a * ($hSql % ${MinhashPrime}) + $b) % ${MinhashPrime})"
}
