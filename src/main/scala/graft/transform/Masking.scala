package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spec.{TransformCondition, Transformation}

/** Masking/obfuscation transformation compiler.
  *
  * The reference applies these row-at-a-time in Python
  * (transform-field/transform_field/transform.py:147-196) or compiles them
  * to warehouse SQL for FastSync post-load UPDATEs
  * (pipelinewise/fastsync/commons/transform_utils.py). Here the whole
  * transformation config compiles to a chain of pure Catalyst `Column`
  * expressions — `when(cond, mask).otherwise(col)` — which stays inside
  * whole-stage codegen: zero UDFs, fully distributed, and the masking runs
  * at scan speed even at 100 TB.
  */
object Masking {

  private val HashSkipFirst = "HASH-SKIP-FIRST-([1-9])".r
  private val MaskStringSkipEnds = "MASK-STRING-SKIP-ENDS-([1-9])".r

  /** The masked value for a column (unconditional part). */
  def maskExpr(transformType: String, c: Column): Column = transformType match {
    case "SET-NULL" => lit(null).cast("string")
    case "HASH" => sha2(c.cast("string"), 256)
    case HashSkipFirst(n) =>
      val k = n.toInt
      // keep first k chars, sha256 the rest (transform.py:166-168)
      concat(substring(c.cast("string"), 1, k),
        sha2(c.cast("string").substr(lit(k + 1), length(c.cast("string"))), 256))
    case "MASK-DATE" =>
      // keep year + time-of-day, force month/day to 1 (transform.py:171-172)
      make_timestamp(year(c), lit(1), lit(1), hour(c), minute(c),
        second(c).cast("decimal(8,6)"))
    case "MASK-NUMBER" => lit(0).cast("long")
    case "MASK-HIDDEN" => lit("hidden")
    case MaskStringSkipEnds(n) =>
      val k = n.toInt
      val s = c.cast("string")
      // if len > 2k: keep both ends, star the middle (len-2k stars);
      // else star the whole value (transform.py:184-188)
      when(length(s) > 2 * k,
        concat(substring(s, 1, k), repeat(lit("*"), (length(s) - 2 * k)),
          s.substr(length(s) - k + 1, lit(k))))
        .otherwise(repeat(lit("*"), length(s)))
    case other =>
      throw new IllegalArgumentException(s"unknown transformation: $other")
  }

  /** ANDed conditional guards (transform.py:12-103 / transform_utils.py:146-222). */
  def conditionExpr(conds: Seq[TransformCondition]): Column =
    conds.map { tc =>
      val c = col(tc.column)
      (tc.equals, tc.regexMatch) match {
        case (Some(v), _) => c.cast("string") === lit(v)
        case (_, Some(p)) => c.cast("string").rlike(p)
        case _ => lit(true)
      }
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** Apply one transformation to a DataFrame column, preserving the
    * original value where the condition does not hold.
    */
  def apply(df: DataFrame, t: Transformation): DataFrame = {
    val c = col(t.fieldId)
    val masked = maskExpr(t.transformType, c)
    val out =
      if (t.conditions.isEmpty) masked
      else when(conditionExpr(t.conditions), masked).otherwise(c)
    df.withColumn(t.fieldId, out)
  }

  /** Apply a whole transformation config (one stream). */
  def applyAll(df: DataFrame, ts: Seq[Transformation]): DataFrame =
    ts.foldLeft(df)(apply)

  /** Nested application via `field_paths` (transform.py:106-144: dpath
    * selectors into JSON documents). Spark-native: the document is a
    * struct column and each path maskes the leaf in place via
    * `withField`, leaving siblings untouched.
    */
  def applyNested(df: DataFrame, t: Transformation): DataFrame = {
    require(t.fieldPaths.nonEmpty, "applyNested requires field_paths")
    val root = col(t.fieldId)
    val masked = t.fieldPaths.foldLeft(root) { (acc, path) =>
      val dotted = path.replace('/', '.')
      val leaf = col(s"${t.fieldId}.$dotted")
      val m = maskExpr(t.transformType, leaf)
      val guarded =
        if (t.conditions.isEmpty) m
        else when(conditionExpr(t.conditions), m).otherwise(leaf)
      acc.withField(dotted, guarded)
    }
    df.withColumn(t.fieldId, masked)
  }
}
