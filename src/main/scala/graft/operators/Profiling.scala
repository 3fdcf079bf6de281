package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Per-column data profiling — the "dataset card" for an arbitrary table:
  * row counts, null counts, distinct cardinality and min/max per column.
  *
  * The reference ships per-table row/size statistics in its sync status
  * output (`/root/reference/pipelinewise/cli/pipelinewise.py` status
  * command); production data pipelines extend that to per-column quality
  * profiles (null rates, cardinalities, value ranges) that drive schema
  * checks and partition-key choices. Two formulations:
  *
  *  - [[columnProfile]] — EXACT. One scan; the multi-column
  *    `count(distinct)` plans as a single Expand (rows x |cols|) feeding
  *    one partial-aggregate pass. That is the standard exact shape and is
  *    fine on dimension-sized tables, but the Expand multiplies the scan
  *    by the column count — do not point it at a 100 TB fact table.
  *  - [[columnProfileSketch]] — the 100 TB path: distinct cardinality via
  *    the deterministic KMV sketch ([[graft.functions.MinKDistinct]]), one
  *    scan, NO Expand, bounded (<= 8k x |cols|) aggregate state; null
  *    counts and min/max ride the same single aggregate.
  */
object Profiling {

  /** Exact profile of `cols`: one output row per column —
    * `(col_name, n_rows, n_nonnull, n_distinct, min_value, max_value)`
    * with min/max rendered as strings so heterogeneous column types share
    * one schema. Nulls are excluded from distinct counts (SQL semantics).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    // unpivot the single wide row into one row per column: stack() keeps
    // this a local projection over the 1-row aggregate result
    val stackArgs: Seq[Column] = cols.flatMap { c =>
      Seq(lit(c), col(s"__nn_$c"), col(s"__nd_$c"),
        col(s"__mn_$c"), col(s"__mx_$c"))
    }
    one.select(col("__n_rows"),
        stack((lit(cols.size) +: stackArgs): _*)
          .as(Seq("col_name", "n_nonnull", "n_distinct",
            "min_value", "max_value")))
      .select(col("col_name"), col("__n_rows").as("n_rows"),
        col("n_nonnull"), col("n_distinct"), col("min_value"),
        col("max_value"))
  }

  /** Sketched profile: distinct cardinality is the deterministic KMV
    * estimate over [[graft.functions.StableHash]] of the column value —
    * single pass, no Expand, state bounded by `k` longs per column.
    * `(col_name, n_rows, n_nonnull, est_distinct)`.
    */
  def columnProfileSketch(df: DataFrame, cols: Seq[String], k: Int = 1024)
      : DataFrame = {
    require(cols.nonEmpty, "columnProfileSketch needs at least one column")
    require(k > 1, s"kmv k ($k) must be > 1")
    import graft.functions.{MinKDistinct, StableHash}
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        MinKDistinct.minK(
          StableHash.hash60(col(c).cast("string")), k).as(s"__mins_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
      .select(col("__n_rows") +: cols.flatMap { c =>
        Seq(col(s"__nn_$c"),
          Sketches.kmvEstimate(col(s"__mins_$c"), k).as(s"__nd_$c"))
      }: _*)
    val stackArgs: Seq[Column] = cols.flatMap { c =>
      Seq(lit(c), col(s"__nn_$c"), col(s"__nd_$c"))
    }
    one.select(col("__n_rows"),
        stack((lit(cols.size) +: stackArgs): _*)
          .as(Seq("col_name", "n_nonnull", "est_distinct")))
      .select(col("col_name"), col("__n_rows").as("n_rows"),
        col("n_nonnull"), col("est_distinct"))
  }

  /** Exact-reproducible Pearson correlation matrix over 2-decimal numeric
    * columns — the cross-column half of the dataset card (which measures
    * drive the same variance; what a partition/sort key correlates with).
    * Spark's built-in `corr` accumulates in floating point, so its result
    * depends on partitioning; here every sum (Σx, Σxy, Σx²) is an exact
    * DECIMAL(38,4) aggregate (order-insensitive), and only the final
    * combination — `(n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²))` —
    * runs in fixed-order IEEE double arithmetic, identical in any engine
    * at any parallelism.
    *
    * Scale shape: ONE scan, one single-row aggregate carrying
    * |cols| + |cols|·(|cols|+1)/2 exact sums (map-side combinable); the
    * pair unpivot is a local projection over that one row. Emits
    * `(col_x, col_y, corr)` for each unordered pair.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    // 2-decimal values scale to EXACT integers (×100, decimal(18,0)):
    // the cancellation-prone `n·Σxy − Σx·Σy` terms then evaluate in
    // exact integer-decimal arithmetic. This matters cross-engine: as a
    // DOUBLE expression `a*b - c*d` is FMA-eligible, and an engine that
    // contracts it (DuckDB does) lands 1 ulp away from one that doesn't
    // (the JVM) — caught by the sf0.1 differential. Only the final
    // divide/sqrt run in IEEE doubles, and those have no fusable form.
    // Width budget (the cast widths ARE the budget — no silent cliff
    // inside it): n ≤ 10¹⁰ rows, scaled sums ≤ 10¹⁹, scaled second
    // moments ≤ 10²⁸ (so n·p and s·s both stay within 38 digits; DuckDB
    // rejects wider multiplies at bind time, keeping both engines
    // honest). Shard the profile per partition and combine if a corpus
    // outgrows it.
    def d100(c: String) =
      (col(c).cast("decimal(18,2)") * 100).cast("decimal(18,0)")
    val pairs = for { i <- cols.indices; j <- i until cols.size }
      yield (i, j)
    // budget overruns fail LOUDLY: the narrowing casts below document
    // the width budget, but a non-ANSI cast past it returns NULL — a
    // silent NULL corr is indistinguishable from the legitimate
    // nullable-column case, so each narrowing is guarded by an explicit
    // bound check (and a null-sum-with-nonnull-inputs check, catching an
    // overflow INSIDE the 38-digit accumulator) that raises instead
    def budgeted(s: Column, nonNullCnt: Column, digits: Int,
                 what: String): Column = {
      val bound = lit(BigDecimal(10).pow(digits))
      when(s.isNull && nonNullCnt > 0L, raise_error(lit(
          s"correlation width budget exceeded: $what sum overflowed " +
            "the decimal accumulator — shard the profile and combine")))
        .when(abs(s) >= bound, raise_error(lit(
          s"correlation width budget exceeded: |$what sum| >= 1e$digits " +
            "— shard the profile and combine")))
        .otherwise(s.cast(s"decimal($digits,0)"))
    }
    val aggs = cols.map(c =>
      budgeted(sum(d100(c)), count(d100(c)), 19, s"Σ$c").as(s"__s_$c")) ++
      pairs.map { case (i, j) =>
        val prod = d100(cols(i)) * d100(cols(j))
        budgeted(sum(prod), count(prod), 28,
          s"Σ${cols(i)}·${cols(j)}").as(s"__p_${i}_$j") } ++
      // per-column null counts: sums skip NULLs while n counts all rows,
      // so a nullable column would yield mismatched moments — a WRONG
      // Pearson value, not an imprecise one. Emitting NULL is honest.
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))
        .as(s"__nn_$c"))
    val nGuarded = when(count(lit(1)) >= 10000000000L, raise_error(lit(
        "correlation width budget exceeded: n >= 1e10 rows — shard " +
          "the profile and combine")))
      .otherwise(count(lit(1)).cast("decimal(10,0)"))
    val one = df.agg(nGuarded.as("__n"), aggs: _*)
    val rows = for { i <- cols.indices; j <- i + 1 until cols.size }
      yield {
        val sx = col(s"__s_${cols(i)}")
        val sy = col(s"__s_${cols(j)}")
        // exact integer variance/covariance terms (the ×100² scale
        // factors cancel between numerator and denominator)
        def v(p: Column, a: Column, b: Column) =
          (col("__n") * p - a * b).cast("double")
        val num = v(col(s"__p_${i}_$j"), sx, sy)
        val vx = v(col(s"__p_${i}_$i"), sx, sx)
        val vy = v(col(s"__p_${j}_$j"), sy, sy)
        val corr = when(col(s"__nn_${cols(i)}") > 0 ||
            col(s"__nn_${cols(j)}") > 0,
            lit(null).cast("double"))
          .otherwise(num / (sqrt(vx) * sqrt(vy)))
        struct(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
          corr.as("corr"))
      }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_x").as("col_x"), col("r.col_y").as("col_y"),
        col("r.corr").as("corr"))
  }
}
