package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GramAgg, VectorOps}

/** Distributed PCA over an embedding corpus, exact where it must be.
  *
  * The classic scale problem: covariance of 100 TB of float vectors is a
  * sum of d×d outer products whose IEEE result depends on partition
  * order — not reproducible, not oracle-checkable. The engine's answer is
  * the same trick the quantized-ANN path uses (`VectorOps.quantizeInt8`),
  * lifted to a GLOBAL scale: one corpus-max aggregate fixes
  * `gscale = max|x|/127`, every vector quantizes to int8 codes, and
  * [[graft.functions.GramAgg]] accumulates `[n, Σq, Σq·qᵀ]` in exact
  * BIGINT arithmetic — bit-identical in any partition order and in the
  * DuckDB oracle. The float covariance appears only on the driver, as the
  * single rescale `gscale²·(G/n − s·sᵀ/n²)` of a bounded (d×d) model
  * artifact; eigenvectors come from deterministic power iteration with
  * deflation, and projection back over the corpus is a zero-exchange
  * codegen scan ([[graft.functions.FloatVectorDot]] against literal
  * component vectors).
  *
  * Pipeline shape at 100 TB: two corpus scans (max, gram — both
  * all-reduce to one row), driver-side d×d eigen, one projection scan.
  * Nothing vector-sized ever shuffles.
  */
object Pca {

  /** One-row frame with the corpus-global quantization scale. */
  def globalScale(df: DataFrame, vecCol: String): DataFrame =
    df.agg((max(array_max(transform(col(vecCol),
      x => abs(x.cast("double"))))) / 127.0).as("gscale"))

  /** Corpus rows with a globally-scaled int8 code column `q` appended.
    * The one-row scale frame broadcasts into a cross join — no driver
    * round trip in the plan.
    */
  def quantizeGlobal(df: DataFrame, vecCol: String): DataFrame =
    df.crossJoin(broadcast(globalScale(df, vecCol)))
      .withColumn("q", transform(col(vecCol), x =>
        when(col("gscale") === 0.0, lit(0.0))
          .otherwise(floor(x.cast("double") / col("gscale") + 0.5))
          .cast("int")))

  /** Exact integer moment rows of the globally-quantized corpus:
    * `(-1, -1, n)`, `(i, -1, Σq_i)` per dimension, and `(i, j, Σq_i·q_j)`
    * per upper-triangle pair — the full input to covariance, as a
    * hash-exact relational result.
    */
  def momentRows(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    // NULL vectors are excluded EXPLICITLY on both engines (the oracle
    // filters the same way): GramAgg.update already skips null arrays,
    // but leaving the scale max / oracle count(*) to disagree about them
    // would make hash parity depend on the dataset never containing one
    momentsOf(quantizeGlobal(df.filter(col(vecCol).isNotNull), vecCol),
      dim)
  }

  /** [[momentRows]] under a CALLER-SUPPLIED one-row scale frame — the
    * incremental-maintenance shape: the quantization scale is part of
    * the trained model (frozen, like IVF centroids or a PQ codebook),
    * and because the `[n, Σq, Σq·qᵀ]` moments are exact integer SUMS
    * under a fixed scale, per-slice moments ADD — `moments(old) ⊎
    * moments(batch) = moments(old ∪ batch)` bit-for-bit. The
    * `pca_incremental_moments` query proves it against the full-corpus
    * oracle.
    */
  def momentRowsWithScale(df: DataFrame, vecCol: String, dim: Int,
                          scale: DataFrame): DataFrame =
    momentsOf(
      df.filter(col(vecCol).isNotNull)
        .crossJoin(broadcast(scale))
        .withColumn("q", transform(col(vecCol), x =>
          when(col("gscale") === 0.0, lit(0.0))
            .otherwise(floor(x.cast("double") / col("gscale") + 0.5))
            .cast("int"))),
      dim)

  private def momentsOf(quantized: DataFrame, dim: Int): DataFrame = {
    val stats = quantized.agg(GramAgg.gram(col("q"), dim).as("st"))
    val (iIdx, jIdx) = momentIndex(dim)
    stats.select(posexplode(col("st")).as(Seq("pos", "s")))
      .select(
        element_at(typedlit(iIdx), col("pos") + 1).as("i"),
        element_at(typedlit(jIdx), col("pos") + 1).as("j"),
        col("s"))
  }

  /** (i, j) labels for each position of the GramAgg buffer layout. */
  private[operators] def momentIndex(dim: Int): (Seq[Int], Seq[Int]) = {
    val pairs = (-1, -1) +: (0 until dim).map(i => (i, -1)) ++:
      (for { i <- 0 until dim; j <- i until dim } yield (i, j))
    (pairs.map(_._1), pairs.map(_._2))
  }

  /** Driver-side covariance from the collected stats array + scale.
    * `stats` is the GramAgg layout; the result is the d×d symmetric
    * matrix `gscale²·(G/n − s·sᵀ/n²)`.
    */
  def covariance(stats: Array[Long], gscale: Double, dim: Int)
      : Array[Array[Double]] = {
    val n = stats(0).toDouble
    require(n > 0, "covariance of an empty corpus")
    val c = Array.ofDim[Double](dim, dim)
    val s2 = gscale * gscale
    var i = 0
    while (i < dim) {
      val base = 1 + dim + (i * (2 * dim - i + 1)) / 2 - i
      var j = i
      while (j < dim) {
        val g = stats(base + j).toDouble
        val v = s2 * (g / n -
          stats(1 + i).toDouble * stats(1 + j).toDouble / (n * n))
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    c
  }

  /** Collect the one-row gram stats + scale (a bounded model artifact,
    * like a trained vocab — the ONLY driver materialization in the PCA
    * path).
    */
  def gramStats(df: DataFrame, vecCol: String, dim: Int)
      : (Array[Long], Double) = {
    val row = quantizeGlobal(df.filter(col(vecCol).isNotNull), vecCol)
      .agg(GramAgg.gram(col("q"), dim).as("st"),
        first(col("gscale")).as("gscale"))
      .head()
    (row.getSeq[Long](0).toArray, row.getDouble(1))
  }

  /** Top-k eigenpairs of a symmetric matrix by power iteration with
    * deflation. Deterministic: each component iterates from TWO fixed
    * starts — a dense all-nonzero vector and the basis vector of the
    * largest diagonal entry — and keeps the larger Rayleigh quotient.
    * A single basis start can sit exactly on a fixed point orthogonal
    * to the dominant eigenvector (block-diagonal matrices with exact
    * zeros — precisely what the integer-exact moments produce on
    * structured data); the dense start breaks that symmetry, and the
    * basis start covers the dense start's own orthogonality corner.
    * Returns (eigenvalues desc, row-major eigenvectors).
    */
  def topComponents(cov: Array[Array[Double]], k: Int, iters: Int = 200)
      : (Array[Double], Array[Array[Double]]) = {
    val d = cov.length
    val a = cov.map(_.clone())
    val vals = new Array[Double](k)
    val vecs = Array.ofDim[Double](k, d)
    var c = 0
    while (c < k) {
      var start = 0
      var best = a(0)(0)
      var i = 1
      while (i < d) { if (a(i)(i) > best) { best = a(i)(i); start = i }; i += 1 }
      val basis = Array.tabulate(d)(i => if (i == start) 1.0 else 0.0)
      val dense = Array.tabulate(d)(i => 1.0 + i.toDouble / (d + 1))
      val (lb, vb) = powerIter(a, basis, iters)
      val (ld, vd) = powerIter(a, dense, iters)
      val (lambda, v) = if (ld > lb) (ld, vd) else (lb, vb)
      vals(c) = lambda
      vecs(c) = v
      i = 0
      while (i < d) {
        var j = 0
        while (j < d) { a(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      c += 1
    }
    (vals, vecs)
  }

  /** Fixed-iteration power method from a given start; returns the
    * Rayleigh quotient and the final unit vector.
    */
  private def powerIter(a: Array[Array[Double]], v0: Array[Double],
      iters: Int): (Double, Array[Double]) = {
    var v = {
      val n0 = math.sqrt(v0.map(x => x * x).sum)
      if (n0 == 0.0) v0 else v0.map(_ / n0)
    }
    var it = 0
    while (it < iters) {
      val w = mulSym(a, v)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      if (nrm == 0.0) it = iters
      else { v = w.map(_ / nrm); it += 1 }
    }
    val av = mulSym(a, v)
    (v.indices.map(i => v(i) * av(i)).sum, v)
  }

  private def mulSym(a: Array[Array[Double]], v: Array[Double])
      : Array[Double] = {
    val d = v.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += a(i)(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** Projection of an `array<float>` column onto literal components:
    * `array<double>` of length k, one codegen'd dot product per
    * component — a pure zero-exchange scan over the corpus.
    */
  def projectCol(vec: Column, components: Array[Array[Double]]): Column =
    array(components.map(comp =>
      VectorOps.dotF(vec, typedlit(comp.map(_.toFloat).toSeq))): _*)

  /** Whitening variant of the components: each eigenvector scaled by
    * `1/√λ`, so [[projectCol]] with the result yields unit-variance
    * coordinates (the usual preprocessing before cosine/euclidean ANN
    * when feature scales differ). Numerically-zero eigenvalues keep
    * their unscaled direction: deflation leaves null-axis residues that
    * are as often +1e-13 as -1e-13, and whitening a +ε axis would blow
    * rounding noise up by 1/√ε — so the guard is RELATIVE to the top
    * eigenvalue, not a sign test.
    */
  def whitenedComponents(vals: Array[Double], vecs: Array[Array[Double]])
      : Array[Array[Double]] = {
    val eps = if (vals.isEmpty) 0.0 else vals.max * 1e-10
    vals.zip(vecs).map { case (l, v) =>
      if (l > eps && eps > 0.0) v.map(_ / math.sqrt(l)) else v
    }
  }
}
