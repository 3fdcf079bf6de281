package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the standard 16–32× memory path for
  * billion-scale ANN (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): split each `dim` vector into `m`
  * subvectors of `dim/m`, quantize each against a per-subspace codebook
  * of `ksub` centroids, and search with asymmetric distance computation
  * (ADC) — the query stays full-precision, corpus items are looked up by
  * their m byte-ish codes.
  *
  * The codebook here is a bounded model artifact (like the IVF centroids
  * and the tokenizer vocab): `ksub` full sampled vectors, `ksub × dim`
  * doubles — a few KB riding each expression into the executors, never a
  * data-sized broadcast. Training uses the deterministic seeded-hash
  * sample ([[StableHash.hash60]]-smallest vectors), so a SQL oracle can
  * replay codebook choice, encoding, and ADC ranking EXACTLY — k-means
  * refinement would drop in without changing any of these expressions
  * (the codebook is a parameter, not a contract).
  *
  * Exactness: all distance arithmetic is IEEE double with a FIXED
  * summation order (t ascending within a subspace, j ascending across
  * subspaces), so both engines produce bit-identical distances and the
  * (dist asc, id asc) ranking never diverges.
  *
  * Scale: encode is a zero-exchange projection (O(dim·ksub) per row);
  * ADC scoring is O(m) per candidate via the per-query LUT — 16× fewer
  * FLOPs than a full dot product at m = dim/16 — and the LUT
  * (m·ksub doubles) is computed once per query and rides the broadcast
  * query panel. Corpus codes are `m` small ints (array<int> here;
  * byte-packable at rest), the 100 TB memory story.
  */
object PqOps {

  /** `vecs` = the ksub sampled codebook vectors (full length `dim`);
    * subspace j's centroid r is `vecs(r).slice(j*dsub, (j+1)*dsub)` —
    * kept unsliced so one array serves every subspace.
    *
    * The codebook and every encoded/queried vector are L2-NORMALIZED
    * inside the kernel: the exact baseline ranks by cosine, and on the
    * unit sphere L2 and cosine orderings coincide (‖q−c‖² = 2−2cosθ) —
    * without this, PQ-L2 ranks by magnitude and recall vs a cosine
    * baseline collapses (measured: 0.09 unnormalized). Normalization is
    * plain IEEE double division after a fixed-order sum of squares, so
    * the oracle replays it exactly.
    */
  final case class PqCodebook(m: Int, dsub: Int, vecs: Array[Array[Double]])
      extends Serializable {
    require(m > 0 && dsub > 0 && vecs.nonEmpty, "empty PQ codebook")
    require(vecs.forall(_.length == m * dsub),
      s"codebook vectors must have dim ${m * dsub}")
    val ksub: Int = vecs.length
    def dim: Int = m * dsub

    private val unitVecs: Array[Array[Double]] = vecs.map(normalized)

    private def normalized(v: Array[Double]): Array[Double] = {
      var s = 0.0
      var t = 0
      while (t < v.length) { s += v(t) * v(t); t += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) v.clone()
      else {
        val out = new Array[Double](v.length)
        t = 0
        while (t < v.length) { out(t) = v(t) / n; t += 1 }
        out
      }
    }

    private def unitOf(v: ArrayData): Array[Double] = {
      val d = v.numElements
      val out = new Array[Double](d)
      var s = 0.0
      var t = 0
      while (t < d) {
        val x = v.getFloat(t).toDouble
        out(t) = x
        s += x * x
        t += 1
      }
      val n = math.sqrt(s)
      if (n != 0.0) { t = 0; while (t < d) { out(t) /= n; t += 1 } }
      out
    }

    /** m codes (argmin-L2² per subspace on the unit sphere, ties to the
      * lowest code).
      */
    def encode(v: ArrayData): GenericArrayData = {
      val u = unitOf(v)
      val out = new Array[Any](m)
      var j = 0
      while (j < m) {
        val off = j * dsub
        var best = 0
        var bestD = Double.MaxValue
        var r = 0
        while (r < ksub) {
          val c = unitVecs(r)
          var d = 0.0
          var t = 0
          while (t < dsub) {
            val diff = u(off + t) - c(off + t)
            d += diff * diff
            t += 1
          }
          if (d < bestD) { bestD = d; best = r }
          r += 1
        }
        out(j) = best
        j += 1
      }
      new GenericArrayData(out)
    }

    /** Flattened per-query ADC lookup table: `lut(j*ksub + r)` = squared
      * L2 distance between the (normalized) query's subvector j and
      * centroid r.
      */
    def lut(q: ArrayData): GenericArrayData = {
      val u = unitOf(q)
      val out = new Array[Any](m * ksub)
      var j = 0
      while (j < m) {
        val off = j * dsub
        var r = 0
        while (r < ksub) {
          val c = unitVecs(r)
          var d = 0.0
          var t = 0
          while (t < dsub) {
            val diff = u(off + t) - c(off + t)
            d += diff * diff
            t += 1
          }
          out(j * ksub + r) = d
          r += 1
        }
        j += 1
      }
      new GenericArrayData(out)
    }

    /** ADC score: Σ_j lut(j·ksub + codes(j)), j ascending. */
    def adc(codes: ArrayData, lutArr: ArrayData): Double = {
      var s = 0.0
      var j = 0
      while (j < m) {
        s += lutArr.getDouble(j * ksub + codes.getInt(j))
        j += 1
      }
      s
    }
  }

  def encode(vec: Column, cb: PqCodebook): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), cb))

  def lut(qvec: Column, cb: PqCodebook): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(qvec), cb))

  def adc(codes: Column, lutCol: Column, cb: PqCodebook): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(codes),
      ColumnBridge.expression(lutCol), cb))

  private[functions] val FloatArray = ArrayType(FloatType)
}

/** PQ encode: `array<float>` vector → `array<int>` of m codes. A
  * zero-exchange whole-stage-codegen projection; the codebook rides as a
  * reference object with ONE monomorphic call per row (the
  * GreedyTokenCount pattern).
  */
case class PqEncode(child: Expression, cb: PqOps.PqCodebook)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(PqOps.FloatArray)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements == cb.dim,
      s"PQ encode expects dim ${cb.dim}, got ${v.numElements}")
    cb.encode(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("pqCb", cb,
      classOf[PqOps.PqCodebook].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() != $ref.dim()) {
        throw new IllegalArgumentException("PQ encode expects dim "
          + $ref.dim() + ", got " + $c.numElements());
      }
      ${ev.value} = $ref.encode($c);""")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Per-query ADC lookup table: `array<float>` query → `array<double>` of
  * m·ksub squared subspace distances. Computed once per (broadcast)
  * query row.
  */
case class PqLut(child: Expression, cb: PqOps.PqCodebook)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(PqOps.FloatArray)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    require(v.numElements == cb.dim,
      s"PQ lut expects dim ${cb.dim}, got ${v.numElements}")
    cb.lut(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("pqCb", cb,
      classOf[PqOps.PqCodebook].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() != $ref.dim()) {
        throw new IllegalArgumentException("PQ lut expects dim "
          + $ref.dim() + ", got " + $c.numElements());
      }
      ${ev.value} = $ref.lut($c);""")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** ADC score of one candidate: Σ over subspaces of its code's LUT entry —
  * O(m) per candidate, the PQ fast path.
  */
case class PqAdc(left: Expression, right: Expression, cb: PqOps.PqCodebook)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(codes: Any, lutArr: Any): Any =
    cb.adc(codes.asInstanceOf[ArrayData], lutArr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("pqCb", cb,
      classOf[PqOps.PqCodebook].getName)
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = $ref.adc($c, $l);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
