package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `array<float>` columns.
  *
  * Embedding similarity (ANN / near-dup) is the hottest loop in the
  * training-data operators: brute-force top-k at 100 TB scale is
  * O(queries x corpus x dim) multiply-adds. Spark's higher-order functions
  * (`zip_with` + `aggregate`) allocate an intermediate array per row and
  * fall out of whole-stage codegen, so this is one of the few places a
  * custom Catalyst Expression is genuinely warranted (SURVEY.md §7.3).
  *
  * Sums left-to-right in double precision — bit-identical to the DuckDB
  * oracle's `list_dot_product(a::DOUBLE[], b::DOUBLE[])`.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |  ? $a.numElements() : $b.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[FloatVectorDot]]'s `array<double>` sibling, for vectors DERIVED from
  * exact integer arithmetic (k-means sum-centroids, dequantized codes):
  * bigint->double casts are exact below 2^53, while a float intermediate
  * would round 25-bit-plus sums differently than the DuckDB oracle's
  * DOUBLE[] path. Same left-to-right double summation order.
  */
case class DoubleVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |  ? $a.numElements() : $b.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Dot product of two array<float> columns as a double Column. */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Dot product of two array<double> columns as a double Column. */
  def dotD(a: Column, b: Column): Column =
    ColumnBridge.column(
      DoubleVectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine over array<double> columns — the same IEEE operation order
    * as [[cosineF]] and the DuckDB oracle.
    */
  def cosineD(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))
  }

  /** Cosine similarity, computed as dot/(sqrt(dot_aa)*sqrt(dot_bb)) with
    * the same IEEE operation order as the DuckDB oracle formula.
    */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotF(a, b) / (sqrt(dotF(a, a)) * sqrt(dotF(b, b)))
  }

  /** Per-vector symmetric int8 quantization of an `array<float>` column:
    * `scale = max(|x|)/127`, `q_i = floor(x_i/scale + 0.5)` (round-half-up
    * spelled as floor so both engines use the identical rule — no
    * dependence on the engine's round() tie-breaking). Returns
    * `struct(scale double, q array<int>)`; the all-zero vector gets
    * scale 0 and all-zero codes.
    *
    * This is the storage path for embedding corpora: 4x smaller than
    * float32 at ~0.3% cosine error, which is what a 100 TB embedding
    * table actually ships as. A one-time projection (not the hot
    * similarity loop), so higher-order functions are fine here; the hot
    * loop stays [[FloatVectorDot]] over dequantized or original floats.
    */
  def quantizeInt8(v: Column): Column = {
    import org.apache.spark.sql.functions._
    val dv = transform(v, x => x.cast("double"))
    val scale = array_max(transform(dv, x => abs(x))) / lit(127.0)
    struct(
      scale.as("scale"),
      transform(dv, x =>
        when(scale === 0.0, lit(0L))
          .otherwise(floor(x / scale + lit(0.5))).cast("int")).as("q"))
  }

  /** Inverse of [[quantizeInt8]]: `x_i ~= q_i * scale`, back as
    * array<float> (the working precision of the similarity operators).
    */
  def dequantizeInt8(qs: Column): Column = {
    import org.apache.spark.sql.functions._
    transform(qs.getField("q"),
      q => (q.cast("double") * qs.getField("scale")).cast("float"))
  }
}
