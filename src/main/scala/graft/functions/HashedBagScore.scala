package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass hashed-bag classifier scoring: `struct(n_feats, raw_score)`
  * where raw_score sums the literal weight vector's bucket entries over
  * the document's word unigrams + word bigrams (the
  * [[graft.operators.TextAnalysis.hashedClassifierScore]] feature
  * pipeline, verbatim — same trim/lower/split, same `hash60 % dim`
  * buckets, so the oracle parity of the composed form carries over).
  *
  * The composed higher-order version materializes the concatenated
  * feature array per row and walks an interpreted md5→conv→substring
  * expression chain per feature; this kernel hashes each feature
  * in-place and never allocates the bag — classifier scoring at corpus
  * scale is a scan, and the scan should run at tokenizer speed (the
  * WordShingles/VocabTokenizer precedent).
  */
case class HashedBagScore(child: Expression, weights: Seq[Int])
    extends UnaryExpression with ExpectsInputTypes {

  require(weights.nonEmpty, "weights must be non-empty")

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("raw_score", LongType, nullable = false)))

  @transient private lazy val kernel =
    new HashedBagScore.Kernel(weights.toArray)

  override def nullSafeEval(input: Any): Any =
    kernel.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("bagScoreKernel", kernel,
      classOf[HashedBagScore.Kernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object HashedBagScore {

  def score(text: Column, weights: Seq[Int]): Column =
    ColumnBridge.column(
      HashedBagScore(ColumnBridge.expression(text), weights))

  final class Kernel(weights: Array[Int]) extends Serializable {

    // MessageDigest is stateful; one per thread
    @transient private lazy val md =
      new ThreadLocal[java.security.MessageDigest] {
        override def initialValue(): java.security.MessageDigest =
          java.security.MessageDigest.getInstance("MD5")
      }

    def score(input: UTF8String): GenericInternalRow = {
      // EXACT pipeline of split(trim(lower(text)), "\s+") — see
      // WordShingles.Kernel for why trim is space-only and split keeps
      // empty tokens
      val s = input.toLowerCase.trim().toString
      val words = s.split("\\s+", -1)
      val dim = weights.length
      var raw = 0L
      var i = 0
      while (i < words.length) {
        raw += weights((hash60(words(i)) % dim).toInt)
        i += 1
      }
      i = 0
      while (i + 1 < words.length) {
        raw += weights((hash60(words(i) + " " + words(i + 1)) % dim).toInt)
        i += 1
      }
      val nFeats = words.length.toLong + math.max(0, words.length - 1).toLong
      new GenericInternalRow(Array[Any](nFeats, raw))
    }

    /** First 15 hex digits of md5(utf8 bytes) as a long — the JVM-side
      * twin of [[StableHash.hash60]]'s
      * `conv(substring(md5(x), 1, 15), 16, 10)`.
      */
    private def hash60(s: String): Long = {
      val d = md.get().digest(s.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 0
      while (i < 7) {
        v = (v << 8) | (d(i) & 0xffL)
        i += 1
      }
      (v << 4) | ((d(7) & 0xf0L) >>> 4)
    }
  }
}
