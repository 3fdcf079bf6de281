package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-shingle (k-gram) extraction.
  *
  * Semantically identical to
  * `transform(sequence(...), i -> concat_ws(' ', slice(split(trim(lower(
  * text)), '\\s+'), i, k)))` — and to the DuckDB oracle's
  * `list_transform(range(...), i -> array_to_string(ws[i:i+k-1], ' '))` —
  * but runs as a single O(words) pass per row. The composed higher-order
  * version pays interpreted-lambda + array-slice allocation per element,
  * which dominated the dedup operators' runtime at corpus scale.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // codegen rides a monomorphic helper call (see WordTermCounts) — this
  // kernel is on every dedup/search scan
  @transient private lazy val kernel = new WordShingles.Kernel(k)

  override def nullSafeEval(input: Any): Any =
    kernel.shingle(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("shingleKernel", kernel,
      classOf[WordShingles.Kernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.shingle($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WordShingles {
  final class Kernel(k: Int) extends Serializable {
    def shingle(input: UTF8String): GenericArrayData = {
      // EXACT pipeline of split(trim(lower(text)), "\s+"): UTF8String
      // lowercase, SPACE-ONLY trim (SQL trim semantics — trimAll would
      // also strip tabs/newlines, diverging from the composed form and
      // the oracle on text with trailing non-space whitespace), and a
      // limit=-1 split that KEEPS trailing empty tokens like Spark's
      // split and DuckDB's string_split_regex do
      val s = input.toLowerCase.trim().toString
      val words = s.split("\\s+", -1)
      if (words.length < k)
        return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](words.length - k + 1)
      var i = 0
      while (i <= words.length - k) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** One-pass non-overlapping word chunking (the paragraph-granularity cut
  * used by the chunk-dedup family).
  *
  * Semantically identical to
  * `transform(sequence(0, ceil(size(ws)/w) - 1), i -> array_join(slice(
  * ws, i*w + 1, w), ' '))` over `ws = split(trim(lower(text)), '\\s+')` —
  * and to the oracle's `list_transform(range(...), i ->
  * array_to_string(ws[i*w+1:i*w+w], ' '))` — but a single O(words) pass:
  * the composed version pays an interpreted lambda + array slice + join
  * allocation per chunk, tripled across the three chunk operators.
  */
case class WordChunks(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 1, "chunk width must be >= 1")

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val kernel = new WordChunks.Kernel(w)

  override def nullSafeEval(input: Any): Any =
    kernel.chunk(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("chunkKernel", kernel,
      classOf[WordChunks.Kernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.chunk($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WordChunks {
  final class Kernel(w: Int) extends Serializable {
    def chunk(input: UTF8String): GenericArrayData = {
      // same EXACT split(trim(lower(text)), "\s+") pipeline as
      // WordShingles: space-only trim, limit=-1 split keeping trailing
      // empty tokens. "".split -> [""]: one empty word, hence ONE empty
      // chunk, matching the higher-order formulation and the oracle.
      val s = input.toLowerCase.trim().toString
      val words = s.split("\\s+", -1)
      val n = (words.length + w - 1) / w
      val out = new Array[Any](n)
      var c = 0
      while (c < n) {
        val sb = new java.lang.StringBuilder
        var j = c * w
        val end = math.min(j + w, words.length)
        while (j < end) {
          if (j > c * w) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        out(c) = UTF8String.fromString(sb.toString)
        c += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** One-pass per-document term-frequency map:
  * `array<struct<term:string, tf:long>>` with one entry per DISTINCT
  * word (same `split(trim(lower(text)), '\s+')` tokenization as
  * [[WordShingles]]), tf = in-document occurrence count. Entries are
  * emitted term-ascending so the output is deterministic.
  *
  * This is the shuffle-eliminator for the text-search family: a
  * `groupBy(doc, term).count()` formulation shuffles every word
  * INSTANCE of the corpus; computing tf row-locally means only the
  * (doc, distinct-term, tf) rows — smaller by the corpus' duplication
  * factor — ever reach an exchange.
  */
case class WordTermCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  // the kernel rides whole-stage codegen as a monomorphic helper call
  // (the GreedyTokenCount trie pattern) instead of CodegenFallback's
  // per-row interpreted detour — this expression sits in the hottest
  // text-search scans
  @transient private lazy val counter = new WordTermCounts.Counter

  override def nullSafeEval(input: Any): Any =
    counter.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("wtcCounter", counter,
      classOf[WordTermCounts.Counter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WordTermCounts {
  /** One-pass tf kernel; `final` keeps the generated-code call site
    * monomorphic.
    */
  final class Counter extends Serializable {
    def count(input: UTF8String): GenericArrayData = {
      // EXACT split(trim(lower(text)), "\s+") pipeline of WordShingles:
      // space-only trim, limit=-1 split keeping trailing empty tokens
      val s = input.toLowerCase.trim().toString
      val words = s.split("\\s+", -1)
      val counts = new java.util.TreeMap[String, java.lang.Long]()
      var i = 0
      while (i < words.length) {
        val prev = counts.get(words(i))
        counts.put(words(i),
          if (prev == null) java.lang.Long.valueOf(1L)
          else java.lang.Long.valueOf(prev.longValue + 1L))
        i += 1
      }
      val out = new Array[Any](counts.size)
      val it = counts.entrySet().iterator()
      var j = 0
      while (it.hasNext) {
        val e = it.next()
        out(j) = InternalRow(UTF8String.fromString(e.getKey),
          e.getValue.longValue)
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

object TextShingles {
  def wordShingles(text: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), k))

  def wordChunks(text: Column, w: Int): Column =
    ColumnBridge.column(WordChunks(ColumnBridge.expression(text), w))

  def wordTermCounts(text: Column): Column =
    ColumnBridge.column(WordTermCounts(ColumnBridge.expression(text)))
}
