package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Learned-vocabulary greedy tokenizer (the encode half of a BPE-style
  * tokenizer: WordPiece-like greedy longest-match against a fixed unit
  * vocabulary).
  *
  * Semantics, per row: the text is lowercased, space-trimmed and
  * whitespace-split exactly like [[WordShingles]] (so `""` yields one
  * empty word). Each non-empty word is segmented left to right: at every
  * position the LONGEST vocabulary unit matching there is consumed as one
  * token; when no unit matches, a single character is consumed as one
  * UNK token. The result is the total token count over all words (an
  * empty word contributes 0).
  *
  * The vocabulary rides inside the expression (a model artifact, bounded
  * by the training `vocabSize` — task-serialized once, like a broadcast
  * var), so encoding is a ZERO-exchange projection over the corpus: no
  * join, no shuffle, one scan. The per-row cost is O(chars) via a
  * character trie with no per-probe allocation.
  *
  * Codegen: this is the hottest scalar on a 100 TB text pipeline, so it
  * participates in whole-stage codegen instead of falling back — the trie
  * is bound into the generated class as a reference object (the same
  * mechanism built-ins use for compiled regex patterns) and the generated
  * code makes ONE monomorphic call on it per row, returning a primitive
  * long. No interpreted-projection boundary, no per-row boxing.
  *
  * Training (choosing the units) is
  * [[graft.operators.TextAnalysis.trainUnitVocab]].
  */
case class GreedyTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = LongType

  // built once per task on first eval; edges keyed (nodeId << 16 | char)
  @transient private lazy val trie = new GreedyTokenCount.Trie(vocab)

  override def nullSafeEval(input: Any): Any =
    trie.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val trieRef = ctx.addReferenceObj("tokTrie", trie,
      classOf[GreedyTokenCount.Trie].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $trieRef.countTokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object GreedyTokenCount {
  /** Compact character trie: edges in one primitive-keyed map
    * ((nodeId << 16) | char), terminal nodes mapped to their vocab
    * index — longestMatch walks the word once per start position with
    * zero allocation. `final` so the per-row call from generated code
    * stays monomorphic.
    */
  final class Trie(vocab: Seq[String]) extends Serializable {
    private val edges = new java.util.HashMap[Long, Integer]()
    private val termIdx = new java.util.HashMap[Integer, Integer]()
    private var nextId = 1

    vocab.zipWithIndex.foreach { case (u, idx) =>
      if (u.nonEmpty) { // a zero-length unit would never advance the scan
        var cur = 0
        var i = 0
        while (i < u.length) {
          val key = (cur.toLong << 16) | u.charAt(i).toLong
          val child = edges.get(key)
          cur = if (child != null) child.intValue()
                else { val id = nextId; nextId += 1; edges.put(key, id); id }
          i += 1
        }
        termIdx.putIfAbsent(cur, idx) // first occurrence wins on dup units
      }
    }

    /** Length of the longest vocab unit matching `w` at `from`, or 0. */
    def longestMatch(w: String, from: Int): Int =
      (longestMatchPacked(w, from) >>> 32).toInt

    /** Packed (length << 32 | vocabIdx + 1) of the longest vocab unit
      * matching `w` at `from`, or 0 when none matches.
      */
    def longestMatchPacked(w: String, from: Int): Long = {
      var cur = 0
      var best = 0L
      var i = from
      while (i < w.length) {
        val child = edges.get((cur.toLong << 16) | w.charAt(i).toLong)
        if (child == null) return best
        cur = child.intValue()
        val t = termIdx.get(cur)
        if (t != null)
          best = ((i - from + 1).toLong << 32) | (t.intValue() + 1).toLong
        i += 1
      }
      best
    }

    /** Whole-row greedy token count — the per-row kernel both the
      * interpreted eval and the generated code call. EXACT
      * split(trim(lower(text)), "\s+") pipeline shared with
      * WordShingles/WordChunks: space-only trim, limit=-1 split.
      */
    def countTokens(input: UTF8String): Long = {
      val s = input.toLowerCase.trim().toString
      val words = s.split("\\s+", -1)
      var total = 0L
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        var p = 0
        while (p < w.length) {
          val m = longestMatch(w, p)
          p += (if (m > 0) m else 1)
          total += 1L
        }
        wi += 1
      }
      total
    }

    /** Whole-row greedy encode to vocab ids (-1 = UNK char). */
    def encodeIds(input: UTF8String): GenericArrayData = {
      val s = input.toLowerCase.trim().toString
      val words = s.split("\\s+", -1)
      val out = new scala.collection.mutable.ArrayBuffer[Any]()
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        var p = 0
        while (p < w.length) {
          val m = longestMatchPacked(w, p)
          if (m == 0L) { out += (-1); p += 1 }
          else {
            out += ((m & 0xffffffffL).toInt - 1)
            p += (m >>> 32).toInt
          }
        }
        wi += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  def tokenCount(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(
      GreedyTokenCount(ColumnBridge.expression(text), vocab))
}

/** The encode half emitting TOKEN IDS instead of a count: per word,
  * greedy longest-match segments map to their vocabulary index and
  * unmatched characters to `-1` (UNK). `size(ids)` is by construction
  * [[GreedyTokenCount]] of the same text/vocab (property-asserted in
  * specs). Same zero-exchange projection shape, same codegen
  * participation (one monomorphic trie call per row).
  */
case class GreedyTokenIds(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  @transient private lazy val trie = new GreedyTokenCount.Trie(vocab)

  override def nullSafeEval(input: Any): Any =
    trie.encodeIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val trieRef = ctx.addReferenceObj("tokTrie", trie,
      classOf[GreedyTokenCount.Trie].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $trieRef.encodeIds($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object GreedyTokenIds {
  def tokenIds(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(
      GreedyTokenIds(ColumnBridge.expression(text), vocab))
}
