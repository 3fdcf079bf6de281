package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * Training (choosing the units) is
  * [[graft.operators.TextAnalysis.trainUnitVocab]].
  */
case class GreedyTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)

  override def dataType: DataType = LongType

  // built once per task on first eval; edges keyed (nodeId << 16 | char)
  @transient private lazy val trie = new GreedyTokenCount.Trie(vocab)

  override def nullSafeEval(input: Any): Any = {
    // EXACT split(trim(lower(text)), "\s+") pipeline shared with
    // WordShingles/WordChunks: space-only trim, limit=-1 split
    val s = input.asInstanceOf[UTF8String].toLowerCase.trim().toString
    val words = s.split("\\s+", -1)
    var total = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var p = 0
      while (p < w.length) {
        val m = trie.longestMatch(w, p)
        p += (if (m > 0) m else 1)
        total += 1L
      }
      wi += 1
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object GreedyTokenCount {
  /** Compact character trie: edges in one primitive-keyed map
    * ((nodeId << 16) | char), terminals in a bitset — longestMatch walks
    * the word once per start position with zero allocation.
    */
  private[functions] final class Trie(vocab: Seq[String])
      extends Serializable {
    private val edges = new java.util.HashMap[Long, Integer]()
    private val terminal = new java.util.BitSet()
    private var nextId = 1

    vocab.foreach { u =>
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
        terminal.set(cur)
      }
    }

    /** Length of the longest vocab unit matching `w` at `from`, or 0. */
    def longestMatch(w: String, from: Int): Int = {
      var cur = 0
      var best = 0
      var i = from
      while (i < w.length) {
        val child = edges.get((cur.toLong << 16) | w.charAt(i).toLong)
        if (child == null) return best
        cur = child.intValue()
        if (terminal.get(cur)) best = i - from + 1
        i += 1
      }
      best
    }
  }

  def tokenCount(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(
      GreedyTokenCount(ColumnBridge.expression(text), vocab))
}
