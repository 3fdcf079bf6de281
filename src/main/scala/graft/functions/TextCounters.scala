package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-class counters over the raw text:
  * `[punct, cjk]` where punct = code points matching `[^\w\s]` (ASCII
  * `\w`/`\s`, the same classes Java regex and RE2 use) and cjk = code
  * points in U+4E00..U+9FFF. Replaces two full regex scans per row with
  * one pass — the text-analysis operators run 5-7 of these per document.
  */
case class CharClassCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var punct = 0L
    var cjk = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val isWord = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9') || cp == '_'
      val isSpace = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!isWord && !isSpace) punct += 1
      if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array[Any](punct, cjk))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Per-set token membership counts: tokenize the input into maximal runs
  * of ASCII word chars and count how many tokens fall in each word set.
  * Applied to `lower(text)`, this equals
  * `regexp_count(lower(text), '\b(w1|w2|...)\b')` for word-char-only
  * alternations (tokens are disjoint; `\b` cannot split a `\w` run) at a
  * fraction of the regex-engine cost.
  */
case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val hashSets: Array[java.util.HashSet[String]] =
    sets.map { ws =>
      val h = new java.util.HashSet[String]()
      ws.foreach(h.add)
      h
    }.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Long](hashSets.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      val isWord = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
      if (isWord) {
        var j = i + 1
        while (j < n && {
          val d = s.charAt(j)
          (d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') ||
            (d >= '0' && d <= '9') || d == '_'
        }) j += 1
        val tok = s.substring(i, j)
        var k = 0
        while (k < hashSets.length) {
          if (hashSets(k).contains(tok)) counts(k) += 1
          k += 1
        }
        i = j
      } else i += 1
    }
    new GenericArrayData(counts.map(Long.box(_): Any))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** One-pass word statistics over the raw text:
  * `[n_words, non_ws_chars, alpha_words]` where words are maximal runs
  * of non-whitespace (same segmentation as `split(trim(text), "\s+")`
  * with Java regex `\s` = space/TAB/LF/VT/FF/CR), `non_ws_chars` counts
  * non-whitespace code points (= `length(regexp_replace(text, "\s+",
  * ""))`), and `alpha_words` counts words containing at least one ASCII
  * letter. Replaces a split+size, a regexp_replace+length and a
  * per-word rlike lambda — three string passes and two array
  * allocations per document — with one scan.
  */
case class WordStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var words = 0L
    var nonWs = 0L
    var alpha = 0L
    var inWord = false
    var wordHasAlpha = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val isSpace = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (isSpace) {
        if (inWord) {
          words += 1
          if (wordHasAlpha) alpha += 1
          inWord = false
          wordHasAlpha = false
        }
      } else {
        nonWs += 1
        inWord = true
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z'))
          wordHasAlpha = true
      }
      i += Character.charCount(cp)
    }
    if (inWord) {
      words += 1
      if (wordHasAlpha) alpha += 1
    }
    new GenericArrayData(Array[Any](words, nonWs, alpha))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object TextCounters {
  def charClassCounts(text: Column): Column =
    ColumnBridge.column(CharClassCounts(ColumnBridge.expression(text)))

  def tokenSetCounts(text: Column, sets: Seq[Seq[String]]): Column =
    ColumnBridge.column(
      TokenSetCounts(ColumnBridge.expression(text), sets))

  def wordStats(text: Column): Column =
    ColumnBridge.column(WordStats(ColumnBridge.expression(text)))
}
