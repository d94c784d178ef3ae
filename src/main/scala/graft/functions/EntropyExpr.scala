package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local information-density kernels for corpus quality filtering:
  * character-distribution entropy (gibberish / degenerate-repetition
  * detector) and the LZW phrase count (the classic compression-ratio
  * quality proxy — Gopher-style pipelines gate on "does the page
  * compress suspiciously well").
  *
  * Both are ONE codegen pass per document with no explode, no join and
  * no shuffle — the only shape that survives a 100 TB corpus — and both
  * are EXACT integer functions of the text, so the DuckDB oracle
  * replays them bit-for-bit (entropy through the shared 1/64-bit
  * surprisal spelling, LZW through a recursive-CTE replay of the same
  * greedy walk).
  */
object EntropyExpr {

  /** Column: integer entropy numerator of the code-point distribution
    * (see [[CharEntropy64]]). */
  def charEntropy64(text: Column): Column =
    ColumnInternals.column(CharEntropy64(ColumnInternals.expr(text)))

  /** Column: LZW phrase count of the text (see [[LzwPhrases]]). */
  def lzwPhrases(text: Column): Column =
    ColumnInternals.column(LzwPhrases(ColumnInternals.expr(text)))
}

/** Integer character-entropy numerator: with n = code-point count and
  * cnt_c the per-code-point census,
  *
  *   ent_num = n·s64(n) − Σ_c cnt_c·s64(cnt_c)
  *
  * where s64 is the repo's ONE 1/64-bit log2 spelling
  * ([[graft.operators.NgramLm.surprisal64Long]]). Entropy in bits ≈
  * ent_num / (64·n) — callers carry the exact rational
  * (ent_num, 64·n) and cross-multiply band cuts, so no float ever
  * computes. Empty input → 0. Domain bound: per-doc counts must stay
  * below 2^57 (the surprisal shift limit) — ~10^17 code points per
  * document, unreachable.
  *
  * Reference scope: quality gates over document text
  * (`/root/reference/core/query.c` select-where surface); the entropy
  * signal itself is the standard training-data hygiene extension. */
case class CharEntropy64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy64 expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CharEntropy64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropy64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : CharEntropy64 = copy(child = newChild)
}

object CharEntropy64 {
  import graft.operators.NgramLm.surprisal64Long

  def compute(text: UTF8String): Long = {
    val s = text.toString
    val m = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = m.get(cp)
      if (slot == null) m.put(cp, Array(1L)) else slot(0) += 1L
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0L
    var acc = n * surprisal64Long(n)
    val it = m.values.iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      acc -= c * surprisal64Long(c)
    }
    acc
  }
}

/** LZW phrase count: the number of phrases the greedy LZW parse emits
  * over the document's code points — the dictionary starts as the
  * (implicit) set of all single code points and grows by
  * (matched-phrase + next-char) on every emit, so repetitive text
  * parses into few long phrases and n_phrases/n_cp is a replayable
  * compression-ratio proxy (Welch 1984; the "compression ratio" gate of
  * Gopher-style quality filters, made engine-exact — zlib output is
  * not replayable cross-engine, this parse is).
  *
  * The walk (0-based code-point indices; `start` opens the current
  * phrase, `wlen` its matched length):
  *
  *   if start+wlen < n AND (wlen == 0 OR s[start, wlen+1) ∈ dict):
  *     wlen += 1                        — extend the match
  *   else:
  *     phrases += 1                     — emit s[start, wlen)
  *     if start+wlen < n: dict += s[start, wlen+1)
  *     start += wlen; wlen = 0
  *
  * Every step either extends or emits, so the walk is ≤ 2n iterations —
  * which is exactly what makes it replayable as a DuckDB recursive CTE
  * with the dictionary as a LIST column (the t72 segmentation-state
  * precedent). Empty input → 0. */
case class LzwPhrases(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lzw_phrases expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    LzwPhrases.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LzwPhrases.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : LzwPhrases = copy(child = newChild)
}

object LzwPhrases {

  def compute(text: UTF8String): Long = {
    val s = text.toString
    // code-point index → char offset (one walk), plus the end sentinel
    val offs = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < s.length) {
      offs.add(i)
      i += Character.charCount(s.codePointAt(i))
    }
    offs.add(s.length)
    val n = offs.size - 1
    @inline def sub(cp: Int, len: Int): String =
      s.substring(offs.get(cp), offs.get(cp + len))
    val dict = new java.util.HashSet[String]()
    var phrases = 0L
    var start = 0
    var wlen = 0
    while (start < n) {
      if (start + wlen < n &&
          (wlen == 0 || dict.contains(sub(start, wlen + 1)))) {
        wlen += 1
      } else {
        phrases += 1L
        if (start + wlen < n) dict.add(sub(start, wlen + 1))
        start += wlen
        wlen = 0
      }
    }
    phrases
  }
}
