package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Excise flagged word-n-gram spans from a document in ONE pass — the
  * row-local half of exact-substring deduplication (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): given
  * the 0-based token positions where corpus-frequent n-grams START,
  * union the intervals [s, s+n-1], merge overlaps into maximal covered
  * runs, and rebuild the text from the uncovered tokens.
  *
  * Returns `struct<clean: string, nspans: int, removed: int>`:
  *   - clean   = uncovered tokens re-joined with ' ' ('' if all covered)
  *   - nspans  = number of maximal merged spans
  *   - removed = covered token count
  *
  * Tokenization matches `split(text, ' ')` limit=-1 (empty tokens
  * kept) — the corpus-wide convention shared with `NgramHashes`, so
  * positions line up with `posexplode(ngramHashes(...))` exactly. The
  * start list may arrive in any order (it is a `collect_set`); coverage
  * is built as a bitmap so ordering is irrelevant. O(ntok + n·|starts|)
  * per row, codegen'd — the corpus census (the heavy half) stays a
  * separate distributed aggregate.
  */
case class SpanExcise(text: Expression, starts: Expression, n: Int,
                      minSpan: Int = 0)
    extends BinaryExpression {
  require(n >= 1, s"span width $n must be >= 1")

  override def left: Expression = text
  override def right: Expression = starts

  override def dataType: DataType = SpanExcise.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (text.dataType == StringType &&
        starts.dataType.isInstanceOf[ArrayType] &&
        starts.dataType.asInstanceOf[ArrayType].elementType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"span_excise expects (string, array<int>), got " +
          s"(${text.dataType}, ${starts.dataType})")

  override def nullSafeEval(t: Any, s: Any): Any =
    SpanExcise.compute(t.asInstanceOf[UTF8String], s.asInstanceOf[ArrayData],
      n, minSpan)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.functions.SpanExcise.compute($t, $s, $n, $minSpan)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanExcise =
    copy(text = newLeft, starts = newRight)

  override def prettyName: String = "span_excise"
}

object SpanExcise {
  val schema: StructType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("nspans", IntegerType, nullable = false),
    StructField("removed", IntegerType, nullable = false)))

  def compute(text: UTF8String, starts: ArrayData, n: Int,
              minSpan: Int = 0): InternalRow = {
    val s = text.toString
    val toks = s.split(" ", -1)
    val ntok = toks.length
    val m = starts.numElements()
    if (m == 0) return InternalRow(text, 0, 0)
    val covered = new Array[Boolean](ntok)
    var i = 0
    while (i < m) {
      val st = starts.getInt(i)
      if (st >= 0 && st < ntok) {
        var j = st
        val end = math.min(st + n - 1, ntok - 1)
        while (j <= end) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    // ExactSubstr's span-length floor: a maximal merged run shorter than
    // minSpan tokens is NOT excised (Lee et al. remove only long
    // repeated substrings; short frequent grams are ordinary language)
    if (minSpan > 1) {
      var p0 = 0
      while (p0 < ntok) {
        if (covered(p0) && (p0 == 0 || !covered(p0 - 1))) {
          var e = p0
          while (e + 1 < ntok && covered(e + 1)) e += 1
          if (e - p0 + 1 < minSpan) {
            var j = p0
            while (j <= e) { covered(j) = false; j += 1 }
          }
          p0 = e + 1
        } else p0 += 1
      }
    }
    var nspans = 0
    var removed = 0
    val sb = new java.lang.StringBuilder(s.length)
    var emitted = false
    var p = 0
    while (p < ntok) {
      if (covered(p)) {
        removed += 1
        if (p == 0 || !covered(p - 1)) nspans += 1
      } else {
        if (emitted) sb.append(' ')
        sb.append(toks(p))
        emitted = true
      }
      p += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), nspans, removed)
  }
}

object SpanExciseExpr {
  /** struct<clean, nspans, removed> of `text` with the n-token spans
    * starting at 0-based positions `starts` (array<int>) excised;
    * merged spans shorter than `minSpan` tokens survive (the
    * ExactSubstr length floor — 0 excises every flagged span). */
  def excise(text: Column, starts: Column, n: Int, minSpan: Int = 0): Column =
    ColumnInternals.column(
      SpanExcise(ColumnInternals.expr(text), ColumnInternals.expr(starts), n,
        minSpan))
}
