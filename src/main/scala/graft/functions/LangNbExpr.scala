package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The FOLDED LangNb model (the t42 LmScore64 shape): every char
  * trigram packs INJECTIVELY into an i64 — three code points of ≤ 21
  * bits each, `(cp1 << 42) | (cp2 << 21) | cp3` < 2^63 — so unlike the
  * hash-space LM there is NO aliasing: the folded model is EXACTLY the
  * string-keyed model, and kernel scoring is spec-pinned bit-equal to
  * the join/window `LangNb.predict` plan. `grams` maps the packed code
  * to a slot; `w64` is the dense slot-major (slot·L + lang) weight
  * block; `base64`/`langs` are lang-ASC-ordered (the tie-break order).
  * Reference equality (two fits never compare equal — conservative for
  * Catalyst canonicalization). */
final class LangNbKernel(val grams: LongLongMap, val w64: Array[Long],
                         val base64: Array[Long],
                         val langs: Array[String]) extends Serializable {
  val unknown: UTF8String = UTF8String.fromString("unknown")
  val langsU: Array[UTF8String] = langs.map(UTF8String.fromString)
}

/** Per-document language prediction in ONE codegen pass — no gram
  * explode, no broadcast joins, no per-doc window: walk the text's
  * code points once, probe the packed-trigram map, accumulate the
  * per-language integer scores, argmax with the lang-ASC tie-break.
  * The 100× probe read 44-50 s for the join/window plan over 500k docs
  * vs ~1-2 s for this pass (the t42 "only the full fold pays"
  * lesson). */
case class LangNbScore(child: Expression, kernel: LangNbKernel)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"langNbScore expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    LangNbScore.compute(input.asInstanceOf[UTF8String], kernel)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("langNbKernel", kernel,
      "graft.functions.LangNbKernel")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LangNbScore.compute($c, $kRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : LangNbScore = copy(child = newChild)
}

object LangNbScore {
  /** Injective i64 pack of a char trigram (code points ≤ 0x10FFFF
    * < 2^21). */
  @inline def pack(cp1: Int, cp2: Int, cp3: Int): Long =
    (cp1.toLong << 42) | (cp2.toLong << 21) | cp3.toLong

  /** The ONE gram walk (shared by score and stats so the two kernel
    * paths cannot drift): per-language w64 sums into `sw`, returns nv
    * (vocab-gram occurrence count). */
  private def walk(s: String, k: LangNbKernel, sw: Array[Long]): Long = {
    val nLang = k.langs.length
    var nv = 0L
    var cp1 = -1; var cp2 = -1
    var i = 0
    while (i < s.length) {
      val cp3 = s.codePointAt(i)
      i += Character.charCount(cp3)
      if (cp1 >= 0) {
        val slot = k.grams.get(pack(cp1, cp2, cp3), -1L)
        if (slot >= 0) {
          nv += 1
          val off = slot.toInt * nLang
          var li = 0
          while (li < nLang) { sw(li) += k.w64(off + li); li += 1 }
        }
      }
      cp1 = cp2; cp2 = cp3
    }
    nv
  }

  /** The one scalar home of kernel scoring: identical semantics to the
    * stage plan — nv vocab-gram occurrences, score_l = Σ w64 − nv·b64,
    * argmax (score DESC, lang ASC), 'unknown' at nv = 0. */
  def compute(text: UTF8String, k: LangNbKernel): UTF8String = {
    val nLang = k.langs.length
    val sw = new Array[Long](nLang)
    val nv = walk(text.toString, k, sw)
    if (nv == 0) k.unknown
    else {
      var best = 0
      var bestScore = sw(0) - nv * k.base64(0)
      var li = 1
      while (li < nLang) {
        val sc = sw(li) - nv * k.base64(li)
        // strictly greater: ties keep the earlier (lang ASC) entry
        if (sc > bestScore) { best = li; bestScore = sc }
        li += 1
      }
      k.langsU(best)
    }
  }

  /** Confidence stats over the same walk: long[3] = (best language
    * index — −1 at nv = 0, margin64 = best − runner-up score BY VALUE
    * (a top-tie reads 0 regardless of which language wins the ASC
    * tie-break), nv). Needs ≥ 2 languages in the kernel. */
  def computeStats(text: UTF8String, k: LangNbKernel): GenericArrayData = {
    val nLang = k.langs.length
    // the invariant lives WITH the arithmetic, not only at the operator
    // call sites: a 1-language kernel leaves second = Long.MinValue and
    // margin64 = best − MinValue wraps negative — garbage a future
    // caller (e.g. a SQL registration) would read silently
    require(nLang >= 2,
      s"langNb confidence stats need >= 2 languages in the kernel, got $nLang")
    val sw = new Array[Long](nLang)
    val nv = walk(text.toString, k, sw)
    if (nv == 0) return new GenericArrayData(Array(-1L, 0L, 0L))
    var best = 0
    var bestScore = sw(0) - nv * k.base64(0)
    var second = Long.MinValue
    var li = 1
    while (li < nLang) {
      val sc = sw(li) - nv * k.base64(li)
      if (sc > bestScore) { second = bestScore; best = li; bestScore = sc }
      else if (sc > second) second = sc
      li += 1
    }
    new GenericArrayData(Array(best.toLong, bestScore - second, nv))
  }

  def score(c: Column, k: LangNbKernel): Column =
    ColumnInternals.column(LangNbScore(ColumnInternals.expr(c), k))

  def stats(c: Column, k: LangNbKernel): Column =
    ColumnInternals.column(LangNbStats(ColumnInternals.expr(c), k))
}

/** Confidence-stats twin of [[LangNbScore]] — same kernel, same ONE
  * walk, returns long[3] = (best lang index | −1, margin64, nv) so the
  * CCNet-style confidence gate (margin per vocab gram) stays a single
  * codegen pass with the derived values read via `element_at`. */
case class LangNbStats(child: Expression, kernel: LangNbKernel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"langNbStats expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    LangNbScore.computeStats(input.asInstanceOf[UTF8String], kernel)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("langNbKernel", kernel,
      "graft.functions.LangNbKernel")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LangNbScore.computeStats($c, $kRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : LangNbStats = copy(child = newChild)
}
