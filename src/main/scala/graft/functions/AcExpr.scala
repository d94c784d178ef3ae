package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-phrase scan (Aho & Corasick 1975): count ALL
  * occurrences (overlapping included) of every blocklist phrase in one
  * pass over the text — the standard wordlist/badlist filter of crawl
  * pipelines (C4's banned-word gate, RefinedWeb URL blocklists), in the
  * only shape that survives a 100 TB corpus: the automaton is a bounded
  * MODEL ARTIFACT shipped into the generated code via `addReferenceObj`
  * (the Bloom-bits precedent), so the corpus side is ONE codegen scan —
  * no per-phrase regex passes, no explode, no join, no shuffle.
  *
  * Output layout: a long[] of length P+3 where slots [0, P) are the
  * per-phrase occurrence counts (phrase order = input order) and the
  * three appended slots are row-local derived stats — [P] total hits,
  * [P+1] number of phrases with ≥1 hit, [P+2] the index of the
  * most-frequent phrase (ties → lowest index; −1 when total is 0).
  * They ride in the same array so downstream reads stay inside
  * whole-stage codegen (`element_at`/`slice`) instead of dropping to
  * CodegenFallback higher-order aggregates.
  *
  * Semantics: matches are counted at every end position over CODE
  * POINTS — exactly the per-position substring census the DuckDB
  * oracle replays, so reports hash-match cross-engine. */
case class AcCounts(child: Expression, phrases: Seq[String])
    extends UnaryExpression {
  require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
    "ac_counts needs a non-empty list of non-empty phrases")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ac_counts expects a string input, got ${child.dataType}")

  @transient private lazy val auto: AcAutomaton = AcAutomaton.build(phrases)

  override def nullSafeEval(input: Any): Any =
    AcCounts.compute(input.asInstanceOf[UTF8String], auto)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("acAuto", auto,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AcCounts.compute($c, $autoRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : AcCounts = copy(child = newChild)
}

object AcCounts {

  def compute(text: UTF8String, auto: AcAutomaton): GenericArrayData = {
    val s = text.toString
    val p = auto.nPhrases
    val counts = new Array[Long](p + 3)
    var state = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      state = auto.step(state, cp)
      val out = auto.outputs(state)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1L; j += 1 }
      i += Character.charCount(cp)
    }
    var total = 0L
    var nphr = 0L
    var top = -1L
    var best = 0L
    var k = 0
    while (k < p) {
      val c = counts(k)
      total += c
      if (c > 0L) {
        nphr += 1L
        if (c > best) { best = c; top = k.toLong }
      }
      k += 1
    }
    counts(p) = total
    counts(p + 1) = nphr
    counts(p + 2) = top
    new GenericArrayData(counts)
  }

  /** Column form: per-phrase counts plus the three derived slots. */
  def acCounts(text: Column, phrases: Seq[String]): Column =
    ColumnInternals.column(AcCounts(ColumnInternals.expr(text), phrases))
}

/** The built automaton: trie transitions per node plus fail links —
  * `step` follows fail links on a missing transition (amortized O(1)
  * per scanned code point, O(n) over the text; transitions are NOT
  * collapsed into a total goto table). What IS precomputed per node is
  * the FULL output set (own pattern ends ++ the fail target's
  * outputs), so match EMISSION never chases suffix links. Bounded by
  * total phrase length — a model artifact, never corpus-sized. */
final class AcAutomaton(
    private val trans: Array[java.util.HashMap[Integer, Integer]],
    private val fail: Array[Int],
    val outputs: Array[Array[Int]],
    val nPhrases: Int) extends Serializable {

  /** One AC step: follow fail links until a goto exists (root absorbs). */
  def step(state: Int, cp: Int): Int = {
    var st = state
    while (true) {
      val nxt = trans(st).get(cp)
      if (nxt != null) return nxt.intValue
      if (st == 0) return 0
      st = fail(st)
    }
    0 // unreachable
  }
}

object AcAutomaton {

  def build(phrases: Seq[String]): AcAutomaton = {
    val trans = new java.util.ArrayList[java.util.HashMap[Integer, Integer]]()
    val ends = new java.util.ArrayList[java.util.ArrayList[Integer]]()
    def newNode(): Int = {
      trans.add(new java.util.HashMap[Integer, Integer]())
      ends.add(new java.util.ArrayList[Integer]())
      trans.size - 1
    }
    newNode() // root = 0
    // trie over code points
    phrases.zipWithIndex.foreach { case (ph, idx) =>
      var st = 0
      var i = 0
      while (i < ph.length) {
        val cp = ph.codePointAt(i)
        val nxt = trans.get(st).get(cp)
        st = if (nxt != null) nxt.intValue
             else { val n = newNode(); trans.get(st).put(cp, n); n }
        i += Character.charCount(cp)
      }
      ends.get(st).add(idx)
    }
    val n = trans.size
    val fail = new Array[Int](n)
    val outs = new Array[Array[Int]](n)
    outs(0) = ends.get(0).toArray(Array.empty[Integer]).map(_.intValue)
    // BFS fail links; outputs(v) = ends(v) ++ outputs(fail(v))
    val queue = new java.util.ArrayDeque[Integer]()
    trans.get(0).forEach { (_, v) =>
      fail(v) = 0
      queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue
      val own = ends.get(u).toArray(Array.empty[Integer]).map(_.intValue)
      outs(u) = own ++ outs(fail(u))
      trans.get(u).forEach { (cp, v) =>
        // fail(v): longest proper suffix state with a cp-transition
        var f = fail(u)
        var fv = 0
        var done = false
        while (!done) {
          val nxt = trans.get(f).get(cp)
          if (nxt != null) { fv = nxt.intValue; done = true }
          else if (f == 0) { fv = 0; done = true }
          else f = fail(f)
        }
        fail(v.intValue) = fv
        queue.add(v)
      }
    }
    new AcAutomaton(
      trans.toArray(Array.empty[java.util.HashMap[Integer, Integer]]),
      fail, outs, phrases.size)
  }
}
