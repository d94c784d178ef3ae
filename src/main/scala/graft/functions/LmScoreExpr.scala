package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Immutable open-addressing i64→i64 map (linear probing, splitmix64
  * finalizer, power-of-two table) — the executor-side model lookup for
  * fold-style scoring expressions. ~1-2 probes per get vs ~log V for a
  * sorted-array binary search (measured: the binary-search vocab probe
  * LOST to Spark's codegen broadcast joins at the 100× LM probe; this
  * map wins because the whole scoring chain collapses into one pass).
  * Keys must be ≥ 0 (the sentinel −1 marks empty slots). */
final class LongLongMap private (keys: Array[Long], vals: Array[Long],
                                 mask: Int) extends Serializable {
  def get(k: Long, default: Long): Long = {
    var i = LongLongMap.mix(k) & mask
    while (true) {
      val kk = keys(i)
      if (kk == k) return vals(i)
      if (kk == -1L) return default
      i = (i + 1) & mask
    }
    default // unreachable
  }
  def contains(k: Long): Boolean = get(k, Long.MinValue) != Long.MinValue
  def size: Int = keys.count(_ != -1L)
}

object LongLongMap {
  /** splitmix64 finalizer — the standard public-domain bit mixer. */
  @inline def mix(x0: Long): Int = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    (x ^ (x >>> 31)).toInt
  }

  def build(ks: Array[Long], vs: Array[Long]): LongLongMap = {
    require(ks.length == vs.length, "key/value arity mismatch")
    var cap = 4
    // load factor ≤ 0.5
    while (cap < ks.length * 2) cap <<= 1
    val keys = Array.fill(cap)(-1L)
    val vals = new Array[Long](cap)
    val mask = cap - 1
    var j = 0
    while (j < ks.length) {
      val k = ks(j)
      require(k >= 0, s"LongLongMap keys must be >= 0, got $k")
      var i = mix(k) & mask
      while (keys(i) != -1L && keys(i) != k) i = (i + 1) & mask
      keys(i) = k
      vals(i) = vs(j)
      j += 1
    }
    new LongLongMap(keys, vals, mask)
  }
}

/** The fully-folded hash-space bigram-LM model: bounded token codes
  * (tokenCode mod 2^22; OOV → the 2^22 sentinel), the bigram table
  * keyed by the INJECTIVE pack (m1 << 23 | m2) < 2^46, and the prefix
  * table keyed by m1. Reference equality (two fits never compare
  * equal — conservative for Catalyst canonicalization). */
final class LmFoldModel(val vocab: LongLongMap, val bigram: LongLongMap,
                        val prefix: LongLongMap, val vPrime: Long)
    extends Serializable

/** Per-document bigram-LM scoring in ONE codegen pass — the hash-space
  * production path of `NgramLm.scoreHashed`: tokenize, bound each
  * token's code, vocab-probe (OOV → UNK), pack the adjacent pair key,
  * probe the bigram + prefix maps, accumulate the integer 1/64-bit
  * add-one surprisal. No pair explode, no model joins, no per-doc
  * shuffle — the scoring plan is a narrow map over the corpus scan
  * (measured 8.9s → ~2s at the 100× probe vs the string-pair chain).
  * Emits struct<n_tok, n_big, s64>; the keep gate and bpt derive as
  * plain columns. The arithmetic is EXACTLY the Column/DuckDB chain:
  * q = (cpre + V') div (cbi + 1), s64 steps via
  * `NgramLm.surprisal64Long` (spec-pinned to the Column form). */
case class LmScore64(child: Expression, model: LmFoldModel)
    extends UnaryExpression {

  override def dataType: DataType = LmScore64.tpe

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lmScore64 expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    LmScore64.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("lmFoldModel", model,
      "graft.functions.LmFoldModel")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LmScore64.compute($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : LmScore64 = copy(child = newChild)
}

object LmScore64 {
  /** Token codes bound to 22 bits so the pair key packs injectively
    * into an i64 — the deterministic aliasing both engines share. */
  val CodeBits = 22
  val CodeMask: Long = (1L << CodeBits) - 1
  val Unk: Long = 1L << CodeBits // one past the code range

  val tpe: DataType = new StructType()
    .add("n_tok", LongType, nullable = false)
    .add("n_big", LongType, nullable = false)
    .add("s64", LongType, nullable = false)

  /** tokenCode mod 2^22, OOV → [[Unk]] — the shared mapping. */
  @inline def mapCode(code: Long, vocab: LongLongMap): Long = {
    val c = code & CodeMask
    if (vocab.contains(c)) c else Unk
  }

  def compute(text: UTF8String, m: LmFoldModel): InternalRow = {
    val s = text.toString
    val len = s.length
    var nTok = 0L
    var nBig = 0L
    var s64 = 0L
    var prev = -1L // mapped code of the previous token, -1 = none yet
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        val mc = mapCode(MinHashes.tokenCode(s, start, i), m.vocab)
        if (prev >= 0) {
          val k = (prev << (CodeBits + 1)) | mc
          val cbi = m.bigram.get(k, 0L)
          val cpre = m.prefix.get(prev, 0L)
          val q = (cpre + m.vPrime) / (cbi + 1L)
          s64 += graft.operators.NgramLm.surprisal64Long(q)
          nBig += 1L
        }
        prev = mc
        nTok += 1L
        start = i + 1
      }
      i += 1
    }
    InternalRow(nTok, nBig, s64)
  }
}
