package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CONTENT-DEFINED CHUNKING (the rsync/LBFS boundary trick,
  * Muthitacharoen et al. 2001): a chunk boundary falls wherever the
  * rolling polynomial hash of the last `w` code points hits a mask, so
  * boundaries are a function of LOCAL CONTENT, not position — an
  * insertion or deletion re-chunks only its neighborhood and every
  * chunk past it re-aligns on the same boundaries. That is the dedup
  * signal fixed-stride shingles and line/paragraph scopes both miss:
  * shifted duplicate content (a quoted article behind a changed
  * preamble) shares its chunk fingerprints verbatim.
  *
  * Deliberately BASIC CDC — no FastCDC min/max chunk bounds: the
  * boundary predicate is position-local, which is exactly what makes
  * it (a) embarrassingly parallel and (b) engine-replayable as a
  * per-position SQL predicate (a min-size skip carries sequential
  * state across the whole document). Degenerate inputs can therefore
  * produce tiny or huge chunks; the census downstream is
  * frequency-bounded either way.
  *
  * Hash: h_i = Σ_{j=0..w-1} cp(i−j)·B^j mod M over code points, with
  * B = 257 and M = 2^31 − 1 (prime; every operand ≤ 2^21·M < 2^63 —
  * no overflow in either engine). Boundary after position i (1-based,
  * i ≥ w) iff h_i mod 2^maskBits == 0; the end of text is always a
  * boundary. Computed incrementally here, as the closed-form sum in
  * the DuckDB replay — mathematically the same residue.
  *
  * Unit = code point (the [[graft.operators.Bpe.toSyms]] convention;
  * the documented grapheme-cluster caveat of DuckDB's
  * `string_split(s, '')` applies identically and NFC-normalized input
  * is unaffected). */
case class CdcChunks(child: Expression, w: Int, maskBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && w >= 1 &&
        maskBits >= 1 && maskBits <= 30)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_chunks expects (string, w >= 1, maskBits in [1, 30]), " +
          s"got ${child.dataType}, w=$w, maskBits=$maskBits")

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], w, maskBits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunks.compute($c, $w, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression)
      : CdcChunks = copy(child = newChild)
}

object CdcChunks {
  val B = 257L
  val M = 2147483647L // 2^31 − 1, prime

  /** The chunk list of `text` (empty for an empty string). */
  def compute(text: UTF8String, w: Int, maskBits: Int): GenericArrayData = {
    val s = text.toString
    val div = 1L << maskBits
    // B^{w-1} mod M for the outgoing code point
    var bw = 1L
    var j = 1
    while (j < w) { bw = bw * B % M; j += 1 }
    // one walk: code points + their char offsets
    val cps = new java.util.ArrayList[Integer]()
    val offs = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps.add(cp)
      offs.add(i)
      i += Character.charCount(cp)
    }
    offs.add(s.length)
    val n = cps.size
    val out = new java.util.ArrayList[AnyRef]()
    var h = 0L
    var start = 0 // code-point index of the current chunk's first cp
    var p = 0
    while (p < n) {
      // entering: h = hash of the window ending at p−1; slide first
      // (drop cp(p−w)·B^{w−1}), then absorb cp(p). Equals the closed
      // form Σ cp(p−j)·B^j mod M the oracle computes per position.
      if (p >= w)
        h = Math.floorMod(h - cps.get(p - w).toLong * bw % M, M)
      h = (h * B + cps.get(p).toLong) % M
      if (p >= w - 1 && h % div == 0L) {
        out.add(UTF8String.fromString(
          s.substring(offs.get(start), offs.get(p + 1))))
        start = p + 1
      }
      p += 1
    }
    if (start < n)
      out.add(UTF8String.fromString(s.substring(offs.get(start), s.length)))
    new GenericArrayData(out.toArray)
  }

  def chunks(c: Column, w: Int, maskBits: Int): Column =
    ColumnInternals.column(CdcChunks(ColumnInternals.expr(c), w, maskBits))
}
