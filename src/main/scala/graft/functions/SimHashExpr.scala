package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash in ONE pass over the tokens.
  *
  * Semantically identical to `Text.simhash16Expr` — bit j of the
  * signature is set when the majority of whitespace tokens have bit j
  * set in their `Text.tokenCodeSql` code — but that form is a stack of
  * CodegenFallback higher-order functions (aggregate/zip_with per row).
  * Here the 16 bit-counts fold in a single token scan. Token and code
  * semantics match `MinHashes` (split-on-' ' with trailing empties,
  * code-point polynomial).
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash16 expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  def compute(text: UTF8String): Long = {
    val s = text.toString
    val counts = new Array[Long](16)
    var nTokens = 0L
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val code = tokenCode(s, start, i)
        var j = 0
        while (j < 16) {
          counts(j) += (code >> j) & 1L
          j += 1
        }
        nTokens += 1
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 16) {
      if (2L * counts(j) > nTokens) sig += 1L << j
      j += 1
    }
    sig
  }

  private def tokenCode(s: String, from: Int, until: Int): Long = {
    var cpLen = 0L
    var code = 0L
    var i = from
    var mult = 1L
    while (i < until) {
      val cp = s.codePointAt(i)
      if (cpLen < 3) { code += mult * cp; mult *= 31L }
      cpLen += 1
      i += Character.charCount(cp)
    }
    code + 29791L * cpLen
  }
}

/** 64-bit-space SimHash (63 active bits), one pass over the tokens —
  * the production dedup width (16-bit blocking keys, hamming ≤ 3 over 4
  * chunks is pigeonhole-exact; see Dedup.simhashNearDup64).
  *
  * Token codes are four 16-bit polynomial lanes packed into one BIGINT:
  * lane k uses multiplier m_k ∈ {31, 37, 41, 43} as
  * (cp0 + m·cp1 + m²·cp2 + m³·len) mod 2^16 — lane 0 is exactly the
  * 16-bit convention (`Text.tokenCodeSql`), lane 3 keeps 15 bits so the
  * packed code (and thus the signature) never sets the sign bit: both
  * engines' signed BIGINTs then agree without unsigned-wrap emulation,
  * which DuckDB BIGINT arithmetic cannot express (it errors on
  * overflow). Bit 63 is constantly 0 on both sides — hamming distances
  * and blocking are unaffected. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private final val Mults = Array(31L, 37L, 41L, 43L)

  def compute(text: UTF8String): Long = {
    val s = text.toString
    val counts = new Array[Long](63)
    var nTokens = 0L
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val code = tokenCode64(s, start, i)
        var j = 0
        while (j < 63) {
          counts(j) += (code >> j) & 1L
          j += 1
        }
        nTokens += 1
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 63) {
      if (2L * counts(j) > nTokens) sig += 1L << j
      j += 1
    }
    sig
  }

  private def tokenCode64(s: String, from: Int, until: Int): Long = {
    // first 3 codepoints + codepoint length, like the 16-bit convention
    var cp0 = 0L; var cp1 = 0L; var cp2 = 0L
    var cpLen = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      if (cpLen == 0) cp0 = cp
      else if (cpLen == 1) cp1 = cp
      else if (cpLen == 2) cp2 = cp
      cpLen += 1
      i += Character.charCount(cp)
    }
    var code = 0L
    var k = 0
    while (k < 4) {
      val m = Mults(k)
      val lane = (cp0 + m * cp1 + m * m * cp2 + m * m * m * cpLen) %
        (if (k == 3) 32768L else 65536L)
      code |= lane << (16 * k)
      k += 1
    }
    code
  }
}

object SimHashExpr {
  /** Codegen'd 16-bit SimHash of a string column, one token scan. */
  def simhash16(text: Column): Column =
    ColumnInternals.column(SimHash16(ColumnInternals.expr(text)))

  /** Codegen'd 64-bit-space SimHash (63 active bits), one token scan. */
  def simhash64(text: Column): Column =
    ColumnInternals.column(SimHash64(ColumnInternals.expr(text)))
}
