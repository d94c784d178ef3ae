package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, LongType}

/** High-precision INTEGER log2 for the HLL linear-counting correction:
  * floor(log2(v) · 2^K) by the classic shift-and-square algorithm —
  * K = 14 result fraction bits over an F = 29-bit fixed-point mantissa
  * (y² < 2^62 stays inside i64). Pure integer shifts and multiplies,
  * so the DuckDB oracle replays the IDENTICAL K-step chain as
  * materialized CTEs (`Hll.censusSqlFrom`) and the result hash-matches
  * bit-for-bit.
  *
  * Accuracy: per-step truncation ≤ 2^−F relative doubles per squaring
  * → mantissa error ≈ 2^(K+1−F) = 2^−14, plus the 2^−K output
  * quantization — total ≤ ~0.0002 bits. The LC estimate
  * m·log2(m/V)·ln2 then carries ≤ ~0.15 absolute error at m = 2^16,
  * far inside linear counting's own standard error (the reason the
  * coarser 1/64-bit `NgramLm.surprisal64` can NOT drive LC: its
  * 0.086-bit interpolation error, multiplied by m·ln2, is ~60 counts
  * at m = 1024).
  *
  * Domain: v ≥ 1 (returns 0 for v ≤ 0 — callers gate on V > 0). */
case class HllLog2Fx(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_log2fx expects a bigint input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HllLog2Fx.log2Fx(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllLog2Fx.log2Fx($c)")

  override protected def withNewChildInternal(
      newChild: Expression): HllLog2Fx = copy(child = newChild)
}

object HllLog2Fx {
  /** Result fraction bits. */
  val K = 14
  /** Fixed-point mantissa bits (y² < 2^(2F+4) must fit i64). */
  val F = 29

  /** floor-ish(log2(v) · 2^K) — the ONE scalar home of the chain; the
    * Column form codegens a call to it and the DuckDB replay unrolls
    * the same K steps. 0 for v ≤ 0. */
  def log2Fx(v: Long): Long = {
    if (v <= 0L) return 0L
    val b = 63 - java.lang.Long.numberOfLeadingZeros(v)
    var y = (v << F) >> b // mantissa in [2^F, 2^(F+1))
    var l = 0L
    var i = 0
    while (i < K) {
      y = (y * y) >> F
      if (y >= (1L << (F + 1))) { y >>= 1; l = 2 * l + 1 }
      else l = 2 * l
      i += 1
    }
    (b.toLong << K) + l
  }

  def log2Fx(c: Column): Column =
    ColumnInternals.column(HllLog2Fx(ColumnInternals.expr(c)))
}
