package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Reinterpret a parquet TIMESTAMP(µs) column as epoch-nanosecond i64 —
  * the engine's TIMESTAMP convention (the reference's i64 ns count,
  * `/root/reference/core/chrono.c`; SURVEY §1.2).
  *
  * Catalyst stores BOTH timestamp types as a µs-since-epoch long; with
  * the session timezone pinned to UTC (every entry point in this repo),
  * the NTZ wall-clock reading and the instant reading coincide, so the
  * conversion is a bare `* 1000L` passthrough inside whole-stage
  * codegen. The SQL route — `unix_micros(cast(ts AS timestamp))` — pays
  * a per-row java.time zone lookup for the NTZ→instant cast: measured
  * 2× on the 100× as-of join (q11 0.58 s → 0.30 s floor at 10M events).
  */
case class MicrosAsNanos(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case TimestampType | TimestampNTZType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"micros_as_nanos expects a timestamp input, got $t")
    }

  override def nullSafeEval(v: Any): Any = v.asInstanceOf[Long] * 1000L

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c * 1000L")

  override protected def withNewChildInternal(
      newChild: Expression): MicrosAsNanos = copy(child = newChild)
}

object TsExprs {
  /** Epoch-ns long from a timestamp column (UTC session; see above). */
  def microsAsNanos(c: Column): Column =
    ColumnInternals.column(MicrosAsNanos(ColumnInternals.expr(c)))
}
