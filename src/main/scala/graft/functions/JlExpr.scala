package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Johnson–Lindenstrauss random projection (Achlioptas 2003's
  * database-friendly ±1 form): out_j = Σ_i s(i,j)·v_i with Rademacher
  * signs s(i,j) ∈ {+1, −1} drawn DETERMINISTICALLY from integer hash
  * arithmetic — no stored projection matrix, no randomness to replay:
  * the "matrix" is a formula both engines evaluate identically, and the
  * DuckDB oracle unrolls the same left-associated ± chains term by term
  * (`signPositive` decides each term's sign at SQL-generation time).
  *
  *   s(i,j) = +1  iff  ((i·K₀ + j·K₁) mod P) mod 2 = 0
  *
  * with P = `Text.minhashPrime` (2^31 − 1) and K = `NgramHashes.keys`
  * (< 2^32, so i·K₀ + j·K₁ stays far inside i64 for any sane dim).
  * The per-dim sum is the strict ascending-i left-assoc IEEE chain —
  * `s += ±v_i` here, `0.0 + v[1] - v[2] …` in the generated SQL: the
  * exact same op sequence, so projections are bit-identical
  * cross-engine (the s05/s07 correctly-rounded-chain rule).
  *
  * This is the ANN scale path's third leg next to SQ8 (same bits,
  * fewer dims) and PQ (codebooks): 64 → 16 dims cuts every downstream
  * distance scan 4× with distortion O(√(log n / d')) — and the
  * projection itself is ONE narrow codegen map, no shuffle, no model
  * artifact to manage.
  */
case class JlProject(child: Expression, dOut: Int) extends UnaryExpression {
  require(dOut >= 1 && dOut <= 64, s"jl dOut $dOut outside 1..64")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jl_project expects array<double>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    JlProject.project(input.asInstanceOf[ArrayData], dOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JlProject.project($c, $dOut)")

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

object JlProject {
  private val P: Long = Text.minhashPrime
  private val K0: Long = NgramHashes.keys(0)
  private val K1: Long = NgramHashes.keys(1)

  /** Sign of input dim i in output dim j — the ONE home of the formula
    * (the probe below and the oracle SQL generator both call it). */
  def signPositive(i: Int, j: Int): Boolean =
    ((i.toLong * K0 + j.toLong * K1) % P) % 2 == 0

  def project(v: ArrayData, dOut: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](dOut)
    var j = 0
    while (j < dOut) {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) KernelChecks.nullElem("jl_project", "vector", i)
        val x = v.getDouble(i)
        s += (if (signPositive(i, j)) x else -x)
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }
}

object JlExpr {
  /** Column: the dOut-dim projection of an array<double> vector. */
  def jlProject(vec: Column, dOut: Int): Column =
    ColumnInternals.column(JlProject(ColumnInternals.expr(vec), dOut))

  /** The projection of input dim count dIn to output dim j as a DuckDB
    * SQL term chain over a 1-INDEXED DOUBLE[] expression — the replay
    * of [[JlProject.project]]'s per-dim loop, signs folded at
    * generation time. */
  def projectionSql(vec: String, dIn: Int, j: Int): String =
    (0 until dIn).map { i =>
      val op = if (JlProject.signPositive(i, j)) "+" else "-"
      s"$op $vec[${i + 1}]"
    }.mkString("0.0 ", " ", "")
}
