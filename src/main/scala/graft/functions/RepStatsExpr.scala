package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition signals in ONE pass over the text: the
  * fraction of word-bigram instances that are repeats of an earlier
  * bigram, and the share of the single most frequent bigram. Highly
  * repetitive documents (boilerplate, keyword stuffing, generation
  * loops) score high on both; the thresholds in the Gopher/MassiveText
  * filtering rules are exactly these fractions.
  *
  * Bigrams travel as the i64 hashes of `NgramHashes` (one tokenize +
  * hash pass, no gram strings) — collisions, if any, are deterministic
  * and replayed bit-identically by the DuckDB oracle via
  * `Text.duck.ngramHashSql`, so counts still hash-match. Returns
  * `struct<dup: double, top: double, nbig: int>`:
  *
  *   - dup  = (nbig − distinct bigrams) / nbig, 0.0 when nbig = 0
  *   - top  = max bigram count / nbig,          0.0 when nbig = 0
  *   - nbig = token count − 1 (split(' ') semantics, empty tokens kept)
  *
  * Integer counts + one double division each, so the doubles are
  * bit-exact against any engine computing the same counts.
  */
case class RepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepStats.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rep_stats expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RepStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

object RepStats {
  val schema: StructType = StructType(Seq(
    StructField("dup", DoubleType, nullable = false),
    StructField("top", DoubleType, nullable = false),
    StructField("nbig", IntegerType, nullable = false)))

  def compute(text: UTF8String): InternalRow = {
    val grams = NgramHashes.gramHashes(text.toString, 2)
    val nbig = grams.length
    if (nbig == 0) return InternalRow(0.0, 0.0, 0)
    val counts = new java.util.HashMap[Long, Int](nbig * 2)
    var topc = 0
    var i = 0
    while (i < nbig) {
      val c = counts.merge(grams(i), 1, (a, b) => a + b)
      if (c > topc) topc = c
      i += 1
    }
    val ndist = counts.size()
    InternalRow((nbig - ndist).toDouble / nbig, topc.toDouble / nbig, nbig)
  }
}

object RepStatsExpr {
  def repStats(text: Column): Column =
    ColumnInternals.column(RepStats(ColumnInternals.expr(text)))

  /** Fraction of bigram instances that repeat an earlier bigram. */
  def dupBigramFrac(text: Column): Column = repStats(text).getField("dup")

  /** Share of the most frequent bigram among all bigram instances. */
  def topBigramFrac(text: Column): Column = repStats(text).getField("top")
}
