package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Quality-scoring statistics in ONE pass over the text — the numbers
  * behind `Text.punctRatio` / `Text.stopwordRatio` / `Text.qualityScore`,
  * whose `Column` forms each re-scan the document (a regex replace and a
  * CodegenFallback stopword filter per doc). Returns
  * `struct<punct: double, stop: double, ntok: int>` with the ratios
  * computed by the IDENTICAL double arithmetic (count casts + one
  * division), so downstream formulas stay bit-exact with the HOF forms
  * and the DuckDB oracle:
  *
  *   - punct = (# chars in `.,!?;:`) / (# codepoints), 0.0 on empty text
  *   - stop  = (# whitespace tokens in the 10-stopword set) / (# tokens)
  *     (split(' ') semantics: empty tokens count, case-sensitive match)
  */
case class QualityStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QualityStats.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quality_stats expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    QualityStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityStats =
    copy(child = newChild)
}

object QualityStats {
  val schema: StructType = StructType(Seq(
    StructField("punct", DoubleType, nullable = false),
    StructField("stop", DoubleType, nullable = false),
    StructField("ntok", IntegerType, nullable = false)))

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Text.stopwords.foreach(s.add)
    s
  }

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val len = s.length
    var cp = 0      // codepoints (Spark's length())
    var punct = 0
    var nTok = 0
    var nStop = 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        nTok += 1
        if (stopSet.contains(s.substring(start, i))) nStop += 1
        start = i + 1
        if (i < len) cp += 1 // the space itself
        i += 1
      } else {
        val c = s.codePointAt(i)
        if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' ||
          c == ':') punct += 1
        cp += 1
        i += Character.charCount(c)
      }
    }
    val punctRatio = if (cp == 0) 0.0 else punct.toDouble / cp
    val stopRatio = if (nTok == 0) 0.0 else nStop.toDouble / nTok
    InternalRow(punctRatio, stopRatio, nTok)
  }
}

object QualityExpr {
  import org.apache.spark.sql.functions._

  def qualityStats(text: Column): Column =
    ColumnInternals.column(QualityStats(ColumnInternals.expr(text)))

  /** `Text.punctRatio` off the one-pass stats. */
  def punctRatio(text: Column): Column = qualityStats(text).getField("punct")

  /** `Text.stopwordRatio` off the one-pass stats. */
  def stopwordRatio(text: Column): Column = qualityStats(text).getField("stop")

  /** `Text.qualityScore` off the one-pass stats — the SAME Column
    * arithmetic over the three stats, so doubles stay bit-exact. */
  def qualityScore(text: Column): Column = {
    val st = qualityStats(text)
    RF.roundBin(
      lit(0.4) * least(lit(1.0), st.getField("ntok").cast("double") / 100) +
        lit(0.3) * (lit(1.0) - st.getField("punct")) +
        lit(0.3) * (lit(1.0) - st.getField("stop")), 4)
  }
}
