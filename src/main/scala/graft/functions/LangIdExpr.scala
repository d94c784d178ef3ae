package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-word language ID in ONE pass over the tokens — semantically
  * identical to `Text.langId` (lowercase, whitespace tokens, per-language
  * marker votes, argmax with fixed en/de/es/fr priority, 'unknown' on
  * zero hits), but the `Column` form stacks four CodegenFallback
  * `filter` lambdas that each re-scan the token array.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lang_id expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    LangId.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangId.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {
  private val langs = Array("en", "de", "es", "fr")
  // marker sets are pairwise disjoint → one token→language map
  private val markerLang: java.util.HashMap[String, java.lang.Integer] = {
    val m = new java.util.HashMap[String, java.lang.Integer]()
    Seq(Seq("the", "and", "of", "to", "is"),
      Seq("der", "die", "und", "das", "ist"),
      Seq("el", "la", "que", "los", "por"),
      Seq("le", "les", "des", "est", "une"))
      .zipWithIndex.foreach { case (ws, i) => ws.foreach(w => m.put(w, i)) }
    m
  }
  private val unknown = UTF8String.fromString("unknown")
  private val langU = langs.map(UTF8String.fromString)

  def compute(text: UTF8String): UTF8String = {
    // UTF8String.toLowerCase == Spark's lower(); split on single spaces
    val s = text.toLowerCase.toString
    val votes = new Array[Int](4)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val lang = markerLang.get(s.substring(start, i))
          if (lang != null) votes(lang.intValue()) += 1
        }
        start = i + 1
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < 4) { if (votes(j) > votes(best)) best = j; j += 1 }
    if (votes(best) == 0) unknown else langU(best)
  }
}

object LangIdExpr {
  /** Codegen'd marker-vote language ID, one token scan. */
  def langId(text: Column): Column =
    ColumnInternals.column(LangId(ColumnInternals.expr(text)))
}
