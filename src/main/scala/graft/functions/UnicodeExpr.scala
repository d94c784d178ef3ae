package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) — the text
  * preprocessing stage every crawl pipeline runs before tokenization:
  * a decomposed "e + U+0301" and a precomposed "é" are the SAME text
  * but different
  * bytes, so without normalization they hash apart in every dedup,
  * census, and tokenizer table. NFC is pinned by the Unicode standard
  * (canonical composition is stable across versions for assigned code
  * points), so `java.text.Normalizer` here and DuckDB's
  * `nfc_normalize` produce identical bytes — the oracle replays
  * byte-for-byte. Deliberately NFC (not NFKC): compatibility mappings
  * (ligatures, width variants) are lossy and corpus-policy, not
  * canonicalization.
  *
  * Scale shape: a narrow per-row codegen map; the common all-ASCII
  * row short-circuits via `Normalizer.isNormalized` without
  * allocating. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    ColumnInternals.column(NfcNormalize(ColumnInternals.expr(c)))
}
