package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn-GATED credit-card redaction — a regex alone over-redacts
  * (order numbers, tracking ids); the industry rule is "card-shaped
  * AND Luhn-valid". A regex cannot compute Luhn, so this is a codegen
  * Expression: extract card-shaped candidates (4-4-4-1..4 digit
  * groups, `-`/space separators, word-bounded), keep those whose
  * 13..19 digits pass the Luhn checksum, and string-replace every
  * occurrence of each valid candidate with `<CARD>`.
  *
  * REPLAY CONTRACT (what the DuckDB oracle mirrors via
  * regexp_extract_all → list_filter(luhn) → list_reduce(replace), see
  * [[PiiExpr.cardRedactDuckSql]]): the replacement is a LITERAL
  * string replace of each valid candidate over the whole text — not a
  * positional splice — so both engines transform identically even in
  * the degenerate case where a valid candidate's text also occurs at
  * a position the regex did not match. `<CARD>` contains no digit, so
  * replacements can never create new candidates. */
case class RedactCards(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"redact_cards expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PiiExpr.redactCardsCompute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PiiExpr.redactCardsCompute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): RedactCards = copy(child = newChild)
}

object PiiExpr {
  /** Card-shaped candidate: 4-4-4-1..4 digit groups, optional `-` or
    * space separators, word-bounded (13–16 digits). Java ∩ RE2. */
  val cardRe = "\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{1,4}\\b"

  private val cardPat = java.util.regex.Pattern.compile(cardRe)

  /** The Luhn checksum over a pure digit string (true = valid). */
  def luhnValid(digits: String): Boolean = {
    if (digits.length < 13 || digits.length > 19) return false
    var sum = 0
    var i = digits.length - 1
    var second = false
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (second) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }

  /** One scalar home of the redaction (the Expression codegens a call
    * to it). */
  def redactCardsCompute(text: UTF8String): UTF8String = {
    val s = text.toString
    val m = cardPat.matcher(s)
    var out = s
    var found: List[String] = Nil
    while (m.find()) {
      val cand = m.group(0)
      if (!found.contains(cand) &&
          luhnValid(cand.replaceAll("[- ]", ""))) found = cand :: found
    }
    // first-occurrence order (matches the oracle's list order); the
    // list is reversed because it was built head-first
    found.reverse.foreach(c => out = out.replace(c, "<CARD>"))
    if (out eq s) text else UTF8String.fromString(out)
  }

  def redactCards(c: Column): Column =
    ColumnInternals.column(RedactCards(ColumnInternals.expr(c)))

  /** The DuckDB replay of [[redactCardsCompute]] over SQL fragment
    * `x`: extract candidates, Luhn-filter via a list comprehension
    * (the digit string ds is position-indexed from the right for the
    * doubling rule), literal-replace each valid candidate. */
  def cardRedactDuckSql(x: String): String = {
    val ds = s"(regexp_replace(c, '[- ]', '', 'g'))"
    val luhn =
      s"length($ds) BETWEEN 13 AND 19 AND " +
        s"list_sum([CASE WHEN (length($ds) - i) % 2 = 1 " +
        s"THEN (CAST($ds[i] AS INT) * 2) % 10 " +
        s"+ (CAST($ds[i] AS INT) * 2) // 10 " +
        s"ELSE CAST($ds[i] AS INT) END " +
        s"FOR i IN range(1, length($ds) + 1)]) % 10 = 0"
    s"list_reduce(list_prepend($x, " +
      s"list_filter(regexp_extract_all($x, '$cardRe'), c -> $luhn)), " +
      s"(a, b) -> replace(a, b, '<CARD>'))"
  }
}
