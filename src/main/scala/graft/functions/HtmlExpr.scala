package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Raw-HTML → clean-text extraction — the stage a 100 TB crawl user
  * runs BEFORE anything else in this engine (the reference has no text
  * ops beyond glob/split, core/string.c:417-711; this is north-star
  * pipeline scope). ONE codegen expression, one narrow map over the
  * scan — no shuffle, no UDF, no external parser.
  *
  * The rules are a fixed, deterministic sequential-pass chain, DEFINED
  * by the regex chain below (which is what the t56 DuckDB oracle runs,
  * via `operators.Html.cleanChainSql`, and what the HtmlSpec replica
  * runs through Spark's regexp_replace). The implementation here is
  * hand-rolled scans — each pass is a left-to-right non-rescanning
  * single pass, provably equivalent to its backtracking-free pattern,
  * and ~6× faster than running the regex engines (100× probe in
  * README):
  *
  *   1. drop comments            `(?s)<!--.*?-->`
  *   2. drop script incl. body   `(?is)<script\b[^>]*>.*?</script[^>]*>`
  *   3. drop style  incl. body   (same shape)
  *   4. block-level tags → '\n'  `(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|
  *                                th|table|blockquote|section|article|
  *                                header|footer|pre)\b[^>]*>`
  *   5. all remaining tags → ''  `<[^>]*>`
  *   6. entity decode, fixed order: &lt; &gt; &quot; &#39; &apos;
  *      &nbsp;(→space) then &amp; LAST (so `&amp;lt;` round-trips to
  *      the literal text `&lt;` — standard double-encoding semantics
  *      fall out of plain sequential replace; no replacement text can
  *      complete another entity, so the passes fuse into one scan)
  *   7. whitespace: `[ \t\r]+`→' ', ` *\n *`→'\n', `\n+`→'\n',
  *      trim of ' '/'\n'
  *   8. blocks = non-empty '\n' splits; a block with fewer than
  *      `minWords` words (words = spaces+1, integer arithmetic only)
  *      is BOILERPLATE (nav items, footer links) and is dropped from
  *      `text` but counted
  *
  * Malformed HTML degrades deterministically, never throws: an
  * unclosed comment/script stays literal text for the later passes
  * (exactly what the non-greedy regexes do — the spec pins goldens for
  * each case).
  *
  * Returns `struct<text: string, n_tags: int, n_blocks: int,
  * n_boiler: int>`; n_tags = `<[^>]*>` matches in the ORIGINAL input
  * (a defined audit metric, counted before any removal).
  */
case class HtmlExtract(child: Expression, minWords: Int)
    extends UnaryExpression {

  override def dataType: DataType = HtmlExtract.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"html_extract expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HtmlExtract.compute(input.asInstanceOf[UTF8String], minWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlExtract.compute($c, $minWords)")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)
}

object HtmlExtract {
  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_tags", IntegerType, nullable = false),
    StructField("n_blocks", IntegerType, nullable = false),
    StructField("n_boiler", IntegerType, nullable = false)))

  /** Block-level tag names (shared with the SQL chain builder). */
  val blockNames =
    "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|section|article|header|footer|pre"

  private val blockSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    (Seq("p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
      "blockquote", "section", "article", "header", "footer", "pre") ++
      (1 to 6).map(i => s"h$i")).foreach(s.add)
    s
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Case-insensitive ASCII indexOf of `needle` (lowercase) in s. */
  private def ciIndexOf(s: String, needle: String, from: Int): Int = {
    val n = s.length - needle.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Pass 1 — `(?s)<!--.*?-->` → '' (leftmost-earliest, non-rescan). */
  private def dropComments(s: String): String = {
    var p = s.indexOf("<!--")
    if (p < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (p >= 0) {
      val q = s.indexOf("-->", p + 4)
      if (q < 0) { // no terminator anywhere → no further matches
        out.append(s, i, s.length); return out.toString
      }
      out.append(s, i, p)
      i = q + 3
      p = s.indexOf("<!--", i)
    }
    out.append(s, i, s.length)
    out.toString
  }

  /** Passes 2/3 — `(?is)<name\b[^>]*>.*?</name[^>]*>` → ''. */
  private def dropElement(s: String, name: String): String = {
    val open = "<" + name
    val close = "</" + name
    var p = ciIndexOf(s, open, 0)
    if (p < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0 // copied up to here
    while (p >= 0) {
      val after = p + open.length
      // \b: the char after the name must be a non-word char
      val boundary = after >= s.length || !isWordChar(s.charAt(after))
      var matchedEnd = -1
      if (boundary) {
        val gt = s.indexOf('>', after)
        if (gt >= 0) {
          // lazy body: first `</name` whose `[^>]*>` completes; if the
          // first has no '>' after it, no later one can either
          val r = ciIndexOf(s, close, gt + 1)
          if (r >= 0) {
            val endGt = s.indexOf('>', r + close.length)
            if (endGt >= 0) matchedEnd = endGt + 1
          }
        }
      }
      if (matchedEnd >= 0) {
        out.append(s, i, p)
        i = matchedEnd
        p = ciIndexOf(s, open, i)
      } else {
        // no match at this start — regex advances one char
        p = ciIndexOf(s, open, p + 1)
      }
    }
    out.append(s, i, s.length)
    out.toString
  }

  /** Pass 4 — block-level tags → '\n'. */
  private def blockTagsToNewline(s: String): String = {
    var p = s.indexOf('<')
    if (p < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (p >= 0) {
      var j = p + 1
      if (j < s.length && s.charAt(j) == '/') j += 1
      var k = j
      while (k < s.length && isWordChar(s.charAt(k))) k += 1
      var matched = -1
      if (k > j && blockSet.contains(
          s.substring(j, k).toLowerCase(java.util.Locale.ROOT))) {
        val gt = s.indexOf('>', k)
        if (gt >= 0) matched = gt + 1
      }
      if (matched >= 0) {
        out.append(s, i, p).append('\n')
        i = matched
        p = s.indexOf('<', i)
      } else p = s.indexOf('<', p + 1)
    }
    out.append(s, i, s.length)
    out.toString
  }

  /** Pass 5 — `<[^>]*>` → ''. */
  private def dropTags(s: String): String = {
    var p = s.indexOf('<')
    if (p < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (p >= 0) {
      val gt = s.indexOf('>', p + 1)
      if (gt < 0) { out.append(s, i, s.length); return out.toString }
      out.append(s, i, p)
      i = gt + 1
      p = s.indexOf('<', i)
    }
    out.append(s, i, s.length)
    out.toString
  }

  private val entNames = Array("&lt;", "&gt;", "&quot;", "&#39;", "&apos;",
    "&nbsp;", "&amp;")
  private val entChars = Array('<', '>', '"', '\'', '\'', ' ', '&')

  /** Pass 6 — entity decode. The seven sequential replaces fuse into
    * one scan: at most one entity matches at any position, and no
    * replacement char appears inside an entity string, so no pass can
    * create work for a later one (except &amp;→& which runs LAST and
    * whose output is never rescanned — same here). */
  private def decodeEntities(s: String): String = {
    var p = s.indexOf('&')
    if (p < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (p >= 0) {
      var e = 0
      var hit = -1
      while (e < entNames.length && hit < 0) {
        if (s.regionMatches(p, entNames(e), 0, entNames(e).length)) hit = e
        e += 1
      }
      if (hit >= 0) {
        out.append(s, i, p).append(entChars(hit))
        i = p + entNames(hit).length
        p = s.indexOf('&', i)
      } else p = s.indexOf('&', p + 1)
    }
    out.append(s, i, s.length)
    out.toString
  }

  /** Pass 7 — whitespace normalization + trim, one scan:
    * `[ \t\r]+`→' ', then ` *\n *`→'\n', then `\n+`→'\n', then trim of
    * ' '/'\n'. Equivalent fused form: emit runs of [ \t\r] as one
    * space; on '\n' drop pending spaces and preceding emitted spaces,
    * collapse the newline run (with any interleaved blanks) to one
    * '\n'; drop leading/trailing blank output. */
  private def normalizeWs(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    var pendingSpace = false
    var pendingNl = false
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r') pendingSpace = true
      else if (c == '\n') { pendingNl = true; pendingSpace = false }
      else {
        if (pendingNl) { if (out.length > 0) out.append('\n') }
        else if (pendingSpace && out.length > 0) out.append(' ')
        pendingNl = false; pendingSpace = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  def compute(html: UTF8String, minWords: Int): InternalRow = {
    val s0 = html.toString
    // audit metric on the ORIGINAL string: `<[^>]*>` match count
    var nTags = 0
    var tp = s0.indexOf('<')
    while (tp >= 0) {
      val gt = s0.indexOf('>', tp + 1)
      if (gt < 0) tp = -1
      else { nTags += 1; tp = s0.indexOf('<', gt + 1) }
    }
    var s = dropComments(s0)
    s = dropElement(s, "script")
    s = dropElement(s, "style")
    s = blockTagsToNewline(s)
    s = dropTags(s)
    s = decodeEntities(s)
    s = normalizeWs(s)
    var nBlocks = 0
    var nBoiler = 0
    val kept = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      var j = s.indexOf('\n', i)
      if (j < 0) j = n
      if (j > i) { // non-empty block [i, j)
        nBlocks += 1
        var words = 1
        var k = i
        while (k < j) { if (s.charAt(k) == ' ') words += 1; k += 1 }
        if (words >= minWords) {
          if (kept.length > 0) kept.append('\n')
          kept.append(s, i, j)
        } else nBoiler += 1
      }
      i = j + 1
    }
    InternalRow(UTF8String.fromString(kept.toString), nTags, nBlocks, nBoiler)
  }
}

object HtmlExpr {
  def htmlExtract(html: Column, minWords: Int): Column =
    ColumnInternals.column(
      HtmlExtract(ColumnInternals.expr(html), minWords))
}
