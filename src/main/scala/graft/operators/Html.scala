package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StringToColumn
import graft.functions.{HtmlExpr, HtmlExtract, RF}

/** Raw-HTML → clean-text extraction over a corpus (see
  * `functions.HtmlExtract` for the deterministic rule chain). The
  * engine side is ONE narrow codegen map over the scan; the DuckDB
  * oracle replays the identical chain via `cleanChainSql` (the shared
  * builder — the rules have exactly one home per engine and the t56
  * hash compare pins them against each other).
  *
  * 100 TB shape: no shuffle, no model artifact, no driver state —
  * extraction cost is exactly one pass over the scan bytes, and the
  * boilerplate audit columns (n_tags/n_blocks/n_boiler) come from the
  * same pass for free.
  */
object Html {
  /** Adds (`text` cleaned, n_tags, n_blocks, n_boiler, boiler_frac)
    * from `htmlCol`; boiler_frac = roundBin(n_boiler/n_blocks, 4),
    * NULL for tagless-and-empty inputs (n_blocks = 0). */
  def cleanHtml(df: DataFrame, htmlCol: String, textOut: String = "text",
                minWords: Int = 3): DataFrame = {
    val x = HtmlExpr.htmlExtract(col(htmlCol), minWords)
    df.withColumn("__hx", x)
      .withColumn(textOut, $"__hx.text")
      .withColumn("n_tags", $"__hx.n_tags")
      .withColumn("n_blocks", $"__hx.n_blocks")
      .withColumn("n_boiler", $"__hx.n_boiler")
      .withColumn("boiler_frac",
        when($"n_blocks" === 0, lit(null).cast("double"))
          .otherwise(RF.roundBin(
            $"n_boiler".cast("double") / $"n_blocks", 4)))
      .drop("__hx")
  }

  /** DuckDB replay of the HtmlExtract chain. `fromSql` must yield
    * columns `$keepCols` and `html`; emits keepCols + n_tags, n_blocks,
    * n_boiler, boiler_frac, text_len, text. Every stage mirrors one
    * pass of `HtmlExtract.compute` (same patterns, same order, same
    * non-rescanning 'g' semantics). */
  def cleanChainSql(fromSql: String, keepCols: Seq[String],
                    minWords: Int = 3): String = {
    val keep = keepCols.mkString(", ")
    // fromSql is concatenated OUTSIDE the margin template — interpolating
    // it before .stripMargin would re-strip its own `||` continuations
    s"WITH h AS ($fromSql),\n" +
    s"""s1 AS (SELECT $keep, html,
       |  regexp_replace(html, '(?s)<!--.*?-->', '', 'g') AS a FROM h),
       |s2 AS (SELECT *, regexp_replace(a,
       |  '(?is)<script\\b[^>]*>.*?</script[^>]*>', '', 'g') AS b FROM s1),
       |s3 AS (SELECT *, regexp_replace(b,
       |  '(?is)<style\\b[^>]*>.*?</style[^>]*>', '', 'g') AS c FROM s2),
       |s4 AS (SELECT *, regexp_replace(c,
       |  '(?i)</?(${HtmlExtract.blockNames})\\b[^>]*>', chr(10), 'g') AS d FROM s3),
       |s5 AS (SELECT *, regexp_replace(d, '<[^>]*>', '', 'g') AS e FROM s4),
       |s6 AS (SELECT *, replace(replace(replace(replace(replace(replace(replace(e,
       |  '&lt;','<'), '&gt;','>'), '&quot;','"'), '&#39;', chr(39)),
       |  '&apos;', chr(39)), '&nbsp;',' '), '&amp;','&') AS f FROM s5),
       |s7 AS (SELECT *, regexp_replace(f, '[ \\t\\r]+', ' ', 'g') AS g1 FROM s6),
       |s8 AS (SELECT *, regexp_replace(g1, ' *' || chr(10) || ' *',
       |  chr(10), 'g') AS g2 FROM s7),
       |s9 AS (SELECT *, trim(regexp_replace(g2, chr(10) || '+', chr(10), 'g'),
       |  ' ' || chr(10)) AS g3 FROM s8),
       |s10 AS (SELECT *, list_filter(string_split(g3, chr(10)),
       |  x -> x <> '') AS blocks FROM s9),
       |s11 AS (SELECT *, list_filter(blocks,
       |  x -> length(x) - length(replace(x, ' ', '')) + 1 >= $minWords) AS kept
       |  FROM s10)
       |SELECT $keep,
       |  length(html) AS html_len,
       |  len(regexp_extract_all(html, '<[^>]*>')) AS n_tags,
       |  len(blocks) AS n_blocks,
       |  len(blocks) - len(kept) AS n_boiler,
       |  CASE WHEN len(blocks) = 0 THEN NULL
       |       ELSE floor(CAST(len(blocks) - len(kept) AS DOUBLE)
       |                  / len(blocks) * 10000 + 0.5) / 10000 END AS boiler_frac,
       |  length(COALESCE(array_to_string(kept, chr(10)), '')) AS text_len,
       |  COALESCE(array_to_string(kept, chr(10)), '') AS text
       |FROM s11""".stripMargin
  }

  /** Deterministic per-doc HTML page built from the documents table —
    * the t56 fixture corpus (the synthetic testdata has no raw-HTML
    * column, so the page is CONSTRUCTED identically in both engines
    * from doc_id/lang/source/text: head with style+script to drop, a
    * nav list of short boilerplate items, an entity-bearing h1, the
    * doc text split into paragraphs, and a doc_id%4-selected MALFORMED
    * tail — unclosed comment / unclosed script / unknown tag — so the
    * degradation rules run on every fourth doc). Column and SQL forms
    * must stay in lockstep; the oracle's html_len column pins them
    * character-for-character. */
  def stagedHtmlCol(docId: Column, lang: Column, source: Column,
                    text: Column): Column =
    concat(
      lit("<html><!-- doc "), docId.cast("string"),
      lit(" --><head><style type=\"text/css\">p{margin:0;}</style>"),
      lit("<script type=\"text/javascript\">if(a<b){s=\"&amp;\"+"),
      docId.cast("string"), lit(";}</script></head>"),
      lit("<body><div class=\"nav\"><ul><li>Home</li><li>About</li><li>"),
      source, lit("</li></ul></div>"),
      lit("<h1>Doc "), docId.cast("string"), lit(" &lt;"), lang,
      lit("&gt; &amp; corpus</h1>"),
      lit("<p>"), regexp_replace(text, lit(" value "), lit(" </p><p> ")),
      lit("</p>"),
      when(docId % 4 === 0,
        lit("<p>tail &nbsp;&#39;q&#39; &quot;w&quot; &amp;lt;done</p>"))
        .when(docId % 4 === 1, lit("<!-- unclosed comment trail"))
        .when(docId % 4 === 2, lit("<script>var x = 1; // never closed"))
        .otherwise(lit("<em>inline</em> tail with <unknown-tag attr=\"v\">stuff")),
      lit("</body></html>"))

  /** SQL twin of `stagedHtmlCol` (yields doc_id, lang, html). */
  def stagedHtmlSql: String =
    """SELECT doc_id, lang,
      |  '<html><!-- doc ' || doc_id || ' --><head><style type="text/css">p{margin:0;}</style>'
      |  || '<script type="text/javascript">if(a<b){s="&amp;"+' || doc_id || ';}</script></head>'
      |  || '<body><div class="nav"><ul><li>Home</li><li>About</li><li>' || source || '</li></ul></div>'
      |  || '<h1>Doc ' || doc_id || ' &lt;' || lang || '&gt; &amp; corpus</h1>'
      |  || '<p>' || replace(text, ' value ', ' </p><p> ') || '</p>'
      |  || CASE CAST(doc_id % 4 AS INTEGER)
      |       WHEN 0 THEN '<p>tail &nbsp;&#39;q&#39; &quot;w&quot; &amp;lt;done</p>'
      |       WHEN 1 THEN '<!-- unclosed comment trail'
      |       WHEN 2 THEN '<script>var x = 1; // never closed'
      |       ELSE '<em>inline</em> tail with <unknown-tag attr="v">stuff' END
      |  || '</body></html>' AS html
      |FROM documents""".stripMargin
}
