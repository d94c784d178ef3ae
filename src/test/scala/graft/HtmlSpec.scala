package graft

import org.apache.spark.sql.functions._
import graft.functions.{HtmlExpr, HtmlExtract}
import graft.operators.Html

/** Raw-HTML → clean-text extraction (t56). Goldens cover every
  * malformed-degradation rule; the chain-replica test pins the codegen
  * expression against an INDEPENDENT Spark regexp_replace
  * implementation of the same pass chain over the full staged corpus
  * (the engine-internal twin of the DuckDB oracle). */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String, minWords: Int = 3) = {
    val r = Seq(html).toDF("h")
      .select(HtmlExpr.htmlExtract($"h", minWords).as("x"))
      .select($"x.text", $"x.n_tags", $"x.n_blocks", $"x.n_boiler")
      .collect().head
    (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(0))
  }

  test("goldens: well-formed page, entities, boilerplate dropping") {
    assert(run("<html><!-- c --><head><style>p{x}</style><script>if(a<b)" +
      "{q=\"&amp;\"}</script></head><body><h1>Title here now</h1>" +
      "<p>one two three four</p><ul><li>Nav</li><li>Home</li></ul>" +
      "</body></html>") ==
      ((21, 4, 2, "Title here now\none two three four")))
    // &amp;lt; double-encode round-trips to literal "&lt;"; &nbsp; → space
    assert(run("<p>&amp;lt; double encoded &nbsp; gap &#39;q&#39; " +
      "&quot;w&quot;</p>") ==
      ((2, 1, 0, "&lt; double encoded gap 'q' \"w\"")))
    assert(run("plain text no tags at all") ==
      ((0, 1, 0, "plain text no tags at all")))
    assert(run("") == ((0, 0, 0, "")))
    assert(run("<p>a</p><p>b c</p><p>d e f</p>") == ((6, 3, 2, "d e f")))
    assert(run("<table><tr><td>cell one two</td><td>x</td></tr></table>") ==
      ((8, 2, 1, "cell one two")))
    assert(run("<pre>pre   spaces   kept?</pre>") ==
      ((2, 1, 0, "pre spaces kept?")))
  }

  test("goldens: malformed HTML degrades deterministically, never throws") {
    // unclosed <p>: block tag still breaks, no closing needed
    assert(run("<p>unclosed para word word <em>inline</em> tail") ==
      ((3, 1, 0, "unclosed para word word inline tail")))
    // unclosed comment: stays literal (the non-greedy regex never matches)
    assert(run("<!-- unclosed comment <p>hidden? maybe not") ==
      ((1, 2, 0, "<!-- unclosed comment\nhidden? maybe not")))
    // unclosed script: body surfaces as text, tags strip individually
    assert(run("<script>var x = 1; // never closed <p>after script</p>") ==
      ((3, 2, 1, "var x = 1; // never closed")))
    // unclosed style with a block inside
    assert(run("<style>unclosed style <p>para inside</p> word word") ==
      ((3, 3, 3, "")))
    // script body containing a </style> is still inside the script
    assert(run("<script>nested </style> inside</script>ok word here") ==
      ((3, 1, 0, "ok word here")))
    // lone brackets: `<...>` spans strip, bare text stays
    assert(run("text with < lone bracket and > other") ==
      ((1, 1, 0, "text with other")))
    // the sequential-pass case: block replacement INSIDE a failed outer
    // span happens first, then `<x \n y>` matches the general tag pass
    assert(run("<x <p> y>") == ((1, 0, 0, "")))
    // case-insensitive script/block matching; `<scripts>` is NOT script
    assert(run("<SCRIPT TYPE=\"a\">UPPER</SCRIPT><P>Case insensitive " +
      "block</P>") == ((4, 1, 0, "Case insensitive block")))
    assert(run("<scripts>not a script tag word word</scripts>") ==
      ((2, 1, 0, "not a script tag word word")))
    // attributes spanning whitespace/newlines; self-closing br
    assert(run("<div   class=\"a\"\n id=\"b\">attr  spread</div>") ==
      ((2, 1, 1, "")))
    assert(run("<br/><br />self closing") == ((2, 1, 1, "")))
  }

  test("minWords gates boilerplate; null html → null row; " +
      "boiler_frac NULL when no blocks") {
    assert(run("<p>a b</p><p>c d e</p>", minWords = 2) == ((4, 2, 0, "a b\nc d e")))
    assert(run("<p>a b</p><p>c d e</p>", minWords = 4) == ((4, 2, 2, "")))
    val withNull = Seq(Some("<p>x y z</p>"), None).toDF("h")
    val out = Html.cleanHtml(withNull, "h", textOut = "t")
      .select($"t", $"n_tags", $"boiler_frac").collect()
    assert(out.count(_.isNullAt(0)) == 1)
    val frac = Html.cleanHtml(Seq("<em>hi</em>").toDF("h"), "h", "t")
      .select($"boiler_frac", $"n_blocks").collect().head
    // "hi" is one 1-word block → boiler; frac = 1.0
    assert(frac.getDouble(0) == 1.0 && frac.getInt(1) == 1)
    val zero = Html.cleanHtml(Seq("<p></p>").toDF("h"), "h", "t")
      .select($"boiler_frac", $"n_blocks").collect().head
    assert(zero.isNullAt(0) && zero.getInt(1) == 0)
  }

  test("scan passes == java.util.regex chain on 2000 adversarial " +
      "fragment concatenations (unbalanced tags, nested openers, " +
      "entity shards, whitespace runs)") {
    val frags = Array("<p>", "</p>", "<P >", "<!--", "-->", "<script>",
      "</script>", "<SCRIPT a=b>", "</sCrIpT >", "<style>", "</style>",
      "<div class=\"x\">", "<em>", "</em>", "<", ">", "</", "/>",
      "word", "two words", "&amp;", "&lt;", "&amp;lt;", "&nbsp;", "&#39;",
      "&", ";", " ", "  ", "\n", "\t", "\r\n", "<br/>", "<h3>", "</h3>",
      "<scripts>", "<pre", "e>", "<x <p> y>", "a b c d e", "<td>", "<!-- x")
    val rng = new scala.util.Random(20260815L)
    val pC = java.util.regex.Pattern.compile("(?s)<!--.*?-->")
    val pSc = java.util.regex.Pattern.compile(
      "(?is)<script\\b[^>]*>.*?</script[^>]*>")
    val pSt = java.util.regex.Pattern.compile(
      "(?is)<style\\b[^>]*>.*?</style[^>]*>")
    val pB = java.util.regex.Pattern.compile(
      s"(?i)</?(${HtmlExtract.blockNames})\\b[^>]*>")
    val pT = java.util.regex.Pattern.compile("<[^>]*>")
    def regexChain(h: String): (Int, Int, Int, String) = {
      var nTags = 0
      val m = pT.matcher(h); while (m.find()) nTags += 1
      var s = pC.matcher(h).replaceAll("")
      s = pSc.matcher(s).replaceAll("")
      s = pSt.matcher(s).replaceAll("")
      s = pB.matcher(s).replaceAll("\n")
      s = pT.matcher(s).replaceAll("")
      s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&#39;", "'").replace("&apos;", "'").replace("&nbsp;", " ")
        .replace("&amp;", "&")
      s = s.replaceAll("[ \\t\\r]+", " ").replaceAll(" *\n *", "\n")
        .replaceAll("\n+", "\n")
      var lo = 0; var hi = s.length
      while (lo < hi && (s.charAt(lo) == ' ' || s.charAt(lo) == '\n')) lo += 1
      while (hi > lo && (s.charAt(hi - 1) == ' ' || s.charAt(hi - 1) == '\n')) hi -= 1
      s = s.substring(lo, hi)
      val blocks = s.split("\n", -1).filter(_.nonEmpty)
      val kept = blocks.filter(b => b.count(_ == ' ') + 1 >= 3)
      (nTags, blocks.length, blocks.length - kept.length, kept.mkString("\n"))
    }
    (1 to 2000).foreach { t =>
      val h = (1 to (1 + rng.nextInt(12)))
        .map(_ => frags(rng.nextInt(frags.length))).mkString
      assert(run(h) == regexChain(h), s"case $t: ${h.replace("\n", "\\n")}")
    }
  }

  test("codegen expression == independent Spark regexp_replace replica " +
      "of the pass chain, over the full staged corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val staged = docs.select($"doc_id",
      Html.stagedHtmlCol($"doc_id", $"lang", $"source", $"text").as("html"))
    // the replica: same passes via Spark SQL functions (Java regex),
    // built independently of HtmlExtract.compute
    val nl = "\n"
    val rep = staged
      .withColumn("a", regexp_replace($"html", "(?s)<!--.*?-->", ""))
      .withColumn("b", regexp_replace($"a",
        "(?is)<script\\b[^>]*>.*?</script[^>]*>", ""))
      .withColumn("c", regexp_replace($"b",
        "(?is)<style\\b[^>]*>.*?</style[^>]*>", ""))
      .withColumn("d", regexp_replace($"c",
        s"(?i)</?(${HtmlExtract.blockNames})\\b[^>]*>", nl))
      .withColumn("e", regexp_replace($"d", "<[^>]*>", ""))
      .withColumn("f",
        Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
          "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
          "&amp;" -> "&")
          .foldLeft($"e": org.apache.spark.sql.Column) { case (c, (k, v)) =>
            regexp_replace(c, java.util.regex.Pattern.quote(k),
              java.util.regex.Matcher.quoteReplacement(v))
          })
      .withColumn("g1", regexp_replace($"f", "[ \\t\\r]+", " "))
      .withColumn("g2", regexp_replace($"g1", " *\n *", nl))
      .withColumn("g3",
        regexp_replace(regexp_replace($"g2", "\n+", nl), "^[ \n]+|[ \n]+$", ""))
      .withColumn("blocks", filter(split($"g3", nl, -1), x => x =!= ""))
      .withColumn("kept", filter($"blocks",
        x => length(x) - length(regexp_replace(x, " ", "")) + 1 >= 3))
      .select($"doc_id",
        length($"html").as("html_len"),
        size($"blocks").as("n_blocks"),
        (size($"blocks") - size($"kept")).as("n_boiler"),
        concat_ws(nl, $"kept").as("text"))
    val gotDf = Html.cleanHtml(staged, "html", textOut = "t")
      .select($"doc_id", length($"html").as("html_len"),
        $"n_blocks", $"n_boiler", $"t".as("text"))
    val exp = rep.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    val got = gotDf.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(got.size == exp.size && got.size >= 50)
    got.foreach { case (id, g) =>
      assert(g == exp(id), s"doc $id: $g vs ${exp(id)}")
    }
  }
}
