package graft

import graft.rayfall.Rayfall

/** The interactive REPL surface (reference `app/repl.c`): persistent
  * env, multi-line forms, error recovery, table display — driven by
  * piping commands through stdin exactly as `graft.Run <sfDir>` does. */
class ReplSpec extends SparkSpec {

  private def drive(lines: String*): String = {
    val in = new java.io.BufferedReader(new java.io.StringReader(
      lines.mkString("\n") + "\n"))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bos, true, "UTF-8")
    val tables = Map("lineitem" -> Tables.load(spark, sf, "lineitem"))
    Rayfall.repl(spark, tables, in, out, prompt = false)
    bos.toString("UTF-8")
  }

  test("bindings persist across inputs; each form's value prints") {
    val got = drive("(set x 41)", "(+ x 1)")
    val lines = got.linesIterator.toSeq
    assert(lines.contains("42"), s"got:\n$got")
  }

  test("a multi-line form evaluates once the parens balance") {
    val got = drive("(+ 1", "   2)")
    assert(got.linesIterator.contains("3"), s"got:\n$got")
  }

  test("an error prints and the session keeps going") {
    val got = drive("(raise \"boom\")", "(* 6 7)")
    assert(got.contains("boom"), s"got:\n$got")
    assert(got.linesIterator.contains("42"), s"got:\n$got")
  }

  test("a table result prints the reference's box layout: borders, " +
      "name + type header rows, footer (table_fmt_into, format.c:1039)") {
    val got = drive(
      "(select {n: (count l_quantity) from: lineitem by: l_returnflag})")
    assert(got.contains("l_returnflag"), s"got:\n$got")
    val lines = got.linesIterator.toSeq
    assert(lines.exists(_.startsWith("┌")), s"got:\n$got")
    assert(lines.exists(_.startsWith("└")), s"got:\n$got")
    // the type header row under the names
    assert(lines.exists(l => l.contains("SYMBOL") && l.contains("I64")),
      s"got:\n$got")
    // 3 return flags at this SF → footer says so
    assert(got.contains("3 rows (3 shown) 2 columns (2 shown)"),
      s"got:\n$got")
  }

  test("the table renderer: head/tail split with the ┆ … ┆ marker past " +
      "20 rows, hidden-column gutter past 10 columns, aligned borders") {
    val spark0 = spark
    import spark0.implicits._
    val big = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "name")
    val t = Rayfall.tableText(big)
    val lines = t.linesIterator.toSeq
    assert(t.contains("50 rows (20 shown) 2 columns (2 shown)"), t)
    assert(lines.count(_.startsWith("│")) == 2 + 20 + 1,
      s"names+types+20 data+footer:\n$t") // bordered rows
    assert(lines.exists(_.startsWith("┆")), s"missing-rows marker:\n$t")
    // head half is ids 1..10, tail half ids 41..50 (format.c:1118-1146)
    assert(t.contains(" 1 ") && t.contains(" 50 "), t)
    assert(!t.contains(" 25 "), s"middle rows must be elided:\n$t")
    // every border row has the same display width
    val widths = lines.map(l => l.codePointCount(0, l.length)).toSet
    assert(widths.size <= 2, s"ragged layout (widths $widths):\n$t")
    // 12 columns → 10 shown + the … gutter
    val wide = Seq((1 to 12).map(_.toLong)).map(s =>
      (s(0), s(1), s(2), s(3), s(4), s(5), s(6), s(7), s(8), s(9), s(10),
        s(11))).toDF((1 to 12).map(i => s"c$i"): _*)
    val tw = Rayfall.tableText(wide)
    assert(tw.contains("12 columns (10 shown)"), tw)
    assert(tw.linesIterator.exists(_.endsWith(" … │")), tw)
    // uncapped mode renders everything
    val full = Rayfall.tableText(big, replCaps = false)
    assert(full.contains("50 rows (50 shown)"), full)
    assert(!full.linesIterator.exists(_.startsWith("┆")), full)
  }

  test("script (show t) prints the UNCAPPED box table (ray_show = full " +
      "without limits, format.c:1499); println stays compact") {
    val (_, printed) = Rayfall.scriptCapture(spark,
      "(set t (table [k v] (list [a b] [1 2]))) (show t) (println t)")
    assert(printed.contains("┌"), printed)
    assert(printed.contains("2 rows (2 shown) 2 columns (2 shown)"),
      printed)
    assert(printed.contains("table[k v]"), printed) // the println form
  }
}
