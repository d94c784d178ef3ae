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

  test("a table result prints a header and rows") {
    val got = drive(
      "(select {n: (count l_quantity) from: lineitem by: l_returnflag})")
    assert(got.linesIterator.exists(_.startsWith("l_returnflag")),
      s"got:\n$got")
    // 3 return flags at this SF → header + 3 rows
    assert(got.linesIterator.size >= 4, s"got:\n$got")
  }
}
