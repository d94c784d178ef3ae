package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.functions.JsonKeyRaw

/** JsonKeyRaw — the codegen twin of `get_json_object(json, '$.k')`
  * (q66/q89/q90's hot-path JSON extraction; the built-in is
  * CodegenFallback). The fuzz pins STRING-level equality against the
  * built-in over 2000 generated JSON-ish inputs (valid, malformed,
  * duplicate keys, every scalar type, nesting, unicode, whitespace) —
  * the long form composes Spark's own `.cast("long")`, so cast
  * semantics need no replica. */
class JsonExprSpec extends SparkSpec {
  import spark.implicits._

  private def both(rows: Seq[String]): Seq[(Option[String], Option[String])] = {
    val df = rows.toDF("j").select(
      JsonKeyRaw.jsonKeyRaw($"j", "k").as("mine"),
      get_json_object($"j", "$.k").as("ref"))
    df.collect().toSeq.map(r =>
      (Option(r.getString(0)), Option(r.getString(1))))
  }

  test("goldens: present/missing/duplicate keys, scalar types, " +
      "malformed JSON, non-object roots") {
    val cases = Seq(
      """{"k": 69}""", """{"k":-3}""", """{"k": 0}""",
      """{"x": 1}""", """{}""", """ {"k":7} """,
      """{"k":"123"}""", """{"k":" 42 "}""", """{"k":"abc"}""",
      """{"k":1.5}""", """{"k":1e2}""", """{"k":true}""",
      """{"k":false}""", """{"k":null}""",
      """{"k":{"a":1}}""", """{"k":[1,2]}""",
      """{"k":1,"k":2}""", """{"k":"a","k":"b"}""",
      """{"k":"a","k":1}""", """{"k":1,"k":"a"}""",
      """{"k":null,"k":2}""", """{"k":null,"k":"a"}""",
      """{"x":{"k":1},"k":9}""", """{"x":[{"k":1}],"k":9}""",
      """{"k":99999999999999999999999}""",
      """{"kk":1}""", """{"K":1}""",
      """{"a":{"k":5}}""", // nested k does NOT match $.k
      """[1,2,3]""", """7""", """"k"""", """not json""",
      """{"k":1""", """{"k":}""", """{'k':1}""", """{"k":012}""",
      """{"k":1,}""", """{k:1}""", "", "   ",
      """{"k":"\u0031\u0032"}""", """{"k":"\" esc"}""",
      """{"k":"日本"}""", """{"日":"x","k":8}""",
      "{\"k\":\"a\tb\"}") // unescaped control char (Hive-compat feature)
    both(cases).zip(cases).foreach { case ((m, r), c) =>
      assert(m == r, s"case: $c  mine=$m ref=$r")
    }
    // and the driver-side compute (the interpreted/eval path) agrees too
    cases.foreach { c =>
      val m = Option(JsonKeyRaw.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(c), "k"))
        .map(_.toString)
      val r = both(Seq(c)).head._2
      assert(m == r, s"compute() case: $c  mine=$m ref=$r")
    }
  }

  test("fuzz: 2000 generated JSON-ish inputs == get_json_object " +
      "byte-for-byte (the HtmlExpr adversarial-concatenation pattern)") {
    val rng = new scala.util.Random(20260818L)
    val keys = Array("k", "kk", "x", "k", "yk", "k")
    val scalars = Array("1", "-7", "0", "69", "123456789012",
      "99999999999999999999999", "1.5", "-0.25", "1e2", "2E-3",
      "true", "false", "null", "\"12\"", "\"abc\"", "\"\"",
      "\" 9 \"", "\"\\\"q\\\"\"", "\"\\u0031\"", "\"日本\"",
      "-0", "0.0")
    def value(depth: Int): String =
      if (depth > 1 || rng.nextInt(4) > 0) scalars(rng.nextInt(scalars.length))
      else if (rng.nextBoolean())
        "{" + (0 until rng.nextInt(3)).map(_ =>
          "\"" + keys(rng.nextInt(keys.length)) + "\":" + value(depth + 1))
          .mkString(",") + "}"
      else
        "[" + (0 until rng.nextInt(3)).map(_ => value(depth + 1))
          .mkString(",") + "]"
    def genValid(): String = {
      val n = rng.nextInt(4)
      val ws = if (rng.nextBoolean()) " " else ""
      "{" + (0 until n).map(_ =>
        ws + "\"" + keys(rng.nextInt(keys.length)) + "\"" + ws + ":" + ws +
          value(0)).mkString(",") + ws + "}"
    }
    val breakers = Array("", "}", "{", "]", ",", "\"", "x", "01", "'",
      " trailing", "{\"k\":", "{\"k\"1}", "{\"k\" 1}")
    val cases = (1 to 2000).map { _ =>
      val base = rng.nextInt(10) match {
        case 0 => breakers(rng.nextInt(breakers.length)) + genValid()
        case 1 => genValid() + breakers(rng.nextInt(breakers.length))
        case 2 => value(0) // non-object root
        case _ => genValid()
      }
      if (rng.nextInt(8) == 0) " " + base + " " else base
    }
    both(cases).zip(cases).foreach { case ((m, r), c) =>
      assert(m == r, s"fuzz case: $c  mine=$m ref=$r")
    }
  }

  test("long form: composes Spark's own ANSI cast — equal values where " +
      "the cast succeeds, equal abort where it cannot") {
    val ok = Seq("""{"k": 69}""", """{"k":-3}""", """{"x":1}""",
      """{"k":"123"}""", "bad json")
    val got = ok.toDF("j").select(
      JsonKeyRaw.jsonLongKey($"j", "k").as("mine"),
      get_json_object($"j", "$.k").cast("long").as("ref"))
      .collect().toSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    got.foreach { case (m, r) => assert(m == r) }
    assert(got.head == ((Some(69L), Some(69L))))
    // non-numeric extraction: BOTH spellings abort (ANSI cast)
    def aborts(c: org.apache.spark.sql.Column): Boolean =
      try { Seq("""{"k":"abc"}""").toDF("j").select(c).collect(); false }
      catch { case _: Throwable => true }
    assert(aborts(JsonKeyRaw.jsonLongKey($"j", "k")))
    assert(aborts(get_json_object($"j", "$.k").cast("long")))
  }

  test("plan: q66/q89 extraction is codegen — no get_json_object " +
      "(CodegenFallback) anywhere in the executed plan") {
    Seq("q66_json_extract", "q89_vwap").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf).queryExecution
        .explainString(FormattedMode)
      assert(!p.contains("get_json_object"),
        s"$q must use the codegen extraction:\n$p")
      assert(p.contains("jsonkeyraw"),
        s"$q must extract via JsonKeyRaw:\n$p")
    }
  }
}
