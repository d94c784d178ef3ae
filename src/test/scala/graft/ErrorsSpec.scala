package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** Error-handling parity (reference try/raise + ERROR objects with
  * informative messages, `/root/reference/core/error.c`): failures are
  * typed exceptions naming the offending symbol, catchable with
  * scala.util.Try. */
class ErrorsSpec extends SparkSpec {
  import spark.implicits._

  test("unknown column raises AnalysisException naming the column") {
    val df = Seq((1, 2)).toDF("a", "b")
    val e = intercept[AnalysisException](df.select($"nope").collect())
    assert(e.getMessage.contains("nope"))
  }

  test("Rayfall errors name the failing construct") {
    val e1 = intercept[IllegalArgumentException](
      rayfall.Rayfall.query("(select {x: 1})", Map()))
    assert(e1.getMessage.contains("from"))
    val e2 = intercept[IllegalArgumentException](
      rayfall.Rayfall.query("(select {x: (frobnicate y) from: t})",
        Map("t" -> Seq(1).toDF("y"))))
    assert(e2.getMessage.contains("frobnicate"))
    val e3 = intercept[IllegalArgumentException](
      rayfall.Rayfall.query("(select {x: y from: missing})", Map()))
    assert(e3.getMessage.contains("missing"))
  }

  test("list/insert value forms: no NotImplementedError escapes — every " +
      "malformed shape gets a typed, message-bearing error") {
    // the two historical `???` fallback arms (list-of-atoms and
    // insert-dict-of-atoms) are unreachable by their forall guards, but
    // the surrounding forms must keep failing with TYPED errors, never
    // scala.NotImplementedError
    def typedFailure(script: String): Unit = {
      val r = scala.util.Try(rayfall.Rayfall.scriptValue(spark, script))
      assert(r.isFailure, s"expected failure: $script")
      val e = r.failed.get
      assert(!e.isInstanceOf[NotImplementedError],
        s"NotImplementedError escaped for: $script")
      assert(e.getMessage != null && e.getMessage.nonEmpty)
    }
    typedFailure("(def t (table {a: [1 2]})) (insert t (dict [a] 7))")
    typedFailure("(list 1 (frobnicate 2))")
  }

  test("query-level try: failures are values, successes pass through") {
    val ok = scala.util.Try(Seq(1).toDF("x").select($"x" + 1).collect())
    assert(ok.isSuccess)
    val bad = scala.util.Try(Seq(1).toDF("x").select($"zzz").collect())
    assert(bad.isFailure)
  }
}
