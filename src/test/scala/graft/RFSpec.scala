package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.RF

/** Semantics pinned by the reference's golden tests
  * (`/root/reference/tests/lang.c`): Euclidean division on negatives,
  * div-by-zero → null, xbar bucketing, glob matching. */
class RFSpec extends SparkSpec {
  import spark.implicits._

  test("euclidean division matches reference: (/ [10 -10 3] 2) = [5 -5 1]") {
    val df = Seq(10L, -10L, 3L).toDF("a")
      .select(RF.euclidDiv($"a", lit(2L)).as("d"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(5L, -5L, 1L))
  }

  test("euclidean division floors toward -inf: -7/2 = -4, rem sign follows divisor") {
    val df = Seq((-7L, 2L), (7L, -2L), (-7L, -2L)).toDF("a", "b")
      .select(RF.euclidDiv($"a", $"b").as("d"), RF.euclidMod($"a", $"b").as("m"))
    assert(df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((-4L, 1L), (-4L, -1L), (3L, -1L)))
  }

  test("division by zero yields null, not error") {
    val df = Seq((1L, 0L)).toDF("a", "b").select(RF.euclidDiv($"a", $"b").as("d"))
    assert(df.collect().head.isNullAt(0))
  }

  test("xbar buckets down, exact on long values past 2^53") {
    val big = 1700000000123456789L
    val df = Seq(big, 17L, -3L).toDF("x")
      .select(RF.xbar(lit(1000000000L), $"x").as("b"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(1700000000000000000L, 0L, -1000000000L))
  }

  test("glob like: * ? [set] translate correctly") {
    val df = Seq("apple", "apply", "ample", "brass").toDF("s")
    def m(p: String) =
      df.filter(RF.likeGlob($"s", p)).collect().map(_.getString(0)).toSet
    assert(m("app*") == Set("apple", "apply"))
    assert(m("a?ple") == Set("ample", "apple"))
    assert(m("appl[ey]") == Set("apple", "apply"))
    assert(m("*ss") == Set("brass"))
  }

  test("dev is population stddev: dev [1 2] = 0.5") {
    val df = Seq(1.0, 2.0).toDF("x").agg(RF.dev($"x").as("d"))
    assert(math.abs(df.collect().head.getDouble(0) - 0.5) < 1e-12)
  }

  test("round is half away from zero: round [-1.5 1.5] = [-2 2]") {
    val df = Seq(-1.5, 1.5).toDF("x").select(round($"x").as("r"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(-2.0, 2.0))
  }
}
