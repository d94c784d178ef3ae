package graft

import graft.rayfall.Rayfall
import graft.rayfall.Rayfall._

/** Rayfall front-end: parser shapes and query translation, mirrored on
  * the reference grammar (`/root/reference/core/parse.c`) and the docs'
  * select examples. */
class RayfallSpec extends SparkSpec {
  import spark.implicits._

  private def rint(l: Long): RNum = RNum(0.0, isInt = true, l = l)

  test("parser: atoms, vectors, dicts, quotes, nesting, comments") {
    assert(parse("42") == rint(42))
    assert(parse("-3.5") == RNum(-3.5, isInt = false))
    assert(parse("\"hi there\"") == RStr("hi there"))
    assert(parse("'sym") == RQuote("sym"))
    assert(parse("[1 2 3]") == RVec(List(rint(1), rint(2), rint(3))))
    assert(parse("(+ a 1)") == RList(List(RSym("+"), RSym("a"), rint(1))))
    assert(parse("{x: 1 y: (f z)} ; c") ==
      RDict(List("x" -> rint(1),
        "y" -> RList(List(RSym("f"), RSym("z"))))))
    intercept[IllegalArgumentException](parse("(+ 1 2"))
  }

  test("integer literals above 2^53 keep exact i64 (ns-timestamp range)") {
    // a nanos-as-long timestamp literal; Double would round this lexeme
    assert(parse("1741102907087221025") == rint(1741102907087221025L))
    assert(parse("-1741102907087221025") == rint(-1741102907087221025L))
    val df = Seq(1741102907087221025L, 1741102907087221026L).toDF("ts")
    val got = Rayfall.query(
      "(select {ts: ts from: t where: (> ts 1741102907087221025)})",
      Map("t" -> df)).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1741102907087221026L))
  }

  test("count counts nulls too (reference aggr_count increments unconditionally)") {
    val df = Seq(("a", Some(1L)), ("a", None), ("b", Some(2L)))
      .toDF("k", "v")
    val got = Rayfall.query(
      "(select {n: (count v) from: t by: k})", Map("t" -> df))
      .orderBy($"k").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(2L, 1L))
  }

  test("select with where/by translates to grouped aggregation") {
    val emp = Seq(("Alice", "IT", 75000L), ("Bob", "HR", 65000L),
      ("Charlie", "IT", 85000L)).toDF("name", "dept", "salary")
    val got = Rayfall.query(
      "(select {avg_salary: (avg salary) n: (count salary) " +
        "from: emp where: (> salary 60000) by: dept})",
      Map("emp" -> emp)).orderBy($"dept").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("HR", "IT"))
    assert(got(1).getDouble(1) == 80000.0)
    assert(got(1).getLong(2) == 2L)
  }

  test("scalar shims: euclidean /, xbar, within, like, in") {
    val df = Seq((-7L, "apple"), (9L, "brass")).toDF("x", "s")
    val r = Rayfall.query(
      "(select {d: (/ x 2) b: (xbar 4 x) w: (within x [0 10]) " +
        "l: (like s \"app*\") m: (in x [9 11]) from: t})",
      Map("t" -> df)).collect()
    assert(r(0).getLong(0) == -4L) // floor(-7/2)
    assert(r(0).getLong(1) == -8L) // xbar floors toward -inf
    assert(!r(0).getBoolean(2) && r(1).getBoolean(2))
    assert(r(0).getBoolean(3) && !r(1).getBoolean(3))
    assert(!r(0).getBoolean(4) && r(1).getBoolean(4))
  }

  test("take limits after aggregation; quoted by-symbols accepted") {
    val df = Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("k", "v")
    val got = Rayfall.query(
      "(select {s: (sum v) from: t by: 'k take: 1})", Map("t" -> df))
    assert(got.count() == 1)
  }
}
