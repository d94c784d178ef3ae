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
      "(select {d: (/ x 2) b: (xbar x 4) w: (within x [0 10]) " +
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

  test("update: where-gated rewrite (docs/queries/update.md example)") {
    val emp = Seq(("Alice", "IT", 75000.0), ("Bob", "HR", 65000.0),
      ("Charlie", "IT", 85000.0)).toDF("name", "dept", "salary")
    val got = Rayfall.query(
      "(update {salary: (* salary 1.1) from: emp where: (> salary 70000)})",
      Map("emp" -> emp)).orderBy($"name")
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    val want = Seq(("Alice", 82500.0), ("Bob", 65000.0), ("Charlie", 93500.0))
    got.zip(want).foreach { case ((n, v), (wn, wv)) =>
      assert(n == wn && math.abs(v - wv) < 1e-6) }
  }

  test("update by: aggregates over filtered rows broadcast per group") {
    val t = Seq(("a", 1L, 10.0), ("a", 5L, 20.0), ("b", 2L, 30.0),
      ("b", 9L, 40.0)).toDF("k", "v", "p")
    // max(p) within group over rows with v>1 only; assigned to those rows
    val got = Rayfall.query(
      "(update {p: (max p) from: t by: k where: (> v 1)})", Map("t" -> t))
      .orderBy($"k", $"v").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(10.0, 20.0, 40.0, 40.0))
  }

  test("update by: dict form groups on multiple columns") {
    val t = Seq(("a", "x", 1.0), ("a", "x", 3.0), ("a", "y", 5.0))
      .toDF("k1", "k2", "p")
    val got = Rayfall.query(
      "(update {p: (sum p) from: t by: {k1: k1 k2: k2}})", Map("t" -> t))
      .orderBy($"k2", $"p").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(4.0, 4.0, 5.0))
  }

  test("insert aligns reordered columns by name (examples/insert.rfl)") {
    val t = Seq((1L, "a")).toDF("id", "name")
    val rows = Seq(("b", 2L)).toDF("name", "id")
    val got = Rayfall.query("(insert t rows)",
      Map("t" -> t, "rows" -> rows)).orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("upsert merges on the first n columns (examples/update.rfl)") {
    val a = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val b = Seq((2L, 99.0), (3L, 30.0)).toDF("id", "v")
    val got = Rayfall.query("(upsert a 1 b)", Map("a" -> a, "b" -> b))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("window-join / window-join1: interval aggregation, bound forms") {
    val trades = Seq(("A", 100L, 1.0), ("A", 200L, 2.0)).toDF("sym", "ts", "price")
    val quotes = Seq(("A", 90L, 9.0), ("A", 100L, 8.0), ("A", 110L, 7.0),
      ("A", 205L, 5.0)).toDF("sym", "ts", "bid")
    // inclusive [ts-10, ts+10]: trade@100 sees 90,100,110 -> min 7.0... bid min = 7.0
    val incl = Rayfall.query(
      "(window-join1 [sym ts] [-10 10] trades quotes {lo: (min bid) n: (count bid)})",
      Map("trades" -> trades, "quotes" -> quotes))
      .orderBy($"ts").collect()
    assert(incl.map(_.getDouble(3)).toSeq == Seq(7.0, 5.0))
    assert(incl.map(_.getLong(4)).toSeq == Seq(3L, 1L))
    // window-join (jtype 0, kdb wj): prevailing row + (lo, hi].
    // trade@100 → prevailing quote@90 + {100, 110} = 3 rows;
    // trade@200 → prevailing quote@110 + {205} = 2 rows, min bid 5.0
    val wj0 = Rayfall.query(
      "(window-join [sym ts] [-10 10] trades quotes " +
        "{n: (count bid) lo: (min bid)})",
      Map("trades" -> trades, "quotes" -> quotes))
      .orderBy($"ts").collect()
    assert(wj0.map(_.getLong(3)).toSeq == Seq(3L, 2L))
    assert(wj0.map(_.getDouble(4)).toSeq == Seq(7.0, 5.0))
    // the docs' map-left interval construction is accepted too
    val viaMapLeft = Rayfall.query(
      "(window-join1 [sym ts] (map-left + [-10 10] (at trades 'ts)) " +
        "trades quotes {n: (count bid)})",
      Map("trades" -> trades, "quotes" -> quotes))
    assert(viaMapLeft.count() == 2)
  }

  test("(meta t) returns the schema as rows") {
    val t = Seq((1L, "a", 2.5)).toDF("id", "name", "score")
    val got = Rayfall.query("(meta t)", Map("t" -> t))
      .orderBy($"idx").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("id", "bigint"), ("name", "string"),
      ("score", "double")))
  }

  test("alter applies a binary fn to a table column (docs/queries/alter.md)") {
    val trades = Seq((100L, 50L), (200L, 60L)).toDF("price", "volume")
    val plus = Rayfall.query("(alter trades + 'price 10)",
      Map("trades" -> trades)).orderBy($"volume")
      .collect().map(_.getLong(0))
    assert(plus.toSeq == Seq(110L, 210L))
    val set = Rayfall.query("(alter trades set 'price 0)",
      Map("trades" -> trades)).collect().map(_.getLong(0))
    assert(set.toSeq == Seq(0L, 0L))
  }

  test("(as 'TYPE x) casts follow the §1.2 type table") {
    val t = Seq((3.9, "42")).toDF("d", "s")
    val got = Rayfall.query(
      "(select {i: (as 'I64 d) n: (as 'I64 s) c: (as 'C8 d) b: (as 'B8 1) from: t})",
      Map("t" -> t)).collect().head
    assert(got.getLong(0) == 3L)   // trunc toward zero
    assert(got.getLong(1) == 42L)  // string -> i64
    assert(got.getString(2) == "3.9")
    assert(got.getBoolean(3))
  }

  test("distinct / xasc / xdesc / take table forms") {
    val t = Seq(("b", 1L), ("a", 2L), ("b", 1L)).toDF("k", "v")
    assert(Rayfall.query("(distinct t)", Map("t" -> t)).count() == 2)
    assert(Rayfall.query("(take 2 t)", Map("t" -> t)).count() == 2)
    assert(Rayfall.query("(take 2 (xasc [k] t))", Map("t" -> t)).count() == 2)
    intercept[IllegalArgumentException](
      Rayfall.query("(take -1 t)", Map("t" -> t)))
    val asc = Rayfall.query("(xasc [k v] t)", Map("t" -> t))
      .collect().map(_.getString(0))
    assert(asc.head == "a")
    val desc = Rayfall.query("(xdesc [k] t)", Map("t" -> t))
      .collect().map(_.getString(0))
    assert(desc.head == "b")
  }
}
