package graft

import org.apache.spark.sql.functions._

/** Facade semantics against the docs' canonical employees fixture
  * (`/root/reference/docs/.../overview.md`, `queries/select.md`) and the
  * grouped-select pins from `/root/reference/tests/lang.c:2855-2900`. */
class TblSpec extends SparkSpec {
  import spark.implicits._

  private def employees = Tbl(Seq(
    ("Alice", "IT", 75000L, "2021-01-15"),
    ("Bob", "HR", 65000L, "2020-03-20"),
    ("Charlie", "IT", 85000L, "2019-11-30"),
    ("David", "IT", 72000L, "2022-05-10")
  ).toDF("name", "dept", "salary", "hire_date"))

  test("select with where filters rows") {
    val got = employees.select(where = $"salary" > 70000)
    assert(got.cnt == 3)
  }

  test("grouped select: aggregates + headcount (docs golden)") {
    val got = employees.select(
      mappings = Seq("avg_salary" -> avg($"salary"),
        "headcount" -> count(lit(1)),
        "earliest_hire" -> min($"hire_date")),
      by = Seq("dept")).df.orderBy($"dept").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("HR", "IT"))
    val it = got(1)
    assert(math.abs(it.getDouble(1) - (75000 + 85000 + 72000) / 3.0) < 1e-9)
    assert(it.getLong(2) == 3L)
    assert(it.getString(3) == "2019-11-30")
  }

  test("under by, non-aggregate mappings default to first-per-group") {
    val got = employees.select(
      mappings = Seq("n" -> count(lit(1)), "first_name" -> $"name"),
      by = Seq("dept")).df.orderBy($"dept").collect()
    assert(got(0).getString(got(0).fieldIndex("first_name")) == "Bob")
    assert(got(1).getString(got(1).fieldIndex("first_name")) == "Alice")
  }

  test("select(by) with no mappings = first row per group, all columns") {
    val got = employees.select(by = Seq("dept")).df.orderBy($"dept").collect()
    assert(got.length == 2)
    assert(got(1).getString(got(1).fieldIndex("name")) == "Alice") // first IT row
    assert(got(1).getLong(got(1).fieldIndex("salary")) == 75000L)
  }

  test("where runs before by; take after aggregation") {
    val got = employees.select(
      mappings = Seq("n" -> count(lit(1))),
      where = $"salary" > 70000,
      by = Seq("dept"))
    assert(got.df.collect().map(_.getLong(1)).sum == 3L) // HR filtered out
    val taken = employees.select(
      mappings = Seq("n" -> count(lit(1))), by = Seq("dept"), take = 1)
    assert(taken.cnt == 1)
  }

  test("update rewrites only where-matching rows") {
    val got = employees.update(
      Seq("salary" -> ($"salary" + 1000)), where = $"dept" === "IT")
      .df.orderBy($"name").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(76000L, 65000L, 86000L, 73000L))
  }

  test("insert appends; delete removes matching rows") {
    val extra = Seq(("Eve", "QA", 60000L, "2023-01-01"))
      .toDF("name", "dept", "salary", "hire_date")
    val t2 = employees.insert(extra)
    assert(t2.cnt == 5)
    val t3 = t2.delete($"dept" === "QA")
    assert(t3.cnt == 4)
  }

  test("meta reports schema; xasc/xdesc sort") {
    assert(employees.meta ==
      Seq("name" -> "string", "dept" -> "string",
        "salary" -> "bigint", "hire_date" -> "string"))
    val top = employees.xdesc("salary").df.collect().head
    assert(top.getString(0) == "Charlie")
  }

  test("isAggregate detects both DSL and SQL-string aggregates") {
    assert(Tbl.isAggregate(sum($"x")))
    assert(Tbl.isAggregate(expr("sum(x)")))
    assert(Tbl.isAggregate(round(avg($"x"), 2)))
    assert(!Tbl.isAggregate($"x"))
    assert(!Tbl.isAggregate($"x" + 1))
  }
}
