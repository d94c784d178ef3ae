package graft

import java.sql.Date
import graft.rayfall.Rayfall

/** Documentation-as-executable-specification, the reference's own test
  * style (`/root/reference/docs/tests/test_docs.py` replays every docs
  * example through the REPL): the documented queries run verbatim
  * through the Rayfall front-end and must produce the documented
  * outputs (`docs/docs/content/documentation/queries/select.md`,
  * `update.md`, `alter.md`).
  */
class DocsSpec extends SparkSpec {
  import spark.implicits._

  private def employees = Seq(
    ("Alice", "IT", 75000L, Date.valueOf("2021-01-15")),
    ("Bob", "HR", 65000L, Date.valueOf("2020-03-20")),
    ("Charlie", "IT", 85000L, Date.valueOf("2019-11-30")),
    ("David", "IT", 72000L, Date.valueOf("2022-05-10"))
  ).toDF("name", "dept", "salary", "hire_date")

  test("select.md: where + by grouped aggregation") {
    val got = Rayfall.query(
      """(select {avg_salary: (avg salary)
        |         headcount: (count name)
        |         from: employees
        |         where: (> salary 70000)
        |         by: dept})""".stripMargin,
      Map("employees" -> employees)).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "IT")
    assert(math.abs(r.getDouble(1) - 77333.33) < 0.01)
    assert(r.getLong(2) == 3L)
  }

  test("select.md: where filter keeps documented rows") {
    val got = Rayfall.query(
      "(select {name: name salary: salary from: employees where: (> salary 70000)})",
      Map("employees" -> employees))
      .orderBy($"name").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("Alice", 75000L), ("Charlie", 85000L),
      ("David", 72000L)))
  }

  test("select.md: complex condition with and/=") {
    val got = Rayfall.query(
      """(select {name: name salary: salary from: employees
        |  where: (and (= dept 'IT) (>= salary 70000) (<= salary 80000))})"""
        .stripMargin,
      Map("employees" -> employees))
      .orderBy($"name").collect().map(_.getString(0))
    assert(got.toSeq == Seq("Alice", "David"))
  }

  test("select.md: whole-table aggregation row") {
    val r = Rayfall.query(
      """(select {total_salary: (sum salary) avg_salary: (avg salary)
        |  headcount: (count name) from: employees})""".stripMargin,
      Map("employees" -> employees)).collect().head
    assert(r.getLong(0) == 297000L)
    assert(r.getDouble(1) == 74250.0)
    assert(r.getLong(2) == 4L)
  }

  test("select.md: by with min over dates") {
    val got = Rayfall.query(
      """(select {avg_salary: (avg salary) headcount: (count name)
        |  earliest_hire: (min hire_date) from: employees by: dept})"""
        .stripMargin,
      Map("employees" -> employees))
      .orderBy($"dept").collect()
    val hr = got.head; val it = got(1)
    assert(hr.getString(0) == "HR" && hr.getLong(2) == 1L &&
      hr.getDate(3) == Date.valueOf("2020-03-20"))
    assert(it.getString(0) == "IT" &&
      math.abs(it.getDouble(1) - 77333.33) < 0.01 &&
      it.getDate(3) == Date.valueOf("2019-11-30"))
  }

  test("update.md: in-place style rewrite returns documented salaries") {
    val got = Rayfall.query(
      "(update {salary: (* salary 2) from: employees where: (> salary 70000)})",
      Map("employees" -> employees))
      .orderBy($"name").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(150000L, 65000L, 170000L, 144000L))
  }

  test("alter.md: table column alter example") {
    val trades = Seq((100L, 50L), (200L, 60L)).toDF("price", "volume")
    val got = Rayfall.query("(alter trades + 'price 10)",
      Map("trades" -> trades)).orderBy($"volume")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(110L, 210L))
  }
}
