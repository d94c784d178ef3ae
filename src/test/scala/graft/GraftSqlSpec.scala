package graft

/** SQL surface: the function library registered into the session
  * (reference `loadfn` parity) and queried via spark.sql text. */
class GraftSqlSpec extends SparkSpec {

  test("registered functions evaluate from SQL text") {
    Graft.enableSql(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  euclid_div(-7, 2) AS ed, euclid_mod(-7, 2) AS em,
        |  xbar(100, 1234) AS xb""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == -4L)
    assert(r.getLong(2) == 1L)
    assert(r.getInt(3) == 1200)
  }

  test("bootstrap registers tables for SQL use") {
    Graft.bootstrap(spark, sf)
    val n = spark.sql("SELECT COUNT(*) FROM lineitem").collect().head.getLong(0)
    assert(n > 0)
  }
}
