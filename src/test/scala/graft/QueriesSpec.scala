package graft

/** Every registry query runs at sf0.001 and returns rows with the declared
  * aliases (the driver's DuckDB oracle at sf0.01 is the deep check;
  * scripts/check.py replicates it locally). */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query in the registry executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
