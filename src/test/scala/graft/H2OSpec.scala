package graft

import org.apache.spark.sql.functions._

/** The published H2O group-by queries (reference benchmark surface)
  * through the Rayfall front-end — results pinned against the native
  * DataFrame equivalents on the deterministic G1 generator. */
class H2OSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = H2O.g1(spark, 100000L).cache()

  test("Q1 sum v1 by id1 equals the native aggregation") {
    val viaRayfall = rayfall.Rayfall.query(H2O.queries.head._2, Map("t" -> t))
      .orderBy($"id1").collect().map(r => (r.getString(0), r.getLong(1)))
    val native = t.groupBy($"id1").agg(sum($"v1").as("v1"))
      .orderBy($"id1").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaRayfall.toSeq == native.toSeq)
    assert(viaRayfall.length == 100)
  }

  test("Q6 max-min range composes aggregates inside one expression") {
    val got = rayfall.Rayfall.query(H2O.queries(5)._2, Map("t" -> t))
    val native = t.groupBy($"id3")
      .agg((max($"v1") - min($"v2")).as("range_v1_v2"))
    assert(got.count() == native.count())
    val g = got.orderBy($"id3").limit(5).collect().map(_.getInt(1))
    val n = native.orderBy($"id3").limit(5).collect().map(_.getInt(1))
    assert(g.toSeq == n.toSeq)
  }

  test("Q7 six-key grouping with map-count group sizes") {
    val got = rayfall.Rayfall.query(H2O.queries(6)._2, Map("t" -> t))
    assert(got.columns.toSeq ==
      Seq("id1", "id2", "id3", "id4", "id5", "id6", "v3", "count"))
    // group sizes sum back to the row count
    val total = got.agg(sum($"count")).collect().head.getLong(0)
    assert(total == 100000L)
  }
}
