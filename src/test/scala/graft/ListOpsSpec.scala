package graft

import org.apache.spark.sql.functions._

/** Remaining §2.8 list/generation surface: raze (flatten), enlist,
  * unify/diverse analogs, til/rand/guid. */
class ListOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column) =
    Seq(1).toDF("d").select(c.as("v")).collect().head

  test("raze flattens nested vectors (compose.c:1096)") {
    val nested = array(array(lit(1), lit(2)), array(lit(3)))
    assert(one(flatten(nested)).getSeq[Int](0) == Seq(1, 2, 3))
  }

  test("enlist wraps scalars into a vector (compose.c:364)") {
    assert(one(array(lit(1), lit(2), lit(3))).getSeq[Int](0) == Seq(1, 2, 3))
  }

  test("diverse/unify: typed array <-> rows round-trip via explode/collect") {
    val df = Seq((1L, Seq(10, 20, 30))).toDF("id", "xs")
    val exploded = df.select($"id", explode($"xs").as("x"))
    assert(exploded.count() == 3)
    val back = exploded.groupBy($"id")
      .agg(sort_array(collect_list($"x")).as("xs"))
      .collect().head.getSeq[Int](1)
    assert(back == Seq(10, 20, 30))
  }

  test("til: 0..n-1 (compose.c:70)") {
    val got = spark.range(5).toDF("i").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("rand: n draws below bound, deterministic under a fixed seed") {
    val a = spark.range(100).select(rand(42).as("r")).collect().map(_.getDouble(0))
    val b = spark.range(100).select(rand(42).as("r")).collect().map(_.getDouble(0))
    assert(a.toSeq == b.toSeq)
    assert(a.forall(x => x >= 0.0 && x < 1.0))
  }

  test("guid: uuid() yields RFC-shaped distinct ids (compose.c:343)") {
    val ids = spark.range(10).select(expr("uuid()").as("u"))
      .collect().map(_.getString(0))
    assert(ids.distinct.length == 10)
    assert(ids.forall(_.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
  }
}
