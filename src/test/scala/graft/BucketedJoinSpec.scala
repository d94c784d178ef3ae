package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled, co-located storage for repeated big joins —
  * the 100 TB pattern where the join key's shuffle is paid once at write
  * time instead of per query. Asserts the join plan has NO Exchange on
  * the bucketed sides. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      // the catalog is per-session but the warehouse dir outlives the
      // JVM — clear stale locations from earlier runs
      for (t <- Seq("b_orders", "b_lineitem"))
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"spark-warehouse/$t"))
      Tables.load(spark, sf, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.load(spark, sf, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(400))
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n${plan.take(800)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("merge-exec asof join on bucketed tables runs with NO shuffle") {
    // The scale story for AsofJoinExec: it *declares* ClusteredDistribution
    // on the keys, so bucketed children satisfy it from storage — the
    // shuffle is paid once at write time, like the reference's parted
    // tables pre-sorted by (sym, ts).
    for (tb <- Seq("b_trades", "b_quotes")) {
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"spark-warehouse/$tb"))
    }
    val e = Tables.load(spark, sf, "events")
    e.filter($"event_type".isin("click", "view"))
      .write.bucketBy(8, "user_id").sortBy("user_id", "ts")
      .mode("overwrite").saveAsTable("b_trades")
    e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value".as("purchase_value"))
      .write.bucketBy(8, "user_id").sortBy("user_id", "ts")
      .mode("overwrite").saveAsTable("b_quotes")

    val joined = operators.AsofJoin.asofJoinMerge(
      spark.table("b_trades"), spark.table("b_quotes"),
      Seq("user_id"), "ts")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(400))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n${plan.take(800)}")
    // result equals the window-rewrite on the same inputs
    val viaWindow = operators.AsofJoin.asofJoin(
      spark.table("b_trades"), spark.table("b_quotes"),
      Seq("user_id"), "ts")
      .orderBy($"event_id").collect()
      .map(r => (r.getLong(r.fieldIndex("event_id")),
        Option(r.get(r.fieldIndex("purchase_value")))))
    val viaMerge = joined.orderBy($"event_id").collect()
      .map(r => (r.getLong(r.fieldIndex("event_id")),
        Option(r.get(r.fieldIndex("purchase_value")))))
    assert(viaMerge.toSeq == viaWindow.toSeq)
  }
}
