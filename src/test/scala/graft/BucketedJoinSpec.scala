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
}
