package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q36 variants at a given SF dir — pre-aggregated vs
  * joined-then-distinct, sort-merge vs shuffled-hash. */
object TimeJoin {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def li = Tables.load(spark, dir, "lineitem")
    def ord = Tables.load(spark, dir, "orders")
    def preAgg = {
      val perOrder = li.groupBy($"l_orderkey")
        .agg(count(lit(1)).as("__n"),
          sum($"l_extendedprice".cast("decimal(18,2)")).as("__sp"))
      perOrder.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(sum($"__n").as("n"), sum($"__sp").cast("double").as("sum_price"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    }
    def joined = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_price"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"o_orderpriority")
    def time(tag: String, smj: Boolean)(f: => org.apache.spark.sql.DataFrame): Unit = {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", smj.toString)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f.collect(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[tj] $tag%-16s " + ts.map(t => f"$t%.2f").mkString(" "))
    }
    time("preagg-smj", smj = true)(preAgg)
    time("preagg-shj", smj = false)(preAgg)
    time("distinct-smj", smj = true)(joined)
    time("distinct-shj", smj = false)(joined)

    if (args.contains("bucketed")) {
      // the 100 TB layout: pay the orderkey shuffle ONCE at write time
      // (bucketBy+sortBy), then the join runs zero-exchange, zero-sort
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for (tb <- Seq("bj_orders", "bj_lineitem")) {
        spark.sql(s"DROP TABLE IF EXISTS $tb")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"spark-warehouse/$tb"))
      }
      val tw0 = System.nanoTime()
      ord.write.bucketBy(32, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bj_orders")
      li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(32, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bj_lineitem")
      println(f"[tj] bucket-write     ${(System.nanoTime() - tw0) / 1e9}%.2f")
      def bucketed = spark.table("bj_lineitem")
        .join(spark.table("bj_orders"), "o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_price"),
          countDistinct($"o_orderkey").as("n_orders"))
        .orderBy($"o_orderpriority")
      val p = bucketed.queryExecution.executedPlan.toString
      println("[tj] bucketed plan exchanges (post-join aggs only when " +
        "bucketing works): " +
        p.linesIterator.count(_.trim.startsWith("+- Exchange")))
      time("bucketed-smj", smj = true)(bucketed)
    }
    spark.stop()
  }
}
