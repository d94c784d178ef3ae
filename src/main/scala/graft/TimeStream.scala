package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: where does the streaming tumbling query spend time?
  * Prints phase timings + the micro-batch progress breakdown. */
object TimeStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val batch = Tables.load(spark, sfDir, "events")
    val stage = s"/tmp/graft_stream/${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}/events"

    // second arg: comma-separated state-partition widths to probe (the
    // VERDICT-8 floor experiment); each runs 3× to expose the warm floor
    val widths = args.drop(1).headOption.getOrElse("8,8,8").split(",").map(_.toInt)
    for ((w, i) <- widths.zipWithIndex) {
      val t0 = System.nanoTime()
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", w.toString)
      val stream = ss.readStream.schema(batch.schema).parquet(stage)
        .withColumn("ts2", expr("timestamp_micros(ts div 1000)"))
      val agg = stream
        .groupBy(window(col("ts2"), "3600 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      val t1 = System.nanoTime()
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(s"ts_$i").start()
      val t2 = System.nanoTime()
      q.processAllAvailable()
      val t3 = System.nanoTime()
      for (p <- q.recentProgress)
        println(s"[stream] batch=${p.batchId} total=${p.durationMs}")
      q.stop()
      val t4 = System.nanoTime()
      val n = ss.table(s"ts_$i").count()
      val t5 = System.nanoTime()
      def ms(a: Long, b: Long) = (b - a) / 1e6
      println(f"[stream] run$i w=$w build=${ms(t0,t1)}%.0f start=${ms(t1,t2)}%.0f " +
        f"process=${ms(t2,t3)}%.0f stop=${ms(t3,t4)}%.0f collect=${ms(t4,t5)}%.0f ms ($n rows)")
    }
    spark.stop()
  }
}
