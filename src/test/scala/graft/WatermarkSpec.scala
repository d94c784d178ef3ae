package graft

import org.apache.spark.sql.functions._

/** Watermarks + late data — a Structured Streaming capability the
  * reference lacks entirely (its insert-loop has no late-data notion):
  * rows older than the watermark are dropped, closed windows emit
  * exactly once in append mode. */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("late rows behind the watermark are dropped; windows emit once") {
    val dir = "/tmp/graft_test_watermark"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def write(tsSecs: Long*): Unit =
      tsSecs.map(s => Tuple1(new java.sql.Timestamp(s * 1000)))
        .toDF("ts").write.mode("append").parquet(dir)

    write(5L, 8L) // window [0,10): 2 events
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))))
      .parquet(dir)
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "10 seconds"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("wm_test").start()
    try {
      q.processAllAvailable()
      // batch 2 advances the watermark past the first window's end
      write(35L)
      q.processAllAvailable()
      // batch 3: a LATE row for the closed [0,10) window + an advancer
      write(2L, 45L)
      q.processAllAvailable()
      val rows = spark.table("wm_test")
        .select(unix_timestamp($"window.start").as("w"), $"n")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // [0,10) emitted exactly once with n=2 — the late ts=2 row did NOT
      // reopen or re-emit it
      assert(rows.get(0L).contains(2L), s"got $rows")
      assert(spark.table("wm_test")
        .filter(unix_timestamp($"window.start") === 0L).count() == 1)
    } finally q.stop()
  }
}
