package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming parity (SURVEY.md §2.10). The reference "streams" by
  * repeatedly `insert`ing into live tables from timers/IPC callbacks and
  * journaling appends for replay (`/root/reference/core/update.c:414`,
  * `core/chrono.c:361`, `examples/journal.rfl`). Structured Streaming
  * covers that surface: file/rate sources are the insert feed, tumbling
  * `window()` aggregation is `xbar`+`by:`, checkpoints are the journal,
  * and watermarks handle late data (a capability the reference lacks).
  */
object Streams {

  /** Micro-batch ingest of a parquet directory as a stream (the
    * insert-driven live table), tumbling-window aggregated, materialized
    * to an in-memory table. Synchronous: processes everything available,
    * then returns the aggregate as a DataFrame.
    *
    * tsCol must be a TimestampType column; windows are `windowSec` wide.
    */
  def tumblingCounts(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                     tsCol: String, keyCol: String, valueCol: String,
                     windowSec: Int, queryName: String,
                     prep: DataFrame => DataFrame = identity): DataFrame = {
    val stream = prep(spark.readStream.schema(schemaFrom.schema).parquet(srcDir))
    val agg = stream
      .groupBy(window(col(tsCol), s"$windowSec seconds"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
