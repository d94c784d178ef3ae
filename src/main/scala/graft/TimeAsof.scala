package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: window-rewrite vs merge-exec as-of join, same shape as
  * q11 (events at the given SF). */
object TimeAsof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = Tables.load(spark, sfDir, "events")
    val left = e.filter($"event_type".isin("click", "view"))
    val right = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value".as("purchase_value"))
    def time(tag: String)(f: => Long): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[asof] $tag%-8s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    time("window") {
      operators.AsofJoin.asofJoin(left, right, Seq("user_id"), "ts").count()
    }
    time("merge") {
      operators.AsofJoin.asofJoinMerge(left, right, Seq("user_id"), "ts").count()
    }
    spark.stop()
  }
}
