package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time named SparkEntry queries N times each
  * (first run includes codegen warmup; later runs show steady state).
  *
  *   sbt "runMain graft.Time /root/testdata/sf0.1 3 q21_stream_tumbling d06_lsh_candidates"
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = if (args.length > 2) args.drop(2).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // SPARK_GRAFT_TIME_FULL=1: materialize every OUTPUT column
      // (toRdd) instead of count() — count() lets Catalyst prune
      // expensive projections (e.g. t24's span excision) clean out of
      // the measured plan
      val full = sys.env.get("SPARK_GRAFT_TIME_FULL").contains("1")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (full) df.queryExecution.toRdd.count() else df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-24s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
