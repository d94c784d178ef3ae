package graft

import org.apache.spark.sql.SparkSession

/** r18 optimization probe: split each query's wall time into
  * (fn-build, planning-to-physical, execution) per rep — tells plan-/
  * driver-bound queries apart from genuinely execution-bound ones.
  *
  *   sbt "runMain graft.TimeOpt /root/testdata/sf0.1 3 q35_groupby_wide ..."
  */
object TimeOpt {
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
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val rows = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+plan
        val t2 = System.nanoTime()
        // count() matches the Bench methodology this probe steers; for
        // folded/narrow-map plans count() PRUNES the scoring projection
        // (the round-12 54ms-lie lesson) — set SPARK_GRAFT_TIME_FULL=1
        // to materialize every output column instead
        if (sys.env.get("SPARK_GRAFT_TIME_FULL").contains("1"))
          df.queryExecution.toRdd.count()
        else df.count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val s = rows.map { case (b, p, e) =>
        f"b=$b%.2f p=$p%.2f e=$e%.2f" }.mkString("  ")
      println(f"[opt] $name%-28s $s")
    }
    spark.stop()
  }
}
