package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for shardShuffle sizing: times the shard+rank plan over a
  * documents dir at each given nShards, full-output materialized (the
  * rank is the whole cost — count() would prune it). nShards=1 routes
  * every row through ONE sorting task (the skew worst case): Spark's
  * window sort spills instead of OOMing, so the probe shows graceful
  * degradation, not failure.
  *
  *   sbt "runMain graft.TimeShard /tmp/docs100x 64,8,1"
  */
object TimeShard {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val shardCounts =
      (if (args.length > 1) args(1) else "64,8,1").split(",").map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id").cache()
    val n = docs.count()
    println(s"rows: $n")
    for (s <- shardCounts; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      operators.Sampling.shardShuffle(docs, "doc_id", s)
        .queryExecution.toRdd.foreach(_ => ())
      val t1 = System.nanoTime()
      println(f"nShards=$s%-6d rep$rep ${(t1 - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
