package graft

import org.apache.spark.sql.SparkSession

/** Command-line Rayfall runner — the REPL-ish user surface:
  *
  *   sbt "runMain graft.Run /root/testdata/sf0.001 \
  *     (select {n: (count l_quantity) from: lineitem by: l_returnflag})"
  */
object Run {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Run <sfDir> <rayfall query>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Tables.all
      .map(n => n -> Tables.load(spark, args(0), n)).toMap
    rayfall.Rayfall.query(args.drop(1).mkString(" "), tables)
      .show(50, truncate = false)
    spark.stop()
  }
}
