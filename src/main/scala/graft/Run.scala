package graft

import org.apache.spark.sql.SparkSession

/** Command-line Rayfall runner — the REPL-ish user surface:
  *
  *   sbt "runMain graft.Run /root/testdata/sf0.001 \
  *     (select {n: (count l_quantity) from: lineitem by: l_returnflag})"
  *
  * Accepts either an inline form, a multi-form SCRIPT with
  * `(set name …)` bindings and `(table …)` literals, or a path to a
  * `.rfl` script file. With only `<sfDir>`, starts the interactive
  * REPL (the reference's `app/repl.c` surface): persistent bindings,
  * multi-line forms, EOF to exit.
  */
object Run {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1,
      "usage: Run <sfDir> [rayfall query | script.rfl]   (no query = REPL)")
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
    // surface the invocation to scripts as the reference's (args) dict
    rayfall.Rayfall.setCliArgs(
      if (args.length == 1) Seq("-i")
      else if (args(1).endsWith(".rfl")) Seq("-f", args(1))
      else Seq.empty)
    if (args.length == 1) {
      rayfall.Rayfall.repl(spark, tables,
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
        System.out)
    } else {
      val src =
        if (args.length == 2 && args(1).endsWith(".rfl"))
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(args(1))))
        else args.drop(1).mkString(" ")
      rayfall.Rayfall.script(spark, src, tables)
        .show(50, truncate = false)
    }
    spark.stop()
  }
}
