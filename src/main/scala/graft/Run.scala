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
      // on a real TTY: the app/term.c line editor (raw mode via stty —
      // the JVM analog of term_create's termios setup); piped stdin
      // falls back to the line-oriented REPL (the oneshot mode)
      if (System.console() != null &&
          sys.env.getOrElse("SPARK_GRAFT_PLAIN_REPL", "0") != "1") {
        def stty(modes: String*): Unit =
          try new ProcessBuilder((Seq("stty") ++ modes): _*)
            .redirectInput(ProcessBuilder.Redirect.INHERIT)
            .start().waitFor()
          catch { case _: Exception => () }
        stty("raw", "-echo")
        // CWD-relative like the reference's hist_create (term.c:56) —
        // a per-project history file, not a global $HOME one
        try rayfall.Rayfall.termRepl(spark, tables, System.in, System.out,
          Some(java.nio.file.Paths.get(".rayhist.dat")))
        finally { stty("sane"); System.out.println() }
      } else rayfall.Rayfall.repl(spark, tables,
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
