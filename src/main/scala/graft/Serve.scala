package graft

import org.apache.spark.sql.SparkSession

/** IPC server entry point — the `rayforce -p 5101` surface
  * (`/root/reference/app/main.c`, `core/ipc.c`):
  *
  *   sbt "runMain graft.Serve /root/testdata/sf0.001 5101 [init.rfl]"
  *
  * Serves the script evaluator over TCP with the testdata tables
  * pre-bound; clients connect with `(hopen "host:5101")` and call with
  * `(write h (list 'f args…))` — see `examples/ipc.rfl`. The optional
  * init script binds server-side functions and the `.z.po`/`.z.pc`
  * connection callbacks. */
object Serve {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Serve <sfDir> <port> [init.rfl]")
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
    val init =
      if (args.length > 2)
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(args(2))))
      else ""
    rayfall.Rayfall.setCliArgs(Seq("-p", args(1)) ++
      (if (args.length > 2) Seq("-f", args(2)) else Seq.empty))
    val server = rayfall.Rayfall.serveIpc(spark, args(1).toInt, tables, init)
    println(s"[serve] listening on port ${server.port}")
    Thread.currentThread().join() // serve until killed
  }
}
