package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * The reference engine's on-disk formats (splayed/parted tables,
  * `/root/reference/core/io.c:1194`, `core/vary.c:176-391`) map to columnar
  * Parquet; loading is a plain `spark.read.parquet`, which gives the
  * vectorized reader, column pruning and predicate pushdown for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-(session, dir, table, source-stamp) memo of the LOADED PLAN
    * (the unresolved parquet relation + the ts reinterpret) — NOT of
    * any result: every action on the returned DataFrame still scans
    * the parquet. `spark.read.parquet` pays ~50-80 ms of driver-side
    * work per call (file listing, footer/schema read, data-source
    * resolution); a bench rep of a 5-table join paid that five times
    * over, and at 100 TB the same per-call cost is a full directory
    * listing of a large table (guide §6 — the file-listing cache
    * argument, here for path reads). Keyed on sessionUUID (Datasets
    * are session-bound — the q55 trap) + the source mtime stamp so a
    * driver-side testdata regeneration in a long-lived JVM
    * self-invalidates. Lifecycle (weak sessions, stamp supersede, LRU
    * cap) lives in the ONE memo home, operators.ArtifactMemo.Memo
    * (r19 consolidation — MemoSpec pins the contract). */
  private val loadMemo =
    new graft.operators.ArtifactMemo.Memo[DataFrame](cap = 64)

  /** Load one table from a scale-factor directory.
    *
    * `events.ts` is kept as LongType epoch-nanoseconds everywhere
    * downstream (the reference's TIMESTAMP is an i64 ns count,
    * `/root/reference/core/chrono.c`). Earlier testdata generations wrote
    * parquet TIMESTAMP(NANOS), which `nanosAsLong` surfaced as that long
    * directly; the current generation writes TIMESTAMP(µs), so the long
    * is reconstructed at load — a codegen reinterpret (`MicrosAsNanos`:
    * Catalyst's internal timestamp value IS µs-since-epoch, and the UTC
    * session tz makes the NTZ reading an instant), exact because no
    * sub-µs data ever existed at µs physical resolution. A production
    * deployment would store the i64 directly and keep parquet min/max
    * pushdown on `ts`; this shim trades that pushdown on one column for
    * compatibility with the driver's generator.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    loadMemo(spark, path, graft.operators.ArtifactMemo.stampPath(path))(
      loadFresh(spark, path, name))
  }

  private def loadFresh(spark: SparkSession, path: String,
                        name: String): DataFrame = {
    val df = spark.read.parquet(path)
    if (name == "events" &&
        (df.schema("ts").dataType == TimestampType ||
         df.schema("ts").dataType == TimestampNTZType)) {
      // ts-range predicates over the reinterpret regain parquet
      // row-group pruning via the inference rule (NanosFilterInference)
      graft.plans.NanosFilterInference.ensureInstalled(spark)
      df.withColumn("ts",
        graft.functions.TsExprs.microsAsNanos(col("ts")))
    } else df
  }

  /** Register every table as a temp view (for spark.sql usage). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
