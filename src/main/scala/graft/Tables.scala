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
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
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
