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
    * self-invalidates; the session is held weakly so dead sessions'
    * entries release (the SessionMemo discipline, Queries2Lm.scala). */
  private val loadMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (java.lang.ref.WeakReference[SparkSession], DataFrame)]()

  private def stamp(path: String): Long = {
    val f = new java.io.File(path)
    if (f.isFile) f.getName.hashCode * 31L + f.length + f.lastModified
    else Option(f.listFiles).toSeq.flatten // the ArtifactMemo spelling:
      // name+size+mtime so a deleted non-newest part invalidates too
      .map(c => c.getName.hashCode * 31L + c.length + c.lastModified).sum
  }

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
    val pfx = s"${org.apache.spark.sql.graftshim.ColumnInternals
      .sessionUUID(spark)}@$path@"
    val key = s"$pfx${stamp(path)}"
    val hit = loadMemo.get(key)
    if (hit != null) hit._2
    else {
      import scala.jdk.CollectionConverters._
      // release dead-session entries and superseded stamps of this key.
      // The weak ref alone cannot clear an entry whose VALUE pins its
      // session (a DataFrame strongly references its SparkSession — the
      // r18 self-review leak), so past a size cap everything outside
      // the CURRENT session is dropped too: per-call cloned sessions
      // (q55's dimOf, stream prep sessions) stop accumulating, and the
      // worst case for a displaced live session is one re-load.
      val uuid = org.apache.spark.sql.graftshim.ColumnInternals
        .sessionUUID(spark)
      val evictAll = loadMemo.size > 64
      loadMemo.asScala.keys.toList.foreach { k =>
        val e = loadMemo.get(k)
        if (e != null && (e._1.get == null || k.startsWith(pfx) ||
            (evictAll && !k.startsWith(s"$uuid@"))))
          loadMemo.remove(k)
      }
      loadMemo.computeIfAbsent(key, _ =>
        (new java.lang.ref.WeakReference(spark), loadFresh(spark, path, name)))._2
    }
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
