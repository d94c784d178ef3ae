package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Storage parity with the reference's on-disk formats (SURVEY.md §2.1).
  *
  *  - splayed table (per-column binary files + schema file,
  *    `/root/reference/core/io.c:1194`) → a plain Parquet directory:
  *    columnar, dictionary-encoded (subsuming the reference's enum/symfile
  *    machinery), zero-copy-ish via the vectorized reader.
  *  - parted database (date-partitioned splayed dirs + virtual partition
  *    column, `/root/reference/core/vary.c:176-391`) → Hive-partitioned
  *    Parquet via `partitionBy`: the partition column materializes
  *    virtually and predicate pushdown gives partition pruning.
  *  - typed CSV (`ray_read_csv`, explicit per-column types,
  *    `/root/reference/core/io.c:670`) → `spark.read.schema(...).csv`.
  */
object Store {

  /** Write a "splayed" table: one columnar dir. */
  def setSplayed(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def getSplayed(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a "parted" database: Hive-partitioned by the given column
    * (the reference's per-date directories).
    *
    * Repartition on the partition column first: without it every task
    * writes a sliver into every partition (tasks × partitions small
    * files). `filesPerPartition` > 1 adds a deterministic row-hash salt
    * to the shuffle key so a HOT partition is written by that many tasks
    * in parallel instead of one giant single-threaded file — the knob
    * that matters when one date holds terabytes. */
  def setParted(df: DataFrame, path: String, partCol: String,
                filesPerPartition: Int = 1): Unit = {
    val keyed =
      if (filesPerPartition <= 1) df.repartition(col(partCol))
      else {
        // explicit numPartitions: a user-specified repartition is exempt
        // from AQE coalescing, which would otherwise merge the salted
        // splits back into one task and defeat the fan-out
        val n = df.sparkSession.sessionState.conf.numShufflePartitions
        df.repartition(n, col(partCol),
          pmod(hash(df.columns.map(col): _*), lit(filesPerPartition)))
      }
    keyed.write.mode("overwrite").partitionBy(partCol).parquet(path)
  }

  /** Load a parted database; the partition column comes back as the
    * reference's virtual Date/Id column and filters on it prune
    * whole partitions before any IO. */
  /** Per-(session, path, tree-stamp) memo of the loaded PLAN — the
    * Tables.load discipline (r19): a parted store's `read.parquet`
    * pays a driver listing of every partition dir per call (~0.2 s on
    * the ~85-month lineitem layout); every action on the returned
    * frame still scans parquet, and any rewrite of the tree (the
    * stamp covers every file AND dir name recursively) re-loads. */
  private val partedMemo =
    new graft.operators.ArtifactMemo.Memo[DataFrame](cap = 32)

  def getParted(spark: SparkSession, path: String): DataFrame =
    partedMemo(spark, path,
      graft.operators.ArtifactMemo.stampTree(path))(
      spark.read.parquet(path))

  /** Persist a VALUE column for the generic `(set "path" v)` of a
    * vector (reference `ray_set` of any object to a path,
    * `core/binary.c:317`). The frame carries `(__i, __v)`: the explicit
    * order index makes the round-trip deterministic regardless of how
    * parquet part files come back, and a lazy script vector writes
    * DISTRIBUTED through here — no driver materialization at any n. */
  def setVector(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Read a persisted value column, order restored from `__i`. */
  def getVector(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).orderBy("__i")

  /** Typed CSV read — schema is explicit, as in the reference (inference
    * only by request). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              sep: String = ","): DataFrame =
    spark.read.schema(schema).option("sep", sep).option("header", "true").csv(path)

  def writeCsv(df: DataFrame, path: String, sep: String = ","): Unit =
    df.write.mode("overwrite").option("header", "true").option("sep", sep).csv(path)

  /** COMPACT a parquet dataset dir that accumulated many small append
    * files (streaming ingest / incremental index appends — at 100 TB a
    * store fed by thousands of micro-batches degrades every probe scan
    * to small-file open/seek cost): rewrite the SAME row set into
    * size-targeted files, preserving a hive partition layout when
    * `partitionCols` is given (each partition value lands in one task →
    * one file per partition dir), then swap directories. The swap is
    * rename-based: not atomic for concurrent readers — run compaction
    * in the store's maintenance window, like every parquet-table
    * compactor. Contents are preserved as a SET (every consumer here
    * aggregates, joins, or distinct-reads; none depends on intra-file
    * row order). Returns (files before, files after). */
  def compactParquet(spark: SparkSession, dir: String,
                     partitionCols: Seq[String] = Nil,
                     targetBytes: Long = 128L << 20): (Int, Int) = {
    import org.apache.spark.sql.functions.col
    val d = new java.io.File(dir)
    require(d.isDirectory, s"compactParquet: no dataset at $dir")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else Seq(f)
    def parts(f: java.io.File): Seq[java.io.File] =
      walk(f).filter(_.getName.endsWith(".parquet"))
    // an omitted partitionCols on a hive-partitioned dir would
    // silently FLATTEN the layout (reads stay correct, but every
    // future partition-pruned probe degrades to a full scan) — infer
    // the layout from the `name=value` directory structure instead of
    // trusting the caller to restate it
    val layout =
      if (partitionCols.nonEmpty) partitionCols
      else {
        def levels(f: java.io.File, acc: List[String]): List[String] =
          Option(f.listFiles).toSeq.flatten
            .find(x => x.isDirectory && x.getName.contains("=")) match {
            case Some(sub) =>
              levels(sub, acc :+ sub.getName.takeWhile(_ != '='))
            case None => acc
          }
        levels(d, Nil)
      }
    val before = parts(d)
    val nFiles = math.max(1L,
      (before.map(_.length).sum + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val tmp = s"$dir.compact_tmp"
    val w =
      if (layout.nonEmpty)
        df.repartition(math.max(nFiles, layout.size),
            layout.map(col): _*)
          .write.partitionBy(layout: _*)
      else df.repartition(nFiles).write
    w.mode("overwrite").parquet(tmp)
    val old = new java.io.File(s"$dir.compact_old")
    org.apache.commons.io.FileUtils.deleteQuietly(old)
    require(d.renameTo(old) && new java.io.File(tmp).renameTo(d),
      s"compactParquet: directory swap failed for $dir")
    org.apache.commons.io.FileUtils.deleteQuietly(old)
    (before.length, parts(d).length)
  }
}
