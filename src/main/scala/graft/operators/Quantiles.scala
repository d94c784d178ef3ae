package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** EXACT distributed quantiles WITHOUT a global sort — the census
  * form: when a numeric column's distinct-value count is bounded
  * (quantities, ratings, sizes, status codes — the common telemetry
  * case), group by value (ONE census shuffle whose payload is
  * (slice, value, count) cells, never rows), then a per-slice
  * cumulative window over the ≤ |distinct values| census rows picks
  * the cut points with CROSS-MULTIPLIED integer thresholds
  * (cum·100 ≥ p·total — no float division anywhere).
  *
  * Contrast: Spark's `percentile`/`median` aggregates buffer and sort
  * every ROW of a group; here rows never leave the scan. At 100 TB the
  * census is |slices|·|values| cells regardless of row count.
  *
  * Semantics: percentile_disc's lower-bound form — the smallest v
  * whose cumulative count reaches ceil(p%·n). Exact, interpolation-
  * free (interpolated quantiles are float chains engines disagree on).
  */
object Quantiles {
  /** (groupCols…, p<percents(0)>, p<percents(1)>, …) per slice. */
  def quantileCensus(df: DataFrame, groupCols: Seq[String], valCol: String,
                     percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in 1..100, got $percents")
    val g = groupCols.map(col)
    // nulls are excluded on BOTH sides: Spark windows sort NULLS FIRST
    // while DuckDB sorts NULLS LAST, and a null census row would inflate
    // __tot without ever being choosable by the min(when...) cut
    val census = df
      .filter(col(valCol).isNotNull)
      .groupBy(g :+ col(valCol).as("__v"): _*)
      .agg(count(lit(1)).as("__n"))
    // both windows share the slice partitioning → one exchange; census
    // rows are distinct per (slice, v) so the RANGE default frame ==
    // ROWS (no tie ambiguity)
    val wCum = Window.partitionBy(g: _*).orderBy($"__v")
    val wTot = Window.partitionBy(g: _*)
    val cuts = percents.map(p =>
      min(when($"__cum" * 100 >= $"__tot" * p, $"__v")).as(s"p$p"))
    census
      .select(g ++ Seq($"__v", sum($"__n").over(wCum).as("__cum"),
        sum($"__n").over(wTot).as("__tot")): _*)
      .groupBy(g: _*)
      .agg(cuts.head, cuts.tail: _*)
  }

  // ------------------------------------------------------------------
  // Persisted quantile-CENSUS store — the EXACT counterpart of the t53
  // HLL register store: a (slice, value, count) census is a MERGEABLE
  // SUMMARY (merge = sum of counts), so a rolling corpus keeps cut
  // points exact forever at |slices|·|values| cells of state, never
  // rows. Appends are tagged with a batch id and the read path sums
  // DISTINCT (batch, slice, value, count) cells — an at-least-once
  // replay re-writes IDENTICAL cells, which the distinct collapses, so
  // ingest is exactly-once at read (the t44 distinct-at-probe rule;
  // exact counts can't use the HLL max-merge trick).
  // ------------------------------------------------------------------

  private def metaOf(spark: org.apache.spark.sql.SparkSession,
                     path: String): (Seq[String], String) = {
    require(Similarity.fsDirExists(spark, s"$path/meta"),
      s"no census store at $path (missing $path/meta — buildCensusStore " +
        "first)")
    val r = spark.read.parquet(s"$path/meta")
      .select(col("group_cols"), col("val_col")).collect().head
    (r.getString(0).split(",").toSeq, r.getString(1))
  }

  private def censusCells(df: DataFrame, groupCols: Seq[String],
                          valCol: String, batchId: Long): DataFrame =
    df.filter(col(valCol).isNotNull)
      .groupBy(groupCols.map(col) :+ col(valCol).as("__v"): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__batch", lit(batchId))

  /** Build the store from the initial corpus (batch id 0). */
  def buildCensusStore(df: DataFrame, groupCols: Seq[String],
                       valCol: String, path: String): Unit = {
    require(groupCols.nonEmpty && groupCols.forall(!_.contains(",")),
      s"census store needs >= 1 comma-free group column, got $groupCols")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((groupCols.mkString(","), valCol)).toDF("group_cols", "val_col")
      .write.mode("overwrite").parquet(s"$path/meta")
    censusCells(df, groupCols, valCol, batchId = 0L)
      .write.mode("overwrite").parquet(s"$path/cells")
  }

  /** Append a batch's census cells under `batchId` (a replayed id is a
    * read-time no-op). */
  def appendToCensusStore(df: DataFrame, path: String,
                          batchId: Long): Unit = {
    val (groupCols, valCol) = metaOf(df.sparkSession, path)
    censusCells(df, groupCols, valCol, batchId)
      .write.mode("append").parquet(s"$path/cells")
  }

  /** RETRACT one ingested batch from the census store — the takedown
    * half count-based stores admit EXACTLY (unlike Bloom/HLL, whose
    * OR/max merges are irreversible by construction — those document
    * rebuild as the only path): every cell carries its `__batch`
    * stamp, so dropping the batch's cells ≡ a store built without that
    * batch, bit-for-bit (oracle-pinned). Root rewrites under tmp + one
    * rename-pair swap ([[Similarity.swapIndexRoot]]); fails fast on a
    * batch id the store never ingested (a takedown must not silently
    * "succeed" on a typo'd batch). */
  def retractCensusBatch(spark: org.apache.spark.sql.SparkSession,
                         path: String, batchId: Long): Unit = {
    metaOf(spark, path) // existence fail-fast
    val cells = spark.read.parquet(s"$path/cells")
    require(cells.filter($"__batch" === batchId).limit(1).count() == 1L,
      s"retractCensusBatch: batch $batchId was never ingested at $path")
    val kept = cells.filter($"__batch" =!= batchId).localCheckpoint()
    Similarity.rebuildRoot(path, Seq("meta"), "retractCensusBatch") { tmp =>
      kept.write.mode("overwrite").parquet(s"$tmp/cells")
    }
  }

  /** Exact cut points over everything ingested so far — the same
    * cumulative-window chain as [[quantileCensus]] over the summed
    * distinct cells. */
  def quantilesFromStore(spark: org.apache.spark.sql.SparkSession,
                         path: String, percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in 1..100, got $percents")
    val (groupCols, _) = metaOf(spark, path)
    val g = groupCols.map(col)
    val census = spark.read.parquet(s"$path/cells")
      .distinct() // exactly-once under replayed appends
      .groupBy(g :+ $"__v": _*)
      .agg(sum($"__n").as("__n"))
    val wCum = Window.partitionBy(g: _*).orderBy($"__v")
    val wTot = Window.partitionBy(g: _*)
    val cuts = percents.map(p =>
      min(when($"__cum" * 100 >= $"__tot" * p, $"__v")).as(s"p$p"))
    census
      .select(g ++ Seq($"__v", sum($"__n").over(wCum).as("__cum"),
        sum($"__n").over(wTot).as("__tot")): _*)
      .groupBy(g: _*)
      .agg(cuts.head, cuts.tail: _*)
  }

  /** DuckDB replay over any FROM source (table or subquery). */
  def quantileCensusSql(fromSql: String, groupCols: Seq[String],
                        valCol: String, percents: Seq[Int]): String = {
    val g = groupCols.mkString(", ")
    val gN = groupCols.indices.map(i => (i + 1).toString).mkString(", ")
    val cuts = percents.map(p =>
      s"MIN(CASE WHEN cum * 100 >= tot * $p THEN v END) AS p$p")
      .mkString(",\n  ")
    s"""WITH c AS (
       |  SELECT $g, $valCol AS v, COUNT(*) AS n
       |  FROM $fromSql WHERE $valCol IS NOT NULL
       |  GROUP BY $gN, ${groupCols.size + 1}),
       |w AS (
       |  SELECT $g, v,
       |    SUM(n) OVER (PARTITION BY $g ORDER BY v) AS cum,
       |    SUM(n) OVER (PARTITION BY $g) AS tot
       |  FROM c)
       |SELECT $g,
       |  $cuts
       |FROM w GROUP BY $gN ORDER BY $g""".stripMargin
  }
}
