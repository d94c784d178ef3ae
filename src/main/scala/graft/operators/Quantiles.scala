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
