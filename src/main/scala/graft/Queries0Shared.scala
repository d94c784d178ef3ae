package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.RF

/** Shared cross-chunk helpers of the query registry (the 1/64-bit
  * surprisal SQL spellings and the testdata source stamp) — the base
  * of the Queries1..5 trait stack. */
private[graft] trait Queries0Shared {

  import graft.functions.Text
  import graft.operators.{Dedup, Similarity}

  private[graft] def s64u(q: String): String =
    s"(64 * (length(bin($q)) - 1) " +
      s"+ ((($q) << 6) >> (length(bin($q)) - 1)) - 64)"

  private[graft] def duckS64(q: String): String =
    s"(64 * (length(bin($q)) - 1) " +
      s"+ ((($q) << 6) >> (length(bin($q)) - 1)) - 64)"

  /** Source mtime for index-artifact cache keys: a driver-side testdata
    * regeneration within a long-lived JVM must not reuse stale fits. */
  private[graft] def srcStamp(dir: String, file: String): Long = {
    val src = new java.io.File(dir, file)
    if (src.isFile) src.lastModified
    else Option(src.listFiles).map(_.map(_.lastModified).foldLeft(0L)(math.max))
      .getOrElse(0L)
  }

  private[graft] def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact-sum of a double column via DECIMAL(18,2): deterministic under
    * any aggregation order, identical in Spark and DuckDB. */
  private[graft] def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Fitted centroids for the embeddings table, built once per process
    * per sf dir. Centroids are an index ARTIFACT — s04 persists them to
    * disk; the interactive s03/d14 queries amortize the identical build
    * the same way a deployment would (build batch, query many). The
    * exact-decimal Lloyd fit is deterministic, so cached == fresh. */
  private[graft] val centCache = new java.util.concurrent.ConcurrentHashMap[
    String, Array[(Int, Seq[Double])]]()
  private[graft] def embCentroids(spark: SparkSession,
                           dir: String): Array[(Int, Seq[Double])] =
    centCache.computeIfAbsent(s"$dir@${srcStamp(dir, "embeddings.parquet")}", _ =>
      Similarity.fitCentroids(t(spark, dir, "embeddings"),
        "vec_id", "embedding", nCells = 8, Similarity.LloydIters))

  /** Anchor-set prototype centroid (label-0 vectors) — a per-corpus
    * model artifact like the Lloyd centroids: deterministic exact mean,
    * so cached == fresh. */
  private[graft] val protoCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Double]]()
  private[graft] def protoCentroid(spark: SparkSession, dir: String): Seq[Double] =
    protoCache.computeIfAbsent(s"$dir@${srcStamp(dir, "embeddings.parquet")}",
      _ => Similarity.exactMean(
        t(spark, dir, "embeddings").filter($"label" === 0), "embedding"))

  /** One Lloyd iteration in DuckDB: assign to `prev` centroids (argmax
    * cosine, lowest cell on ties — NearestCentroid's rule), then the
    * element-wise mean per cell with coordinate sums in DECIMAL(38,18) —
    * exact, so bit-identical to the Spark build; empty cells keep their
    * previous centroid. Produces CTEs a<n>, m<n>, cent<n>. */
  private[graft] def lloydIterSql(prev: String, n: Int): String =
    s"""  a$n AS (SELECT id, v, cell FROM (
       |    SELECT v.id, v.v, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.id
       |        ORDER BY ${duckCos("v.v", "c.cv")} DESC, c.cell) AS rk
       |    FROM v CROSS JOIN $prev c) WHERE rk = 1),
       |  m$n AS (SELECT a.cell, p.pos,
       |      CAST(SUM(CAST(a.v[p.pos] AS DECIMAL(38,18))) AS DOUBLE)
       |        / COUNT(*) AS m
       |    FROM a$n a CROSS JOIN
       |      (SELECT generate_series AS pos FROM generate_series(1, 64)) p
       |    GROUP BY a.cell, p.pos),
       |  cent$n AS (SELECT c.cell,
       |      CASE WHEN COUNT(m.m) = 0 THEN first(c.cv)
       |           ELSE list(m.m ORDER BY m.pos) END AS cv
       |    FROM $prev c LEFT JOIN m$n m ON m.cell = c.cell
       |    GROUP BY c.cell)""".stripMargin


  /** Explicit cosine (dot / norms) — textually the engine's formula so the
    * oracle's assignment argmax sees the same FP ops as NearestCentroid. */
  private[graft] def duckCos(a: String, b: String) =
    s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"

}
