package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.StringToColumn
import graft.functions.{NgramHashes, Text}

/** Count-min sketch (Cormode & Muthukrishnan 2005) over token
  * frequencies — the FREQUENCY member of the sketch family (HLL =
  * distinct, Bloom = membership, census = exact quantiles): d hash
  * rows × w buckets of integer sums, so the state is d·w cells no
  * matter the corpus, estimates are upper bounds (est ≥ true, the
  * one-sided CMS guarantee), and cells MERGE BY SUM — the same
  * mergeable-summary lifecycle as the t60 census store (batch-stamped
  * appends, distinct-at-read exactly-once).
  *
  * Determinism: token identity is `Text.tokenCodeSql` (the corpus-wide
  * code both engines evaluate identically); row-j bucketing is the
  * multiply-FOLD mix `((code·K_j mod 2³²) >> 9) xor (…) mod w` with
  * the [[NgramHashes.keys]] constants — a plain linear mod correlates
  * with dense code structure (the q64 avalanche lesson). All integer
  * arithmetic; the DuckDB replay shares every operand
  * ([[bucketSql]] generates both dialects from one home — Spark spells
  * xor `^`, DuckDB `xor()`).
  *
  * 100 TB shape: ONE exploded-token pass emitting d (j, bucket) cells
  * per token via a row-local posexplode (no per-row union), one
  * (j, bucket) shuffle with map-side combine into ≤ d·w cells; point
  * queries probe d cells per term.
  */
object Cms {
  /** One home for the row-j bucket arithmetic, both dialects. */
  def bucketSql(codeSql: String, j: Int, w: Int, duck: Boolean): String = {
    // BIGINT cast before the multiply: the code itself is INT-typed and
    // ANSI Spark overflows int arithmetic (the CLAUDE.md L-suffix rule).
    // The code is then BOUNDED to < 2^22 (the NgramLm.fitHashed
    // precedent) BEFORE multiplying by the ~2^31.6 row key, keeping the
    // product < 2^54 for ANY input — a pathological crawl token (~96k+
    // chars, e.g. a base64 blob) would otherwise overflow the i64
    // product and abort the whole job under ANSI. NOTE (round-15
    // ADVICE): the bound is an identity ONLY for codes < 2^22 — tokens
    // past ~137 chars (tokenCode ≈ 29791·len + …) land in DIFFERENT
    // buckets than the unbounded formula, so sketches persisted by the
    // pre-bound formula are incompatible; [[FormatVersion]] in the
    // store meta invalidates them at read.
    val m = s"(((CAST(($codeSql) AS BIGINT) % 4194304) * " +
      s"${NgramHashes.keys(j)}) % 4294967296)"
    // Spark SQL spells shift/xor as shiftright()/^; DuckDB as >>/xor()
    if (duck) s"(xor($m >> 9, $m) % $w)"
    else s"((shiftright($m, 9) ^ $m) % $w)"
  }

  private def bucketArr(codeSql: String, d: Int, w: Int) =
    expr((0 until d).map(j => bucketSql(codeSql, j, w, duck = false))
      .mkString("array(", ", ", ")"))

  /** The sketch cells (j, b, cnt) of `textCol`'s tokens. */
  def cells(df: DataFrame, textCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= NgramHashes.keys.length && w >= 1,
      s"bad cms params d=$d w=$w")
    df.select(explode(split(col(textCol), " ")).as("tok"))
      .select(posexplode(bucketArr(Text.tokenCodeSql("tok"), d, w))
        .as(Seq("j", "b")))
      .groupBy($"j", $"b").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` against a cells table:
    * (tok, est) with est = min_j cells[j][bucket_j(tok)] (0 when a row
    * has no cell — an empty sketch estimates 0). */
  def estimates(cellsDf: DataFrame, probes: DataFrame, tokCol: String,
                d: Int, w: Int): DataFrame =
    probes.select(col(tokCol).as("tok"))
      .select($"tok",
        posexplode(bucketArr(Text.tokenCodeSql("tok"), d, w))
          .as(Seq("j", "b")))
      .join(cellsDf, Seq("j", "b"), "left")
      .groupBy($"tok")
      .agg(min(coalesce($"cnt", lit(0L))).as("est"))

  // ------------------------------------------------------------ store

  /** Bucket-arithmetic format version, pinned in the store meta: v2 =
    * the code %2^22 pre-bound in [[bucketSql]]. A store written by the
    * unbounded formula (no `fmt` column, or an older value) assigns
    * different buckets to 137+-char tokens, so probing it with the
    * current formula would silently return wrong counts — loading one
    * fails fast instead. */
  val FormatVersion: Int = 2

  private def metaOf(spark: org.apache.spark.sql.SparkSession,
                     path: String): (Int, Int) = {
    require(Similarity.fsDirExists(spark, s"$path/meta"),
      s"no cms store at $path (missing $path/meta — buildCmsStore first)")
    // memoized per (session, path, meta stamp) — ArtifactMemo
    ArtifactMemo.cached(spark, path, Seq("meta")) {
      metaOfFresh(spark, path)
    }
  }

  private def metaOfFresh(spark: org.apache.spark.sql.SparkSession,
                          path: String): (Int, Int) = {
    val meta = spark.read.parquet(s"$path/meta")
    val fmt =
      if (meta.columns.contains("fmt"))
        meta.select(col("fmt")).collect().head.getInt(0)
      else 1
    require(fmt == FormatVersion,
      s"cms store at $path uses bucket-format v$fmt, this build writes " +
        s"v$FormatVersion (the %2^22 code pre-bound changed bucket " +
        s"assignment for 137+-char tokens) — rebuild the store")
    val r = meta.select(col("d"), col("w")).collect().head
    (r.getInt(0), r.getInt(1))
  }

  /** Build the persisted sketch from the initial corpus (batch 0). */
  def buildCmsStore(df: DataFrame, textCol: String, d: Int, w: Int,
                    path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq((d, w, FormatVersion)).toDF("d", "w", "fmt").write.mode("overwrite")
      .parquet(s"$path/meta")
    cells(df, textCol, d, w).withColumn("__batch", lit(0L))
      .write.mode("overwrite").parquet(s"$path/cells")
  }

  /** Append a batch's cells under `batchId` — a replayed id collapses
    * at read (the t60 rule: exact counts can't max-merge). */
  def appendToCmsStore(df: DataFrame, textCol: String, path: String,
                       batchId: Long): Unit = {
    val (d, w) = metaOf(df.sparkSession, path)
    cells(df, textCol, d, w).withColumn("__batch", lit(batchId))
      .write.mode("append").parquet(s"$path/cells")
  }

  /** RETRACT one ingested batch from the CMS store — exact (the
    * [[graft.operators.Quantiles.retractCensusBatch]] twin): cells are
    * batch-stamped and the merge SUMS counts, so dropping a batch's
    * cells ≡ a store built without it. Tmp + rename-pair swap; fails
    * fast on a never-ingested batch id. */
  def retractCmsBatch(spark: org.apache.spark.sql.SparkSession,
                      path: String, batchId: Long): Unit = {
    metaOf(spark, path) // existence + format fail-fast
    val cells = spark.read.parquet(s"$path/cells")
    require(cells.filter($"__batch" === batchId).limit(1).count() == 1L,
      s"retractCmsBatch: batch $batchId was never ingested at $path")
    val kept = cells.filter($"__batch" =!= batchId).localCheckpoint()
    Similarity.rebuildRoot(path, Seq("meta"), "retractCmsBatch") { tmp =>
      kept.write.mode("overwrite").parquet(s"$tmp/cells")
    }
  }

  /** Point estimates over everything ingested so far. */
  def estimatesFromStore(spark: org.apache.spark.sql.SparkSession,
                         path: String, probes: DataFrame,
                         tokCol: String): DataFrame = {
    val (d, w) = metaOf(spark, path)
    val merged = spark.read.parquet(s"$path/cells")
      .distinct()
      .groupBy($"j", $"b").agg(sum($"cnt").as("cnt"))
    estimates(merged, probes, tokCol, d, w)
  }
}
