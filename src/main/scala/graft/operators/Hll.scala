package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** DETERMINISTIC HyperLogLog distinct-count census (Flajolet et al.
  * 2007) — the sketch a 100 TB pipeline runs where exact COUNT
  * DISTINCT is unaffordable (distinct URLs/users per slice), built so
  * the whole sketch HASH-MATCHES cross-engine (vs q39's
  * `approx_count_distinct`, whose engine-internal hashing forces a
  * rows-only check):
  *
  *   - hash = a 3-round multiply-fold 31-bit mix ([[hash31]] — every
  *     product bounded inside i64, non-negative by construction);
  *   - bucket = h mod m, rest = h div m (a w = 31 − log2(m) bit word);
  *   - rho = leading-zero rank of `rest` = w − floor(log2 rest) via
  *     `length(bin(x)) − 1` (the t33/t34 floor-log2 idiom), w+1 when
  *     rest = 0; registers are per-(slice, bucket) MAX(rho) — the
  *     merge is a max, so shard-parallel and append-friendly;
  *   - the harmonic sum is kept INTEGER: t_sum = Σ_b 2^(w+1 − M_b)
  *     (empty buckets contribute 2^(w+1)), bounded by m·2^(w+1) ≤ 2^32
  *     — no float accumulation order to disagree on;
  *   - the estimate alpha·m²·2^(w+1) / t_sum divides ONE shortest-repr
  *     double literal (identical binary both engines — the s02
  *     hyperplane-literal rule) by the integer t_sum, 4-dp roundBin.
  *
  * Scale shape: one narrow hash map over the scan, then a
  * (slice, bucket) aggregate whose output is ≤ m rows per slice — the
  * census shuffle carries registers, never keys.
  *
  * Small-n LINEAR-COUNTING correction, in replayable integer log2:
  * when the raw estimate is ≤ 2.5·m and V = m − n_seen buckets are
  * empty, the standard correction is m·ln(m/V). ln is
  * libm-unreplayable (the t13 rule), but ln(m/V) = (log₂m − log₂V)·ln2
  * and the repo's 1/64-bit integer log₂ ([[NgramLm.surprisal64]]) is
  * bit-identical cross-engine, so the correction is the INTEGER
  * m·(64·logM − s64(V)) times the shared ln(2)/64 double literal —
  * one integer→double cast, one multiply, roundBin. The regime gate
  * compares the raw double estimate (itself already bit-identical)
  * against the exact 2.5·m literal, so both engines switch on the
  * same rows. s64's ≤0.0861-bit interpolation error puts the
  * correction within ~0.14% of true LC — far inside LC's own
  * standard error.
  */
object Hll {
  import graft.functions.NgramHashes

  private def K(i: Int): Long = NgramHashes.keys(i)

  private val M31 = (1L << 31) - 1

  /** Three-round multiply-fold 31-bit mix: x ← (x&M)·K folded as
    * high32 XOR low31. Linear-congruential rounds (the t34 bucket
    * hash) have NO avalanche — on dense key ranges the register
    * distribution skews and the estimate landed 30% off; the
    * multiply-fold carries the product's high bits back down, which is
    * what HLL's rho statistic needs. Every product ≤ (2^31−1)·K < 2^63
    * and every intermediate is non-negative, on both engines. Column
    * and SQL forms are the same arithmetic — keep them in lockstep. */
  def hash31(v: Column): Column = {
    def fold(x: Column, k: Long): Column = {
      val p = x.bitwiseAND(M31) * k
      shiftright(p, 32).bitwiseXOR(p.bitwiseAND(M31))
    }
    fold(fold(fold(v, K(0)), K(1)), K(2))
  }

  def hash31Sql(v: String): String = {
    def fold(x: String, k: Long): String =
      s"xor((($x & $M31) * $k) >> 32, (($x & $M31) * $k) & $M31)"
    fold(fold(fold(v, K(0)), K(1)), K(2))
  }

  /** Per-(slice, bucket) registers: (groupCols…, bucket, m_b). */
  def registers(df: DataFrame, groupCols: Seq[String], keyCol: String,
                logM: Int): DataFrame = {
    require(logM >= 4 && logM <= 16, s"logM $logM outside 4..16")
    val m = 1L << logM
    val w = 31 - logM
    val g = groupCols.map(col)
    df.select(g :+ hash31(col(keyCol).cast("bigint")).as("__h"): _*)
      .select(g ++ Seq(
        ($"__h" % m).as("bucket"),
        expr(s"__h div ${m}L").as("__rest")): _*)
      .select(g ++ Seq($"bucket",
        when($"__rest" === 0L, lit(w + 1).cast("bigint"))
          .otherwise(lit(w).cast("bigint") -
            (length(bin($"__rest")) - 1).cast("bigint")).as("__rho")): _*)
      .groupBy(g :+ $"bucket": _*)
      .agg(max($"__rho").as("m_b"))
  }

  /** The census: (groupCols…, n_seen, t_sum, est) per slice.
    * t_sum is the integer harmonic sum; est the raw-regime estimate. */
  def census(df: DataFrame, groupCols: Seq[String], keyCol: String,
             logM: Int): DataFrame =
    estimate(registers(df, groupCols, keyCol, logM), groupCols, logM)

  /** The estimate pass over a register table with POSSIBLY duplicate
    * (slice, bucket) rows (at-least-once appends to the persisted
    * store): a max-merge first — MAX absorbs replays exactly. */
  def censusOfRegisters(regs: DataFrame, groupCols: Seq[String],
                        logM: Int): DataFrame =
    estimate(regs.groupBy(groupCols.map(col) :+ $"bucket": _*)
      .agg(max($"m_b").as("m_b")), groupCols, logM)

  /** ln(2)/2^K — the one shared literal of the LC correction (both
    * engines consume the identical shortest-repr double; K is the
    * fixed-point log2's fraction-bit count). */
  val Ln2OverK: Double =
    math.log(2.0) / (1L << graft.functions.HllLog2Fx.K).toDouble

  /** t_sum + estimate over UNIQUE (slice, bucket) registers. */
  private def estimate(regs: DataFrame, groupCols: Seq[String],
                       logM: Int): DataFrame = {
    val m = 1L << logM
    val g = groupCols.map(col)
    val w = 31 - logM
    val seen = regs
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_seen"),
        sum(expr(s"shiftleft(1L, cast(${w + 1}L - m_b as int))")).as("__s"))
    val withT = seen.select(g ++ Seq($"n_seen",
      ($"__s" + (lit(m) - $"n_seen") * (1L << (w + 1))).as("t_sum")): _*)
    val raw = lit(constant(logM)) / $"t_sum".cast("double")
    val vEmpty = lit(m) - $"n_seen"
    // linear counting: m·(logM·2^K − log2fx(V))·(ln2/2^K), integers
    // until the one literal multiply; applied in the standard
    // raw ≤ 2.5·m regime whenever an empty bucket exists
    val kBits = graft.functions.HllLog2Fx.K
    val lc = (lit(m) * (lit(logM.toLong << kBits) -
        graft.functions.HllLog2Fx.log2Fx(vEmpty)))
      .cast("double") * lit(Ln2OverK)
    val est = when(vEmpty > 0L && raw <= lit(2.5 * m), lc).otherwise(raw)
    withT.select(g ++ Seq($"n_seen", $"t_sum",
      graft.functions.RF.roundBin(est, 4).as("est")): _*)
  }

  // ------------------------------------------------------------------
  // Persisted register store — the rolling-distinct-count lifecycle
  // (distinct users/URLs per slice over an unbounded feed): each batch
  // appends its ≤ m-rows-per-slice register rows; the estimate pass
  // max-merges at read time. Because the merge is MAX, at-least-once
  // appends are EXACTLY idempotent — a replayed batch changes nothing
  // (stronger than t44's distinct-at-probe story). `path/meta` pins
  // logM and the group/key columns: registers built under a different
  // geometry would silently merge wrong, so append fails fast.
  // DELETION is impossible by construction (the Bloom twin): MAX
  // absorbs — a register value cannot be un-maxed without knowing
  // every contributing key, so a takedown means a rebuild from the
  // surviving feed. Count-based stores retract exactly instead
  // (Quantiles.retractCensusBatch / Cms.retractCmsBatch).
  // ------------------------------------------------------------------

  private def meta(spark: org.apache.spark.sql.SparkSession,
                   path: String): (Int, Seq[String], String) = {
    require(Similarity.fsDirExists(spark, s"$path/meta"),
      s"no HLL store at $path (missing $path/meta — buildHllStore first)")
    val r = spark.read.parquet(s"$path/meta").collect().head
    (r.getInt(0), r.getString(1).split(",").toSeq, r.getString(2))
  }

  def buildHllStore(df: DataFrame, groupCols: Seq[String], keyCol: String,
                    logM: Int, path: String): Unit = {
    // meta encodes the slice columns comma-joined — a name containing a
    // comma (or an empty slice list) would round-trip wrong
    require(groupCols.nonEmpty && groupCols.forall(!_.contains(",")),
      s"hll store needs >= 1 comma-free group column, got $groupCols")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((logM, groupCols.mkString(","), keyCol))
      .toDF("log_m", "group_cols", "key_col")
      .write.mode("overwrite").parquet(s"$path/meta")
    registers(df, groupCols, keyCol, logM)
      .write.mode("overwrite").parquet(s"$path/registers")
  }

  /** Append a batch's registers (params from the store). */
  def appendToHllStore(df: DataFrame, path: String): Unit = {
    val (logM, groupCols, keyCol) = meta(df.sparkSession, path)
    registers(df, groupCols, keyCol, logM)
      .write.mode("append").parquet(s"$path/registers")
  }

  /** The census over everything ingested so far. */
  def censusFromStore(spark: org.apache.spark.sql.SparkSession,
                      path: String): DataFrame = {
    val (logM, groupCols, _) = meta(spark, path)
    censusOfRegisters(spark.read.parquet(s"$path/registers"),
      groupCols, logM)
  }

  /** alpha_m · m² · 2^(w+1) — computed ONCE here; both engines consume
    * the identical shortest-repr double literal. */
  def constant(logM: Int): Double = {
    val m = (1L << logM).toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m * (1L << (31 - logM + 1)).toDouble
  }

  /** DuckDB replay of [[census]] over `table`, slicing by `groupCol`. */
  def censusSql(table: String, groupCol: String, keyCol: String,
                logM: Int): String =
    censusSqlFrom(table, Seq(groupCol), keyCol, logM)

  /** The multi-slice form over any FROM source (a table name or a
    * parenthesized subquery). */
  def censusSqlFrom(fromSql: String, groupCols: Seq[String],
                    keyCol: String, logM: Int): String = {
    val m = 1L << logM
    val w = 31 - logM
    val g = groupCols.mkString(", ")
    val gN = groupCols.indices.map(i => (i + 1).toString).mkString(", ")
    // the raw estimate, the empty-bucket count, the K-step
    // shift-and-square fixed-point log2 (the HllLog2Fx chain, unrolled
    // as MATERIALIZED per-step CTEs — the s07 re-inline lesson), and
    // the LC correction — the same arithmetic as [[estimate]]
    val kBits = graft.functions.HllLog2Fx.K
    val fB = graft.functions.HllLog2Fx.F
    val raw = s"${constant(logM)} / CAST(t_sum AS DOUBLE)"
    val vE = s"($m - n_seen)"
    val thr = 1L << (fB + 1)
    val steps = (1 to kBits).map { i =>
      s"""lc$i AS MATERIALIZED (
         |  SELECT $g, n_seen, t_sum, fb,
         |    CASE WHEN ((y * y) >> $fB) >= $thr
         |         THEN ((y * y) >> $fB) >> 1 ELSE (y * y) >> $fB END AS y,
         |    2 * l + CASE WHEN ((y * y) >> $fB) >= $thr
         |                 THEN 1 ELSE 0 END AS l
         |  FROM lc${i - 1})""".stripMargin
    }.mkString(",\n")
    val lc = s"CAST($m * ((${logM.toLong << kBits}) " +
      s"- ((fb << $kBits) + l)) AS DOUBLE) * $Ln2OverK"
    val est = s"CASE WHEN $vE > 0 AND $raw <= ${2.5 * m} " +
      s"THEN $lc ELSE $raw END"
    s"""WITH h AS (
       |  SELECT $g, ${hash31Sql(keyCol)} AS h FROM $fromSql),
       |b AS (
       |  SELECT $g, h % $m AS bucket,
       |    CASE WHEN h // $m = 0 THEN ${w + 1}
       |         ELSE $w - (length(bin(h // $m)) - 1) END AS rho
       |  FROM h),
       |r AS (SELECT $g, bucket, MAX(rho) AS m_b
       |      FROM b GROUP BY $gN, ${groupCols.size + 1}),
       |agg AS (
       |  SELECT $g, COUNT(*) AS n_seen,
       |    CAST(SUM(1::BIGINT << CAST(${w + 1} - m_b AS INT)) AS BIGINT)
       |      AS s
       |  FROM r GROUP BY $gN),
       |lc0 AS MATERIALIZED (
       |  SELECT $g, n_seen,
       |    s + ($m - n_seen) * ${1L << (w + 1)} AS t_sum,
       |    CASE WHEN $m - n_seen > 0
       |         THEN CAST(length(bin($m - n_seen)) - 1 AS BIGINT)
       |         ELSE 0 END AS fb,
       |    CASE WHEN $m - n_seen > 0
       |         THEN (($m - n_seen) << $fB)
       |              >> (length(bin($m - n_seen)) - 1)
       |         ELSE 0 END AS y,
       |    CAST(0 AS BIGINT) AS l
       |  FROM agg),
       |$steps
       |SELECT $g, n_seen, t_sum,
       |  floor(($est) * 10000 + 0.5) / 10000 AS est
       |FROM lc$kBits ORDER BY $g""".stripMargin
  }
}
