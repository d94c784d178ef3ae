package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.RF

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent SQL oracle where expressible.
  *
  * Conventions (oracle parity):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - every query has a deterministic ORDER BY;
  *  - double aggregates are rounded (or routed through DECIMAL) so that
  *    Spark's parallel partial aggregation and DuckDB's sequential fold
  *    hash-match bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on sf0.001 — the reference's canonical grouped select
    * (`select {sum/avg by: flags from: lineitem}`, SURVEY.md §3.2). */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01_agg_pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.registry

  def oracleSql: Map[String, String] = Queries.oracles
}

/** The query registry lives here to keep SparkEntry to the contract. */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact-sum of a double column via DECIMAL(18,2): deterministic under
    * any aggregation order, identical in Spark and DuckDB. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  // ---------------------------------------------------------------- q01
  // Grouped aggregate: the reference select-by-where pipeline
  // (ray_select, /root/reference/core/query.c:607).
  def q01_agg_pricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy($"l_returnflag", $"l_linestatus")

  private val q01_sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_discount), 4) AS avg_disc,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  // Filter + projection (ray_where + mappings, SURVEY.md §2.2). The filter
  // and the 4-column projection both push down to the parquet scan.
  def q02_filter_project(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter($"l_quantity" > 45 && $"l_discount" <= 0.05)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        round($"l_extendedprice", 2).as("price"))
      .orderBy($"l_orderkey", $"l_linenumber")

  private val q02_sql =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  ROUND(l_extendedprice, 2) AS price
      |FROM lineitem WHERE l_quantity > 45 AND l_discount <= 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  // Inner equi-join (reference inner-join, /root/reference/core/join.c:200)
  // + grouped agg. customer is small → Spark broadcasts it (AQE).
  def q03_join_inner(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey", "inner")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        dsum($"o_totalprice").as("sum_total"))
      .orderBy($"c_mktsegment")

  private val q03_sql =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q04
  // Left join preserving all left rows (reference left-join,
  // /root/reference/core/join.c:158): customers with their order counts,
  // zero for customers without orders.
  def q04_join_left(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(count($"o_orderkey").as("n_orders"))
      .orderBy($"c_custkey")

  private val q04_sql =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q05
  // Top-k: orderBy + limit → Catalyst TakeOrderedAndProject (no full
  // sort/shuffle; reference take-after-xdesc, SURVEY.md §2.6).
  def q05_topk(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select($"o_orderkey", round($"o_totalprice", 2).as("total"))
      .orderBy($"total".desc, $"o_orderkey")
      .limit(10)

  private val q05_sql =
    """SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
      |FROM orders ORDER BY total DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q06
  // distinct (reference distinct, /root/reference/core/compose.c:839).
  def q06_distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select($"l_returnflag", $"l_linestatus").distinct()
      .orderBy($"l_returnflag", $"l_linestatus")

  private val q06_sql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q07
  // in / within / like-glob predicates (SURVEY.md §2.2).
  def q07_predicates(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(RF.within($"p_size", lit(10), lit(30)) &&
        $"p_brand".isin("Brand#1", "Brand#2", "Brand#15", "Brand#19") &&
        RF.likeGlob($"p_type", "*A*"))
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
      .orderBy($"p_brand")

  private val q07_sql =
    """SELECT p_brand, COUNT(*) AS n FROM part
      |WHERE p_size BETWEEN 10 AND 30
      |  AND p_brand IN ('Brand#1','Brand#2','Brand#15','Brand#19')
      |  AND p_type LIKE '%A%'
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q08
  // Euclidean division/remainder semantics (reference `/` and `%`,
  // /root/reference/core/ops.h:171-183): floor division, div-by-zero → null.
  def q08_euclid(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        RF.euclidDiv($"l_partkey" - $"l_suppkey" * 2, $"l_suppkey" - 5).as("ediv"),
        RF.euclidMod($"l_partkey" - $"l_suppkey" * 2, $"l_suppkey" - 5).as("emod"))
      .orderBy($"l_orderkey", $"l_linenumber")

  private val q08_sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(FLOOR(CAST(l_partkey - l_suppkey*2 AS DOUBLE) / NULLIF(l_suppkey - 5, 0)) AS BIGINT) AS ediv,
      |  CAST(l_partkey - l_suppkey*2 - CAST(FLOOR(CAST(l_partkey - l_suppkey*2 AS DOUBLE) / NULLIF(l_suppkey - 5, 0)) AS BIGINT) * (l_suppkey - 5) AS BIGINT) AS emod
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q09
  // xbar time-bucketing (reference xbar on timestamps + by:, SURVEY.md
  // §2.10): tumbling 1-hour windows over the events stream table.
  // events.ts is LongType nanos (SURVEY §1.2 convention); bucket with the
  // exact integer xbar, then rescale nanos → epoch seconds.
  def q09_xbar_time(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    // `div` (integer division) keeps the ns→hour rescale exact; a double
    // round-trip would lose precision above 2^53.
    t(spark, dir, "events")
      .groupBy((RF.xbar(lit(hourNs), $"ts").cast("decimal(38,0)") / hourNs)
        .cast("long").as("hour_div"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
      .select(($"hour_div" * 3600).as("hour_epoch"), $"n", $"sum_value")
      .orderBy($"hour_epoch")
  }

  private val q09_sql =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |  COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      |FROM events GROUP BY hour_epoch ORDER BY hour_epoch""".stripMargin

  // ---------------------------------------------------------------- q10
  // scan / running aggregate (reference scan, /root/reference/core/iter.c:1212)
  // → cumulative window sum per key.
  def q10_scan_cumsum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select($"event_id", $"user_id",
        round(sum($"value").over(w), 4).as("cum_value"))
      .orderBy($"event_id")
  }

  private val q10_sql =
    """SELECT event_id, user_id,
      |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_value
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q11
  // As-of join (reference asof-join, /root/reference/core/join.c:300):
  // for each click/view, the most recent purchase by the same user.
  // Oracle: DuckDB's native ASOF LEFT JOIN.
  def q11_asof_join(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val left = e.filter($"event_type".isin("click", "view"))
    val right = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts",
        $"value".as("purchase_value"), $"ts".as("purchase_ts"))
    // lag reported in µs with per-timestamp truncation: DuckDB reads the
    // ns parquet column at µs resolution, so sub-µs digits aren't portable.
    operators.AsofJoin.asofJoin(left, right, Seq("user_id"), "ts")
      .select($"event_id", $"user_id", $"purchase_value",
        (expr("ts div 1000") - expr("purchase_ts div 1000")).as("lag_us"))
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- q74
  // As-of join with TOLERANCE (pandas merge_asof(tolerance=), beyond
  // the reference's aj): signups matched to the user's prevailing view
  // only when it happened within the last hour — a stale prevailing
  // row is a MISS (payload nulls, asof_within false). Same zero-extra-
  // shuffle composition as q11; the oracle is DuckDB's native ASOF
  // LEFT JOIN with the distance CASE applied on top.
  def q74_asof_tolerance(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val e = t(spark, dir, "events")
    val left = e.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts")
    val right = e.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value".as("view_value"),
        $"ts".as("view_ts"))
    operators.AsofJoin.asofJoinTolerance(left, right, Seq("user_id"), "ts",
        tol = hourNs)
      .select($"event_id", $"user_id",
        round($"view_value", 4).as("view_value"),
        (expr("ts div 1000") - expr("view_ts div 1000")).as("lag_us"),
        $"asof_within")
      .orderBy($"event_id")
  }

  private val q74_sql =
    """SELECT l.event_id, l.user_id,
      |  CASE WHEN r.ts IS NOT NULL
      |        AND epoch_us(l.ts) - epoch_us(r.ts) <= 3600000000
      |       THEN round(r.value, 4) END AS view_value,
      |  CASE WHEN r.ts IS NOT NULL
      |        AND epoch_us(l.ts) - epoch_us(r.ts) <= 3600000000
      |       THEN epoch_us(l.ts) - epoch_us(r.ts) END AS lag_us,
      |  COALESCE(r.ts IS NOT NULL
      |    AND epoch_us(l.ts) - epoch_us(r.ts) <= 3600000000, FALSE)
      |    AS asof_within
      |FROM (SELECT * FROM events WHERE event_type = 'signup') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin

  private val q11_sql =
    """SELECT l.event_id, l.user_id, r.value AS purchase_value,
      |  epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
      |FROM (SELECT * FROM events WHERE event_type IN ('click','view')) l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin

  // ---------------------------------------------------------------- q12
  // Window (interval) join (reference window-join1,
  // /root/reference/core/join.c:358): per purchase, aggregate clicks by
  // the same user within ±1 hour.
  def q12_window_join(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val e = t(spark, dir, "events")
    val left = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val right = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"value")
    operators.WindowJoin.windowJoin(left, right,
      leftId = Seq("event_id"), keys = Seq("user_id"), ts = "ts",
      loOffset = lit(-hourNs), hiOffset = lit(hourNs),
      aggs = Seq(count($"value").as("n_clicks"),
        round(sum($"value"), 4).as("sum_clicks"),
        min($"value").as("min_click"), max($"value").as("max_click")))
      .select($"event_id", $"user_id",
        coalesce($"n_clicks", lit(0L)).as("n_clicks"),
        $"sum_clicks", $"min_click", $"max_click")
      .orderBy($"event_id")
  }

  private val q12_sql =
    """SELECT l.event_id, l.user_id, COUNT(r.value) AS n_clicks,
      |  ROUND(SUM(r.value), 4) AS sum_clicks,
      |  MIN(r.value) AS min_click, MAX(r.value) AS max_click
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      |  ON l.user_id = r.user_id
      |  AND epoch_ns(r.ts) BETWEEN epoch_ns(l.ts) - 3600000000000
      |                         AND epoch_ns(l.ts) + 3600000000000
      |GROUP BY l.event_id, l.user_id
      |ORDER BY l.event_id""".stripMargin

  // ---------------------------------------------------------------- q13
  // Keyed upsert (reference upsert, /root/reference/core/update.c:556):
  // matched keys take the source row wholesale, misses append.
  def q13_upsert(spark: SparkSession, dir: String): DataFrame = {
    val source = t(spark, dir, "orders")
      .groupBy(when($"o_custkey" % 7 === 0, $"o_custkey" + 100000)
        .otherwise($"o_custkey").as("c_custkey"))
      .agg(dsum($"o_totalprice").as("c_acctbal"))
    operators.Upsert.upsert(t(spark, dir, "customer"), source, Seq("c_custkey"))
      .orderBy($"c_custkey")
  }

  private val q13_sql =
    """WITH src AS (
      |  SELECT CASE WHEN o_custkey % 7 = 0 THEN o_custkey + 100000
      |              ELSE o_custkey END AS c_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS c_acctbal
      |  FROM orders GROUP BY 1)
      |SELECT COALESCE(s.c_custkey, c.c_custkey) AS c_custkey,
      |  c.c_name, c.c_nationkey,
      |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
      |       ELSE c.c_acctbal END AS c_acctbal,
      |  c.c_mktsegment
      |FROM customer c FULL JOIN src s ON c.c_custkey = s.c_custkey
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q14
  // Set difference (reference except, /root/reference/core/items.c:916):
  // customers that never placed an order. Catalyst plans EXCEPT as a
  // left-anti join — the scalable form.
  def q14_except(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select($"c_custkey")
      .except(t(spark, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey"))
      .orderBy($"c_custkey")

  private val q14_sql =
    """SELECT c_custkey FROM customer
      |EXCEPT SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q15
  // rank / xrank (reference /root/reference/core/order.c:505-648):
  // 0-based rank and quartile bucket within each market segment.
  def q15_rank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    t(spark, dir, "customer")
      .select($"c_custkey", $"c_mktsegment",
        (row_number().over(w) - 1).as("rank0"),
        ntile(4).over(w).as("quartile"))
      .orderBy($"c_custkey")
  }

  private val q15_sql =
    """SELECT c_custkey, c_mktsegment,
      |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |    ORDER BY c_acctbal DESC, c_custkey) - 1 AS rank0,
      |  NTILE(4) OVER (PARTITION BY c_mktsegment
      |    ORDER BY c_acctbal DESC, c_custkey) AS quartile
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q16
  // String ops (reference split/format/like, SURVEY.md §2.8): tokenize,
  // head, and printf-style formatting over documents.
  def q16_strings(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select($"doc_id",
        size(split($"text", " ")).as("n_tokens"),
        element_at(split($"text", " "), 1).as("first_tok"),
        upper(substring($"text", 1, 10)).as("head10"),
        format_string("%s|%d", $"lang", $"n_chars").as("tag"))
      .orderBy($"doc_id")

  private val q16_sql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  string_split(text, ' ')[1] AS first_tok,
      |  upper(substr(text, 1, 10)) AS head10,
      |  printf('%s|%d', lang, n_chars) AS tag
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q17
  // Order-sensitive / statistical aggregates: first/last by stable row
  // order (min_by/max_by — deterministic under parallel aggregation,
  // unlike first()), exact median, population stddev (reference `dev`,
  // /root/reference/core/aggr.c:2864).
  def q17_agg_stats(spark: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // fold the value into the ordering key so min_by/max_by ties are
    // total (quantity is k*0.25, so *100 is integral and exact)
    val ord = ($"l_orderkey" * 10 + $"l_linenumber") * 10000 +
      ($"l_quantity" * 100).cast("long")
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        min_by($"l_quantity", ord).as("first_qty"),
        max_by($"l_quantity", ord).as("last_qty"),
        round(median($"l_extendedprice"), 4).as("med_price"),
        round(stddev_pop($"l_extendedprice"), 4).as("dev_price"))
      .orderBy($"l_returnflag")
  }

  private val q17_sql =
    """SELECT l_returnflag,
      |  arg_min(l_quantity, (l_orderkey*10 + l_linenumber)*10000
      |    + CAST(l_quantity*100 AS BIGINT)) AS first_qty,
      |  arg_max(l_quantity, (l_orderkey*10 + l_linenumber)*10000
      |    + CAST(l_quantity*100 AS BIGINT)) AS last_qty,
      |  ROUND(median(l_extendedprice), 4) AS med_price,
      |  ROUND(stddev_pop(l_extendedprice), 4) AS dev_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q18
  // Vector-in-vector membership (reference `in`,
  // /root/reference/core/items.c:736) as a left-semi join — no
  // materialized distinct, no broadcast-collect.
  def q18_semi_join(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer").filter($"c_mktsegment" === "BUILDING"),
        $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_total"))
      .orderBy($"o_orderpriority")

  private val q18_sql =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ================================================================
  // Training-data pipeline operators (SURVEY north-star extensions):
  // text analysis, dedup, similarity search over documents/embeddings.
  // ================================================================
  import graft.functions.Text
  import graft.operators.{Dedup, Similarity}

  // ---------------------------------------------------------------- t01
  // Token counting: whitespace tokens + regex word pieces.
  def t01_tokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select($"doc_id",
        size(Text.tokens($"text")).as("n_ws_tokens"),
        size(Text.alphaTokens($"text")).as("n_alpha_tokens"))
      .orderBy($"doc_id")

  private val t01_sql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_ws_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z]+')) AS n_alpha_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t02
  // Quality scoring: punctuation + stopword ratios → composite score.
  def t02_quality(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.QualityExpr
    t(spark, dir, "documents")
      .select($"doc_id",
        RF.roundBin(QualityExpr.punctRatio($"text"), 4).as("punct_ratio"),
        RF.roundBin(QualityExpr.stopwordRatio($"text"), 4).as("stop_ratio"),
        QualityExpr.qualityScore($"text").as("quality"))
      .orderBy($"doc_id")
  }

  private val t02_stop = Text.stopwords.map(s => s"'$s'").mkString(", ")
  // floor(x*1e4 + 0.5)/1e4 instead of ROUND: bit-identical to the Spark
  // side (see RF.roundBin — engines disagree on .xxxx5 shortest-reprs)
  private val t02_sql = {
    val punct =
      """CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |      / length(text) END""".stripMargin
    val stop =
      s"""CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0 ELSE
         |    CAST(len(list_filter(string_split(text, ' '),
         |      w -> w IN ($t02_stop))) AS DOUBLE)
         |      / len(string_split(text, ' ')) END""".stripMargin
    val quality =
      s"""0.4 * least(1.0, CAST(len(string_split(text,' ')) AS DOUBLE)/100)
         |    + 0.3 * (1.0 - $punct)
         |    + 0.3 * (1.0 - $stop)""".stripMargin
    s"""SELECT doc_id,
       |  floor(($punct) * 10000 + 0.5) / 10000 AS punct_ratio,
       |  floor(($stop) * 10000 + 0.5) / 10000 AS stop_ratio,
       |  floor(($quality) * 10000 + 0.5) / 10000 AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t03
  // Language ID: marker-word voting, grouped census of predictions.
  def t03_langid(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(graft.functions.LangIdExpr.langId($"text").as("lang_pred"))
      .groupBy($"lang_pred").agg(count(lit(1)).as("n"))
      .orderBy($"lang_pred")

  private val t03_sql = {
    def hits(ms: Seq[String]) =
      s"len(list_filter(string_split(lower(text), ' '), " +
        s"w -> w IN (${ms.map(m => s"'$m'").mkString(", ")})))"
    val en = hits(Seq("the", "and", "of", "to", "is"))
    val de = hits(Seq("der", "die", "und", "das", "ist"))
    val es = hits(Seq("el", "la", "que", "los", "por"))
    val fr = hits(Seq("le", "les", "des", "est", "une"))
    s"""SELECT lang_pred, COUNT(*) AS n FROM (
       |  SELECT CASE
       |    WHEN greatest($en, $de, $es, $fr) = 0 THEN 'unknown'
       |    WHEN $en = greatest($en, $de, $es, $fr) THEN 'en'
       |    WHEN $de = greatest($en, $de, $es, $fr) THEN 'de'
       |    WHEN $es = greatest($en, $de, $es, $fr) THEN 'es'
       |    WHEN $fr = greatest($en, $de, $es, $fr) THEN 'fr'
       |    ELSE 'unknown' END AS lang_pred
       |  FROM documents) GROUP BY lang_pred ORDER BY lang_pred""".stripMargin
  }

  // ---------------------------------------------------------------- t04
  // Document fingerprinting: whitespace-normalized md5.
  def t04_fingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select($"doc_id", Text.fingerprint($"text").as("fp"))
      .orderBy($"doc_id")

  private val t04_sql =
    """SELECT doc_id,
      |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t05
  // PII redaction (emails / IPv4 / long digit runs → typed
  // placeholders). The synthetic corpus has no PII, so the query plants
  // a deterministic contact line per doc and redacts it — both engines
  // build and scrub the same string (Java-regex ∩ RE2 patterns).
  def t05_redact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select($"doc_id", Text.redactPii(concat($"text",
        lit(" contact user"), $"doc_id", lit("@mail.example.com at 10.0."),
        ($"doc_id" % 256).cast("string"), lit(".7 or 555"),
        ($"doc_id" % 10000).cast("string"), lit("9999."),
        lit(" call (555) 123-"),
        lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
        lit(" card 4111 1111 1111 111"), ($"doc_id" % 10).cast("string"),
        lit(" fixed 5500-0000-0000-0004 done"))).as("clean"))
      .orderBy($"doc_id")

  // The constructed per-doc page plants an email, an IP, a phone, a
  // FIXED Luhn-valid card, and a card whose validity DEPENDS on
  // doc_id (check digit = doc_id % 10, valid iff 1) — so the oracle's
  // Luhn replay is exercised both ways on every row.
  private lazy val t05_sql = {
    val page =
      "text || ' contact user' || doc_id || '@mail.example.com at 10.0.'" +
        " || (doc_id % 256) || '.7 or 555' || (doc_id % 10000) || '9999.'" +
        " || ' call (555) 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')" +
        " || ' card 4111 1111 1111 111' || (doc_id % 10)" +
        " || ' fixed 5500-0000-0000-0004 done'"
    val emailIp =
      s"regexp_replace(regexp_replace($page, " +
        s"'${Text.emailRe}', '<EMAIL>', 'g'), " +
        s"'${Text.ipv4Re}', '<IP>', 'g')"
    val carded = graft.functions.PiiExpr.cardRedactDuckSql(emailIp)
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(
       |    $carded,
       |    '${Text.phoneRe}', '<PHONE>', 'g'),
       |    '${Text.longNumRe}', '<NUM>', 'g') AS clean
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t06
  // Deterministic weighted sampling (data mixing): per-language keep
  // rates, decision = Knuth multiplicative hash of doc_id — the same
  // integer arithmetic DuckDB evaluates, so the SAMPLE ITSELF (not just
  // its size) is oracle-checked.
  def t06_sample_mix(spark: SparkSession, dir: String): DataFrame =
    operators.Sampling.sampleByRates(t(spark, dir, "documents"),
      "doc_id", "lang", Map("en" -> 0.9, "de" -> 0.5), default = 0.25)
      .groupBy($"lang")
      .agg(count(lit(1)).as("kept"),
        sum(length($"text")).as("kept_chars"),
        min($"doc_id").as("first_kept"))
      .orderBy($"lang")

  private val t06_sql =
    """WITH s AS (SELECT *,
      |    (((doc_id % 2147483648) * 2654435761) % 4294967296
      |     + ((doc_id // 2147483648) * 2246822519) % 4294967296)
      |    % 4294967296 / 4294967296.0 AS u,
      |    CASE WHEN lang = 'de' THEN 0.5 WHEN lang = 'en' THEN 0.9
      |         ELSE 0.25 END AS rate
      |  FROM documents)
      |SELECT lang, COUNT(*) AS kept,
      |  CAST(SUM(length(text)) AS BIGINT) AS kept_chars,
      |  MIN(doc_id) AS first_kept
      |FROM s WHERE u < rate GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t07
  // Sequence packing, greedy first-fit (no doc spanning): 256-token
  // bins, 4 shards, sequential fill state in one mapPartitions pass per
  // shard. The oracle replays the fill as a DuckDB recursive CTE.
  def t07_pack_greedy(spark: SparkSession, dir: String): DataFrame =
    operators.Packing.packGreedy(t(spark, dir, "documents"),
      "doc_id", size(Text.tokens($"text")), budget = 256L, shards = 4)
      .orderBy($"doc_id")

  private val t07_sql =
    """WITH RECURSIVE docs AS (
      |  SELECT doc_id, doc_id % 4 AS shard,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
      |         row_number() OVER (PARTITION BY doc_id % 4
      |                            ORDER BY doc_id) AS rn
      |  FROM documents),
      |fill AS (
      |  SELECT shard, rn, doc_id, len, 0 AS bin, len AS filled
      |  FROM docs WHERE rn = 1
      |  UNION ALL
      |  SELECT d.shard, d.rn, d.doc_id, d.len,
      |    CASE WHEN f.filled + d.len <= 256 THEN f.bin ELSE f.bin + 1 END,
      |    CASE WHEN f.filled + d.len <= 256 THEN f.filled + d.len
      |         ELSE d.len END
      |  FROM fill f JOIN docs d ON d.shard = f.shard AND d.rn = f.rn + 1)
      |SELECT doc_id, shard, bin FROM fill ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t08
  // Sequence packing, concat-and-chunk (docs may span chunk
  // boundaries): pure per-shard window arithmetic, no sequential state.
  def t08_pack_chunks(spark: SparkSession, dir: String): DataFrame =
    operators.Packing.chunkSpans(t(spark, dir, "documents"),
      "doc_id", size(Text.tokens($"text")), budget = 256L, shards = 4)
      .orderBy($"doc_id")

  private val t08_sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 4 AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
      |    CAST(COALESCE(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
      |      OVER (PARTITION BY doc_id % 4 ORDER BY doc_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum_excl
      |  FROM documents)
      |SELECT doc_id, shard,
      |  cum_excl // 256 AS start_chunk,
      |  CASE WHEN len > 0 THEN (cum_excl + len - 1) // 256
      |       ELSE cum_excl // 256 END AS end_chunk,
      |  cum_excl % 256 AS chunk_offset
      |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t09
  // Benchmark decontamination: corpus docs sharing any word 3-gram with
  // the benchmark slice (doc_id % 97 = 0), with distinct-hit counts.
  // Benchmark gram set broadcast; corpus side is explode + hash probe.
  def t09_decontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    operators.Decontam.report(docs.filter($"doc_id" % 97 =!= 0),
        "doc_id", "text", docs.filter($"doc_id" % 97 === 0), "text", n = 3)
      .orderBy($"doc_id")
  }

  private val t09_sql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, w,
       |         unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
       |  FROM toks),
       |grams AS (
       |  SELECT doc_id, ${Text.duck.ngramHashSql("w", "i", 3)} AS g
       |  FROM pos),
       |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
       |SELECT doc_id, COUNT(DISTINCT g) AS n_hits
       |FROM grams
       |WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM bench)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t10
  // The training-data pipeline END TO END in one query — quality
  // filter → language gate → exact-dedup keep-list → deterministic
  // 50% sample → chunk-span packing — every stage one of the t/d
  // operators, composed, with the whole composition under ONE oracle.
  def t10_pipeline_e2e(spark: SparkSession, dir: String): DataFrame = {
    val scored = t(spark, dir, "documents")
      .select($"doc_id", $"text",
        graft.functions.QualityExpr.qualityScore($"text").as("q"),
        graft.functions.LangIdExpr.langId($"text").as("lp"),
        Text.fingerprint($"text").as("fp"))
      .filter($"q" >= 0.7 && $"lp" === "en")
    val keep = scored.groupBy($"fp").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val surv = scored.join(keep, Seq("doc_id"), "left_semi")
      .filter(operators.Sampling.keep($"doc_id", lit(0.5)))
    operators.Packing.chunkSpans(surv, "doc_id",
        size(Text.tokens($"text")), budget = 512L, shards = 4)
      .orderBy($"doc_id")
  }

  private val t10_sql = {
    val punct =
      """CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |      / length(text) END""".stripMargin
    val stop =
      s"""CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0 ELSE
         |    CAST(len(list_filter(string_split(text, ' '),
         |      w -> w IN ($t02_stop))) AS DOUBLE)
         |      / len(string_split(text, ' ')) END""".stripMargin
    val quality =
      s"""0.4 * least(1.0, CAST(len(string_split(text,' ')) AS DOUBLE)/100)
         |    + 0.3 * (1.0 - $punct)
         |    + 0.3 * (1.0 - $stop)""".stripMargin
    def hits(ms: Seq[String]) =
      s"len(list_filter(string_split(lower(text), ' '), " +
        s"w -> w IN (${ms.map(m => s"'$m'").mkString(", ")})))"
    val en = hits(Seq("the", "and", "of", "to", "is"))
    val de = hits(Seq("der", "die", "und", "das", "ist"))
    val es = hits(Seq("el", "la", "que", "los", "por"))
    val fr = hits(Seq("le", "les", "des", "est", "une"))
    val lang =
      s"""CASE WHEN greatest($en, $de, $es, $fr) = 0 THEN 'unknown'
         |    WHEN $en = greatest($en, $de, $es, $fr) THEN 'en'
         |    WHEN $de = greatest($en, $de, $es, $fr) THEN 'de'
         |    WHEN $es = greatest($en, $de, $es, $fr) THEN 'es'
         |    WHEN $fr = greatest($en, $de, $es, $fr) THEN 'fr'
         |    ELSE 'unknown' END""".stripMargin
    s"""WITH filt AS (
       |  SELECT doc_id, text,
       |    md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
       |  FROM documents
       |  WHERE floor(($quality) * 10000 + 0.5) / 10000 >= 0.7
       |    AND ($lang) = 'en'),
       |keep AS (SELECT MIN(doc_id) AS doc_id FROM filt GROUP BY fp),
       |surv AS (
       |  SELECT f.doc_id, f.text FROM filt f
       |  JOIN keep k ON f.doc_id = k.doc_id
       |  WHERE (((f.doc_id % 2147483648) * 2654435761) % 4294967296
       |     + ((f.doc_id // 2147483648) * 2246822519) % 4294967296)
       |    % 4294967296 / 4294967296.0 < 0.5),
       |d AS (
       |  SELECT doc_id, doc_id % 4 AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
       |    CAST(COALESCE(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
       |      OVER (PARTITION BY doc_id % 4 ORDER BY doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_excl
       |  FROM surv)
       |SELECT doc_id, shard,
       |  cum_excl // 512 AS start_chunk,
       |  CASE WHEN len > 0 THEN (cum_excl + len - 1) // 512
       |       ELSE cum_excl // 512 END AS end_chunk,
       |  cum_excl % 512 AS chunk_offset
       |FROM d ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t11
  // Gopher-style repetition signals: per-doc duplicate-bigram fraction
  // and top-bigram share, one codegen pass (functions.RepStats); the
  // oracle replays the bigram hashes and recomputes the counts with
  // unnest + group-by.
  def t11_repetition(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select($"doc_id", graft.functions.RepStatsExpr.repStats($"text").as("st"))
      .select($"doc_id",
        $"st.dup".as("dup_frac"), $"st.top".as("top_frac"),
        $"st.nbig".cast("long").as("nbig"))
      .orderBy($"doc_id")

  private val t11_sql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, w,
       |         unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
       |  FROM toks),
       |grams AS (
       |  SELECT doc_id, ${Text.duck.ngramHashSql("w", "i", 2)} AS g
       |  FROM pos),
       |cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g),
       |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nbig,
       |               CAST(MAX(c) AS BIGINT) AS topc, COUNT(*) AS ndist
       |        FROM cnt GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CASE WHEN a.nbig IS NULL THEN 0.0
       |       ELSE CAST(a.nbig - a.ndist AS DOUBLE) / a.nbig END AS dup_frac,
       |  CASE WHEN a.nbig IS NULL THEN 0.0
       |       ELSE CAST(a.topc AS DOUBLE) / a.nbig END AS top_frac,
       |  COALESCE(a.nbig, 0) AS nbig
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- t12
  // Data mixing to TARGET PROPORTIONS: one count-by-stratum agg fixes
  // the largest downsample-only corpus hitting the target mix, then the
  // deterministic hash keeps each stratum at its derived rate. The
  // oracle recomputes counts, rates, and the SAME keep decision.
  def t12_mix_targets(spark: SparkSession, dir: String): DataFrame =
    operators.Sampling.sampleToMix(t(spark, dir, "documents"),
      "doc_id", "lang", Map("en" -> 0.6, "de" -> 0.25, "fr" -> 0.15))
      .groupBy($"lang")
      .agg(count(lit(1)).as("kept"), min($"doc_id").as("first_kept"),
        max($"doc_id").as("last_kept"))
      .orderBy($"lang")

  private val t12_sql =
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n,
      |    CAST(CASE WHEN lang = 'de' THEN 0.25 WHEN lang = 'en' THEN 0.6
      |         WHEN lang = 'fr' THEN 0.15 END AS DOUBLE) AS tgt
      |  FROM documents GROUP BY lang),
      |r AS (
      |  SELECT lang, tgt * (SELECT MIN(n / tgt) FROM c WHERE tgt IS NOT NULL)
      |               / n AS rate
      |  FROM c WHERE tgt IS NOT NULL),
      |s AS (
      |  SELECT d.lang, d.doc_id FROM documents d JOIN r ON d.lang = r.lang
      |  WHERE (((d.doc_id % 2147483648) * 2654435761) % 4294967296
      |     + ((d.doc_id // 2147483648) * 2246822519) % 4294967296)
      |    % 4294967296 / 4294967296.0 < r.rate)
      |SELECT lang, COUNT(*) AS kept, MIN(doc_id) AS first_kept,
      |  MAX(doc_id) AS last_kept
      |FROM s GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t13
  // TF-IDF keyword extraction: per-doc top-3 terms. Score = the exact
  // rational tf·N/df (not tf·ln(N/df)): ln is a libm call with no
  // cross-engine rounding guarantee; the rational form ranks the same
  // keywords and is bit-identical in both engines (integer products
  // under one correctly-rounded IEEE division).
  // maxVocab bounds the vocabulary (top-2^20 by df) — far above any
  // test-SF vocabulary, but the oracle carries the SAME deterministic
  // cap so both engines agree at ANY corpus size; the bound licenses
  // the broadcast under TfIdf's gate (an UNbounded vocab would
  // shuffle-join instead — web-crawl vocabularies are 10⁸⁺ tokens; see
  // TfIdf scaladoc).
  def t13_tfidf(spark: SparkSession, dir: String): DataFrame =
    operators.TfIdf.topKeywords(t(spark, dir, "documents"), "doc_id", "text",
      3, maxVocab = 1 << 20)
      .orderBy($"doc_id", $"rnk")

  private val t13_sql =
    """WITH tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, tok),
      |df0 AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      |df AS (SELECT tok, df FROM df0 ORDER BY df DESC, tok LIMIT 1048576),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |r AS (
      |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
      |    CAST(tf.tf * n.n AS DOUBLE) / df.df AS score,
      |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |      ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.tok) AS rnk
      |  FROM tf JOIN df USING (tok) CROSS JOIN n)
      |SELECT doc_id, rnk, tok, tf, df, score FROM r
      |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------- t62
  // BM25 keyword retrieval (Okapi, k1=6/5 b=3/4 as exact rationals) —
  // the keyword leg of the retrieval stack, ENTIRELY INTEGER so the
  // ranking replays bit-for-bit: idf through the 1/64-bit integer log2
  // (surprisal64 — ln is libm-unreplayable, the t13 rule), the k1/b
  // saturation ratio cross-multiplied and floor-divided at 1024×
  // resolution, contributions summed as integers (order-free).
  private val t62Terms = Seq("spark", "table", "merge")

  def t62_bm25(spark: SparkSession, dir: String): DataFrame =
    operators.TfIdf.bm25Search(t(spark, dir, "documents"), "doc_id", "text",
      t62Terms, k = 10)

  /** The BM25 CTE chain + final select at `k` — t62's oracle and the
    * keyword side of s15's fusion replay. */
  private def bm25Sql(k: Int): String = {
    val in = t62Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
       |              FROM documents),
       |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |              CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
       |hits AS (SELECT doc_id, tok FROM
       |  (SELECT doc_id, unnest(w) AS tok FROM toks)
       |  WHERE tok IN ($in)),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM hits
       |       GROUP BY doc_id, tok),
       |dfc AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |        FROM hits GROUP BY tok),
       |idf AS (SELECT tok,
       |    ${duckS64("2 * n + 2")} - ${duckS64("2 * df + 1")} AS idf64
       |  FROM dfc CROSS JOIN st),
       |sc AS (SELECT tf.doc_id,
       |    (idf.idf64 * 1024 * 44 * tf.tf * st.tot)
       |      // (20 * tf.tf * st.tot + 6 * st.tot + 18 * dl.dl * st.n) AS c
       |  FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id)
       |  CROSS JOIN st)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit,
       |  CAST(SUM(c) AS BIGINT) AS score
       |FROM sc GROUP BY doc_id
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  private val t62_sql = bm25Sql(10)

  // ---------------------------------------------------------------- s15
  // HYBRID retrieval via reciprocal-rank fusion (Cormack et al. 2009):
  // the t62 BM25 keyword top-20 fused with the s01 cosine top-20 (the
  // vec_id↔doc_id id space is shared in this corpus) through
  // Similarity.rrfFuse — 1/(60+rank) terms, each a correctly-rounded
  // small-integer division, fixed-order sum, no rounding anywhere.
  // Both shortlists are bounded by construction, so fusion cost never
  // sees the corpus.
  def s15_rrf_hybrid(spark: SparkSession, dir: String): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy($"score".desc, $"id")
    val kw = operators.TfIdf.bm25Search(t(spark, dir, "documents"),
      "doc_id", "text", t62Terms, k = 20)
      .select($"doc_id".as("id"), $"score")
      .withColumn("rk", row_number().over(wAll))
    val vec = Similarity.bruteForceTopK(t(spark, dir, "embeddings"),
      "vec_id", "embedding", queryId = 0L, k = 20)
      .select($"id", $"score")
      .withColumn("rk", row_number().over(wAll))
    Similarity.rrfFuse(kw, vec, "id", "rk", c = 60, k = 10)
      .select($"id".as("doc_id"), RF.roundBin($"rrf", 6).as("rrf"),
        $"rank_a".as("rank_kw"), $"rank_b".as("rank_vec"))
  }

  private val s15_sql =
    s"""SELECT COALESCE(kw.doc_id, vec.id) AS doc_id,
       |  floor((COALESCE(CAST(1 AS DOUBLE) / (60 + kw.rk), 0)
       |   + COALESCE(CAST(1 AS DOUBLE) / (60 + vec.rk), 0)) * 1000000
       |   + 0.5) / 1000000 AS rrf,
       |  kw.rk AS rank_kw, vec.rk AS rank_vec
       |FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
       |        AS rk
       |      FROM (${bm25Sql(20).replace("\n", "\n      ")})) kw
       |FULL JOIN (
       |  SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rk
       |  FROM (SELECT v.vec_id AS id,
       |          ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
       |            CAST(q.embedding AS DOUBLE[])), 6) AS score
       |        FROM embeddings v, embeddings q
       |        WHERE q.vec_id = 0 AND v.vec_id <> 0
       |        ORDER BY score DESC, id LIMIT 20)) vec
       |  ON vec.id = kw.doc_id
       |ORDER BY (COALESCE(CAST(1 AS DOUBLE) / (60 + kw.rk), 0)
       |   + COALESCE(CAST(1 AS DOUBLE) / (60 + vec.rk), 0)) DESC,
       |  COALESCE(kw.doc_id, vec.id)
       |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- t64
  // Deterministic WEIGHTED sampling (Sampling.weightedSample): per
  // lang, the 20 docs with the smallest decisionHash(id)/n_chars —
  // selection odds grow with length (stand-in for any quality weight),
  // the draw is a pure function of (id, w). Priority = ONE double
  // division of exact integers, identical cross-engine (emitted at
  // 6 dp via roundBin for the compare).
  def t64_weighted_sample(spark: SparkSession, dir: String): DataFrame =
    operators.Sampling.weightedSample(t(spark, dir, "documents"),
      "doc_id", "lang", "n_chars", k = 20)
      .select($"lang", $"rk", $"doc_id", $"w",
        RF.roundBin($"pri", 6).as("pri"))
      .orderBy($"lang", $"rk")

  private val t64_sql =
    """WITH h AS (
      |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
      |    CAST((((doc_id % 2147483648) * 2654435761) % 4294967296
      |      + ((doc_id // 2147483648) * 2246822519) % 4294967296)
      |      % 4294967296 AS DOUBLE) / n_chars AS pri
      |  FROM documents),
      |r AS (SELECT lang, doc_id, w, pri,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY pri, doc_id) AS rk
      |  FROM h)
      |SELECT lang, rk, doc_id, w,
      |  floor(pri * 1000000 + 0.5) / 1000000 AS pri
      |FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------- t63
  // Count-min sketch (the FREQUENCY sketch next to HLL/Bloom/census):
  // d=4 rows × w=16 buckets of integer sums — w deliberately TINY so
  // the corpus's 31-token vocabulary actually collides and the report
  // shows real CMS overcounts (est ≥ true always, the one-sided
  // guarantee; a crawl deployment sizes w ≫ heavy-hitter count).
  // Every distinct token probed: (tok, true_cnt, est, overcount).
  def t63_cms(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val toks = docs.select(explode(split($"text", " ")).as("tok"))
    val cellsDf = operators.Cms.cells(docs, "text", d = 4, w = 16)
    val truth = toks.groupBy($"tok").agg(count(lit(1)).as("true_cnt"))
    operators.Cms.estimates(cellsDf, truth.select($"tok"), "tok",
      d = 4, w = 16)
      .join(truth, "tok")
      .select($"tok", $"true_cnt", $"est",
        ($"est" - $"true_cnt").as("overcount"))
      .orderBy($"tok")
  }

  private val t63_sql = {
    def bkt(j: Int) =
      operators.Cms.bucketSql(Text.tokenCodeSql("tok"), j, 16, duck = true)
    val cellsUnion = (0 until 4).map(j =>
      s"SELECT $j AS j, ${bkt(j)} AS b FROM toks").mkString("\n  UNION ALL ")
    val probeUnion = (0 until 4).map(j =>
      s"SELECT tok, $j AS j, ${bkt(j)} AS b FROM probes")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |cells AS (SELECT j, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |  $cellsUnion) GROUP BY j, b),
       |truec AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_cnt
       |          FROM toks GROUP BY tok),
       |probes AS (SELECT DISTINCT tok FROM toks),
       |pj AS (
       |  $probeUnion),
       |est AS (SELECT tok, MIN(COALESCE(cnt, 0)) AS est
       |        FROM pj LEFT JOIN cells USING (j, b) GROUP BY tok)
       |SELECT t.tok, t.true_cnt, e.est, e.est - t.true_cnt AS overcount
       |FROM truec t JOIN est e USING (tok) ORDER BY tok""".stripMargin
  }

  // ---------------------------------------------------------------- t25
  // TF-IDF with vocabulary CONTROL (the production form): hapax pruning
  // (df ≥ 2) + a top-50 most-frequent-token cap — the bounded vocab is
  // what makes the broadcast safe at crawl scale. Oracle replays the
  // identical prune + deterministic (df DESC, tok) cap.
  def t25_tfidf_pruned(spark: SparkSession, dir: String): DataFrame =
    operators.TfIdf.topKeywords(t(spark, dir, "documents"), "doc_id", "text",
      3, minDf = 2L, maxVocab = 50)
      .orderBy($"doc_id", $"rnk")

  private val t25_sql =
    """WITH tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, tok),
      |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      |vocab AS (
      |  SELECT tok, df FROM df WHERE df >= 2
      |  ORDER BY df DESC, tok LIMIT 50),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |r AS (
      |  SELECT tf.doc_id, tf.tok, tf.tf, v.df,
      |    CAST(tf.tf * n.n AS DOUBLE) / v.df AS score,
      |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |      ORDER BY CAST(tf.tf * n.n AS DOUBLE) / v.df DESC, tf.tok) AS rnk
      |  FROM tf JOIN vocab v USING (tok) CROSS JOIN n)
      |SELECT doc_id, rnk, tok, tf, df, score FROM r
      |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------- t26
  // Trained linear quality classifier (model-based quality filtering,
  // the fastText/CCNet-style pipeline stage): score every document with
  // the in-repo-fit logistic-family model over the t02/t11/t21 signal
  // columns. Weights are the spec-pinned constants; the link is the
  // ALGEBRAIC sigmoid (no libm) and every feature is an exact rational
  // of integer counts, so the oracle replays the full chain bit-exactly.
  def t26_quality_model(spark: SparkSession, dir: String): DataFrame =
    operators.QualityClassifier.score(t(spark, dir, "documents"),
      "doc_id", "text")
      .select($"doc_id", $"pred", RF.roundBin($"score", 6).as("score"))
      .orderBy($"doc_id")

  private val t26_sql = {
    val w = operators.QualityClassifier.defaultWeights
    val punct =
      """CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |      / length(text) END""".stripMargin
    val stop =
      s"""CASE WHEN len(ws) = 0 THEN 0.0 ELSE
         |    CAST(len(list_filter(ws, x -> x IN ($t02_stop))) AS DOUBLE)
         |      / len(ws) END""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
       |pos AS (
       |  SELECT doc_id, ws AS w,
       |         unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i
       |  FROM toks),
       |grams AS (
       |  SELECT doc_id, ${Text.duck.ngramHashSql("w", "i", 2)} AS g
       |  FROM pos),
       |cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g),
       |rep AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nbig,
       |               CAST(MAX(c) AS BIGINT) AS topc, COUNT(*) AS ndist
       |        FROM cnt GROUP BY doc_id),
       |feat AS (
       |  SELECT t.doc_id,
       |    least(CAST(len(ws) AS DOUBLE) / 200, 1.0) AS f1,
       |    $punct AS f2,
       |    $stop AS f3,
       |    CASE WHEN r.nbig IS NULL THEN 0.0
       |         ELSE CAST(r.nbig - r.ndist AS DOUBLE) / r.nbig END AS f4,
       |    CASE WHEN r.nbig IS NULL THEN 0.0
       |         ELSE CAST(r.topc AS DOUBLE) / r.nbig END AS f5,
       |    CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS f6
       |  FROM toks t LEFT JOIN rep r USING (doc_id)),
       |z AS (
       |  SELECT doc_id,
       |    ${w(0)} * 1.0 + ${w(1)} * f1 + ${w(2)} * f2 + ${w(3)} * f3
       |      + ${w(4)} * f4 + ${w(5)} * f5 + ${w(6)} * f6 AS z
       |  FROM feat)
       |SELECT doc_id,
       |  CAST(CASE WHEN z >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred,
       |  floor((0.5 + z / (2 * (1 + abs(z)))) * 1000000 + 0.5) / 1000000
       |    AS score
       |FROM z ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t14
  // Corpus-level 3-gram frequency census (boilerplate / template
  // detection): top-20 gram hashes by total occurrences with distinct
  // document counts. Grams travel as i64 hashes (NgramHashes, one
  // codegen pass — the t09/t11 convention), the oracle replays the
  // same position-keyed XOR arithmetic.
  def t14_top_ngrams(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.topNgrams(t(spark, dir, "documents"),
      "doc_id", "text", n = 3, k = 20)

  private val t14_sql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, w,
       |         unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
       |  FROM toks),
       |grams AS (
       |  SELECT doc_id, ${Text.duck.ngramHashSql("w", "i", 3)} AS g
       |  FROM pos),
       |c AS (SELECT g, COUNT(*) AS total, COUNT(DISTINCT doc_id) AS ndocs
       |      FROM grams GROUP BY g)
       |SELECT g, total, ndocs FROM c
       |ORDER BY total DESC, g ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- t15
  // Deterministic train/val/test split: the t06/t12 id hash against
  // literal cumulative bounds (0.8 / 0.9 — never summed fractions:
  // 0.8+0.1 ≠ 0.9 in IEEE doubles). Census per (lang, split) proves
  // both the assignment and its stratum independence; id extremes pin
  // the exact membership.
  def t15_split(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("split", operators.Sampling.splitAssign($"doc_id",
        Seq("train" -> 0.8, "val" -> 0.9), "test"))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n"), min($"doc_id").as("first_id"),
        max($"doc_id").as("last_id"))
      .orderBy($"lang", $"split")

  private val t15_sql =
    """WITH u AS (
      |  SELECT lang, doc_id,
      |    (((doc_id % 2147483648) * 2654435761) % 4294967296
      |     + ((doc_id // 2147483648) * 2246822519) % 4294967296)
      |    % 4294967296 / 4294967296.0 AS d
      |  FROM documents)
      |SELECT lang,
      |  CASE WHEN d < 0.8 THEN 'train' WHEN d < 0.9 THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n, MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
      |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- t16
  // Duplicate-span coverage (exact-substring dedup at gram granularity,
  // the Lee-et-al signal): fraction of each doc's tokens covered by a
  // 3-gram occurring in ≥5 distinct docs. Grams travel as i64 hashes
  // (the t09/t14 convention); the frequent set broadcasts.
  def t16_dup_spans(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.dupSpanCoverage(t(spark, dir, "documents"),
      "doc_id", "text", n = 3, minDocs = 5)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")

  private val t16_sql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, w,
       |         unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
       |  FROM toks),
       |grams AS (
       |  SELECT doc_id, i, ${Text.duck.ngramHashSql("w", "i", 3)} AS g
       |  FROM pos),
       |freq AS (
       |  SELECT g FROM grams GROUP BY g
       |  HAVING COUNT(DISTINCT doc_id) >= 5),
       |cov AS (
       |  SELECT doc_id, COUNT(DISTINCT p) AS ncov FROM (
       |    SELECT gr.doc_id, unnest(generate_series(gr.i, gr.i + 2)) AS p
       |    FROM grams gr JOIN freq USING (g))
       |  GROUP BY doc_id),
       |base AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS ntok
       |  FROM documents)
       |SELECT b.doc_id, b.ntok, COALESCE(c.ncov, 0) AS ncov,
       |  floor(CAST(COALESCE(c.ncov, 0) AS DOUBLE) / b.ntok * 10000 + 0.5)
       |    / 10000 AS cov
       |FROM base b LEFT JOIN cov c USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t24
  // Exact substring-span REMOVAL (ExactSubstr, Lee et al. 2022): the
  // applied form of t16 — excise every 3-gram span occurring in ≥5
  // distinct docs from the surviving text (overlaps merged into maximal
  // spans), emitting the cleaned text + per-doc removal accounting.
  // Census shuffles i64 gram hashes; frequent set broadcasts; the span
  // merge + rebuild is one codegen pass per row (SpanExcise).
  def t24_span_removal(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.dupSpanRemove(t(spark, dir, "documents"),
      "doc_id", "text", n = 3, minDocs = 5)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")

  /** Shared ExactSubstr replay (t24/t27/t57): the census + excise CTE
    * chain; `within=true` adds the row_number()>1 within-doc repeat
    * starts (the `RepeatStarts` replay) unioned with the cross-doc
    * gram starts, plus the per-doc `n_within` audit column. */
  private def spanRemoveSql(n: Int, minDocs: Int, within: Boolean): String = {
    val withinCte = if (within)
      s"""wst AS (
         |  SELECT doc_id, i FROM (
         |    SELECT doc_id, i,
         |      row_number() OVER (PARTITION BY doc_id, g ORDER BY i) AS rn
         |    FROM grams)
         |  WHERE rn > 1),
         |allst AS (
         |  SELECT gr.doc_id, gr.i FROM grams gr JOIN freq USING (g)
         |  UNION
         |  SELECT doc_id, i FROM wst),
         |nwi AS (
         |  SELECT doc_id, COUNT(*) AS n_within FROM wst GROUP BY doc_id),
         |""".stripMargin
    else
      """allst AS (
        |  SELECT gr.doc_id, gr.i FROM grams gr JOIN freq USING (g)),
        |""".stripMargin
    val nwCol = if (within) "COALESCE(nw.n_within, 0) AS n_within,\n  " else ""
    val nwJoin = if (within) "LEFT JOIN nwi nw USING (doc_id)\n" else ""
    s"""WITH toks AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, w,
       |         unnest(generate_series(1, greatest(len(w) - ${n - 1}, 0))) AS i
       |  FROM toks),
       |grams AS (
       |  SELECT doc_id, i, ${Text.duck.ngramHashSql("w", "i", n)} AS g
       |  FROM pos),
       |freq AS (
       |  SELECT g FROM grams GROUP BY g
       |  HAVING COUNT(DISTINCT doc_id) >= $minDocs),
       |$withinCte""".stripMargin +
    s"""cp AS (
       |  SELECT DISTINCT doc_id, p FROM (
       |    SELECT doc_id, unnest(generate_series(i, i + ${n - 1})) AS p
       |    FROM allst)),
       |spans AS (
       |  SELECT doc_id,
       |    COUNT(*) FILTER (WHERE prev IS NULL OR p > prev + 1) AS nspans,
       |    COUNT(*) AS removed
       |  FROM (SELECT doc_id, p,
       |          lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
       |        FROM cp)
       |  GROUP BY doc_id),
       |tokpos AS (
       |  SELECT doc_id, w,
       |         unnest(generate_series(1, len(w))) AS tp
       |  FROM toks),
       |clean AS (
       |  SELECT t.doc_id,
       |    COALESCE(string_agg(t.w[t.tp], ' ' ORDER BY t.tp)
       |      FILTER (WHERE c.p IS NULL), '') AS clean_text
       |  FROM tokpos t LEFT JOIN cp c ON c.doc_id = t.doc_id AND c.p = t.tp
       |  GROUP BY t.doc_id)
       |SELECT b.doc_id, len(b.w) AS ntok,
       |  ${nwCol}COALESCE(s.nspans, 0) AS nspans,
       |  COALESCE(s.removed, 0) AS tok_removed,
       |  c.clean_text,
       |  len(b.text) - len(c.clean_text) AS chars_removed
       |FROM toks b
       |LEFT JOIN spans s USING (doc_id)
       |${nwJoin}JOIN clean c USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin
  }

  private val t24_sql = spanRemoveSql(n = 3, minDocs = 5, within = false)

  // ---------------------------------------------------------------- t57
  // FULL ExactSubstr (both Lee-et-al duplication cases): t24's
  // cross-document excision + WITHIN-document repeated spans via the
  // row-local RepeatStarts scan (keep-first — occurrences 2..k of a
  // gram inside one doc are excised, the first survives unless
  // corpus-frequent). Only sub-n spans are missed now (PropertySpec
  // pins the tightened bound). No extra shuffle over t24.
  def t57_span_removal_full(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.dupSpanRemoveFull(t(spark, dir, "documents"),
      "doc_id", "text", n = 3, minDocs = 5)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")

  private val t57_sql = spanRemoveSql(n = 3, minDocs = 5, within = true)

  // ---------------------------------------------------------------- t27
  // STREAMING ExactSubstr (the t24 production twin): the document feed
  // cleaned per micro-batch against a static frequent-gram set built
  // from the reference corpus. Stateless per batch — foreachBatch
  // appends to parquet (disk is the state, the ivfPqIngest pattern), a
  // checkpointed replay appends nothing. Because the static set here is
  // the same corpus's census, the streamed result must equal batch t24
  // exactly — the oracle IS t24's SQL.
  def t27_stream_span_clean(spark: SparkSession, dir: String): DataFrame = {
    val batch = t(spark, dir, "documents")
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val stage = s"/tmp/graft_stream/$key/documents"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      sources.Store.setSplayed(batch, stage)
    val base = s"/tmp/graft_stream/$key/span_clean"
    streaming.Streams.spanRemoveStream(spark, stage, batch,
      "doc_id", "text", n = 3,
      freqOf = ss => operators.CorpusStats.frequentGrams(
        Tables.load(ss, dir, "documents"), "doc_id", "text", 3, 5),
      outDir = s"$base/out", checkpoint = s"$base/ckpt")
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  // ------------------------------------------------------------- t28/t29
  // BPE subword tokenizer (Sennrich et al. 2016): t28 = the trained
  // merge table, t29 = the corpus token census under those merges. The
  // only corpus-sized work is ONE word-frequency shuffle; training runs
  // on the bounded dictionary (top-2^20 by freq, word tie-break — the
  // cap rides in the oracle like t13's), and encoding touches each
  // DISTINCT word once. The oracle replays training verbatim: stage k
  // derives the best pair from stage k-1's counts (count DESC, lhs,
  // rhs) and rewrites every word with a left-to-right recursive-CTE
  // walker; its stage-K word states ARE the rank-order encodings, which
  // equal Spark's greedy lowest-rank-first encode (merge k can only
  // create pairs containing its new token, all ranked > k).
  private val bpeMergeCount = 40

  def t28_bpe_merges(spark: SparkSession, dir: String): DataFrame =
    operators.Bpe.mergesDf(spark,
      operators.Bpe.trainMergesFromFreq(bpeWordFreq(spark, dir)._1,
        bpeMergeCount))
      .orderBy($"rank")

  /** Cached (word, freq) per (session, documents dir, source stamp) —
    * ONE resident vocabulary-bounded cache entry shared by the whole
    * BPE chain (t28/t29/t32/t37), instead of each query leaving its
    * own plan-deduped entry. */
  /** Generic per-(session, dir, source-stamp) model memo. ONE resident
    * entry per live (session, dir): a superseded entry for the same
    * session+dir (regenerated testdata) is released on the next fill,
    * and so are entries whose session has been GC'd. Keyed on
    * `spark.sessionUUID` — `System.identityHashCode` is NOT unique
    * (two live sessions can collide, handing one a cached Dataset
    * bound to the other: the q55 session-bound trap) — and holding the
    * session only WEAKLY so a dead session's entries release instead
    * of persisting until a same-prefix key happens along. */
  private final class SessionMemo[V](make: (SparkSession, String) => V,
                                     release: V => Unit) {
    private val m = new java.util.concurrent.ConcurrentHashMap[
      String, (java.lang.ref.WeakReference[SparkSession], V)]()
    def apply(spark: SparkSession, dir: String, stamp: Long): V = {
      val pfx = s"${org.apache.spark.sql.graftshim.ColumnInternals
        .sessionUUID(spark)}@$dir@"
      val key = s"$pfx$stamp"
      val hit = m.get(key)
      if (hit != null) hit._2
      else {
        import scala.jdk.CollectionConverters._
        m.asScala.toList.foreach { case (k, (ref, _)) =>
          val dead = ref.get == null
          if (dead || k.startsWith(pfx))
            Option(m.remove(k)).foreach { e =>
              // a GC'd session's cached tables died with it — only
              // live superseded entries need an explicit unpersist
              if (!dead)
                try release(e._2)
                catch { case _: IllegalStateException => () }
            }
        }
        m.computeIfAbsent(key,
          _ => (new java.lang.ref.WeakReference(spark), make(spark, dir)))._2
      }
    }
  }

  /** Cached (word-freq DataFrame, vocabulary count) — the count both
    * materializes the cache AND is the vocabulary size every broadcast
    * gate downstream needs, memoized here so no query pays a per-call
    * `freqDf.count()` action (the round-12 t32 regression: the gate's
    * extra job per call). */
  private val wordFreqMemo = new SessionMemo[(DataFrame, Long)](
    (spark, dir) => {
      val df =
        operators.Bpe.wordFreq(t(spark, dir, "documents"), "text").cache()
      (df, df.count())
    },
    _._1.unpersist())
  private def bpeWordFreq(spark: SparkSession,
                          dir: String): (DataFrame, Long) =
    wordFreqMemo(spark, dir, srcStamp(dir, "documents.parquet"))

  def t29_bpe_tokens(spark: SparkSession, dir: String): DataFrame = {
    // the shared cached word-freq feeds BOTH training and the census —
    // the raw corpus is scanned exactly once per process per dir for
    // the whole t28/t29/t32 chain
    val (wf, _) = bpeWordFreq(spark, dir)
    val merges = operators.Bpe.trainMergesFromFreq(wf, bpeMergeCount)
    operators.Bpe.tokenCensusFromFreq(wf, merges)
      .orderBy($"freq".desc, $"token".asc)
  }

  // one training stage: pair counts over the vocab (iv), best pair,
  // left-to-right rewrite of EVERY word (encode applies universally)
  private def bpeStageSql(k: Int): String =
    s"""pairs_$k AS MATERIALIZED (
       |  SELECT s1, s2, SUM(freq) AS cnt FROM (
       |    SELECT freq, syms[i] AS s1, syms[i+1] AS s2
       |    FROM words_${k - 1}, UNNEST(range(1, len(syms))) AS t(i) WHERE iv)
       |  GROUP BY s1, s2),
       |best_$k AS MATERIALIZED (
       |  SELECT s1, s2 FROM pairs_$k ORDER BY cnt DESC, s1, s2 LIMIT 1),
       |rw_$k AS (
       |  SELECT word, freq, iv, syms, 1 AS i, CAST([] AS VARCHAR[]) AS acc
       |  FROM words_${k - 1}
       |  UNION ALL
       |  SELECT word, freq, iv, syms,
       |    CASE WHEN i < len(syms) AND syms[i] = (SELECT s1 FROM best_$k)
       |              AND syms[i+1] = (SELECT s2 FROM best_$k)
       |         THEN i + 2 ELSE i + 1 END,
       |    CASE WHEN i < len(syms) AND syms[i] = (SELECT s1 FROM best_$k)
       |              AND syms[i+1] = (SELECT s2 FROM best_$k)
       |         THEN list_append(acc, syms[i] || syms[i+1])
       |         ELSE list_append(acc, syms[i]) END
       |  FROM rw_$k WHERE i <= len(syms)),
       |words_$k AS MATERIALIZED (
       |  SELECT word, freq, iv, acc AS syms FROM rw_$k
       |  WHERE i = len(syms) + 1)""".stripMargin

  private def bpeHeadSql: String =
    """WITH RECURSIVE words_0 AS MATERIALIZED (
      |  SELECT word, freq, list_append(string_split(word, ''), '</w>') AS syms,
      |         ROW_NUMBER() OVER (ORDER BY freq DESC, word) <= 1048576 AS iv
      |  FROM (
      |    SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
      |    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |    WHERE tok <> '' GROUP BY tok)),
      |""".stripMargin +
      (1 to bpeMergeCount).map(bpeStageSql).mkString(",\n")

  private lazy val t28_sql =
    bpeHeadSql + s"""
      |SELECT k AS rank, s1 AS lhs, s2 AS rhs FROM (
      |${(1 to bpeMergeCount)
         .map(k => s"SELECT $k AS k, s1, s2 FROM best_$k")
         .mkString(" UNION ALL ")}
      |) ORDER BY rank""".stripMargin

  private lazy val t29_sql =
    bpeHeadSql + s"""
      |SELECT token, CAST(SUM(freq) AS BIGINT) AS freq FROM (
      |  SELECT unnest(syms) AS token, freq FROM words_$bpeMergeCount)
      |GROUP BY token ORDER BY freq DESC, token""".stripMargin

  // ---------------------------------------------------------------- t65
  // BYTE-level BPE — the production tokenizer form (GPT-2-style byte
  // fallback): pre-tokens come from Bpe.preTokRe (CJK per code point,
  // letter/digit/whitespace/symbol runs — lossless, no whitespace
  // assumption), and seed symbols are the pre-token's UTF-8 BYTES as
  // hex pairs, so every script tokenizes from 256 seeds with no OOV
  // symbol possible. Same bounded shape as t28 (ONE word-freq shuffle,
  // driver merge loop over the top-2^20 dictionary); the oracle is the
  // SAME 40-stage merge replay with the byte-hex seed head — both
  // engines spell the seeds via hex(encode(word)) and the identical
  // RE2∩Java pre-tokenization regex.
  def t65_bpe_bytes(spark: SparkSession, dir: String): DataFrame =
    operators.Bpe.mergesDf(spark,
      operators.Bpe.trainMergesBytesFromFreq(
        operators.Bpe.byteWordFreq(t(spark, dir, "documents"), "text"),
        bpeMergeCount))
      .orderBy($"rank")

  private lazy val t65_sql = {
    // the regex is injected OUTSIDE the stripMargin templates (it
    // contains '|' alternations — the t56 re-strip lesson)
    val head =
      """WITH RECURSIVE words_0 AS MATERIALIZED (
        |  SELECT word, freq,
        |         list_append(regexp_extract_all(hex(encode(word)), '..'), '</w>') AS syms,
        |         ROW_NUMBER() OVER (ORDER BY freq DESC, word) <= 1048576 AS iv
        |  FROM (
        |    SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
        |    FROM (SELECT unnest(regexp_extract_all(text, """.stripMargin +
      s"'${operators.Bpe.preTokRe}'" +
      """)) AS tok FROM documents)
        |    WHERE tok <> '' GROUP BY tok)),
        |""".stripMargin +
      (1 to bpeMergeCount).map(bpeStageSql).mkString(",\n")
    head + s"""
      |SELECT k AS rank, s1 AS lhs, s2 AS rhs FROM (
      |${(1 to bpeMergeCount)
         .map(k => s"SELECT $k AS k, s1, s2 FROM best_$k")
         .mkString(" UNION ALL ")}
      |) ORDER BY rank""".stripMargin
  }

  // ---------------------------------------------------------------- t68
  // URL canonicalization + host-level dedup/caps — the crawl stage
  // BEFORE text dedup (functions/Url): messy per-doc URLs are
  // CONSTRUCTED deterministically from doc fields (the t56
  // constructed-page precedent — both engines build the identical
  // string), canonicalized (case/ports/fragments/tracking params),
  // then the t17 per-source-cap shape keyed on the canonical host.
  // Pure string arithmetic from ONE dual-dialect home, so the oracle
  // replays it bit-for-bit.
  private def demoUrlSql(duck: Boolean): String = {
    val str = if (duck) "VARCHAR" else "STRING"
    s"(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || " +
      s"'://WWW.' || source || '.Example.COM' || " +
      s"CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END || " +
      s"'/docs/' || CAST(doc_id % 5 AS $str) || " +
      s"CASE WHEN doc_id % 4 = 0 " +
      s"THEN '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 3 AS $str) " +
      s"WHEN doc_id % 4 = 1 " +
      s"THEN '?id=' || CAST(doc_id % 7 AS $str) || '&utm_medium=email&ref=tw' " +
      s"WHEN doc_id % 4 = 2 THEN '?gclid=abc' || CAST(doc_id AS $str) || '#section-2' " +
      s"ELSE '#top' END)"
  }

  def t68_url_canon(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("url", expr(demoUrlSql(duck = false)))
    graft.functions.Url.hostCapCensus(docs, "doc_id", "url", cap = 3)
      .orderBy($"host")
  }

  private lazy val t68_sql =
    s"""WITH u AS MATERIALIZED (
       |  SELECT doc_id, ${demoUrlSql(duck = true)} AS url
       |  FROM documents),
       |c AS MATERIALIZED (
       |  SELECT doc_id, ${graft.functions.Url.canonSql("url", duck = true)} AS canon,
       |         ${graft.functions.Url.hostSql("url", duck = true)} AS host
       |  FROM u),
       |pc AS (
       |  SELECT host, canon, CAST(COUNT(*) AS BIGINT) AS n_raw,
       |         MIN(doc_id) AS first_id
       |  FROM c GROUP BY 1, 2),
       |rk AS (
       |  SELECT host, canon, n_raw,
       |         ROW_NUMBER() OVER (PARTITION BY host
       |           ORDER BY first_id, canon) AS rk
       |  FROM pc)
       |SELECT host, CAST(SUM(n_raw) AS BIGINT) AS n_urls,
       |       CAST(COUNT(*) AS BIGINT) AS n_canon,
       |       CAST(SUM(CASE WHEN rk <= 3 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_kept,
       |       MIN(canon) AS first_url
       |FROM rk GROUP BY host ORDER BY host""".stripMargin

  // ---------------------------------------------------------------- t66
  // TRAINED language ID (operators/LangNb): multinomial Naive Bayes
  // over the top-4096 char trigrams — the production replacement for
  // t03's marker-word heuristic. Fit on the doc_id%5 train split (pure
  // counting), scored in the integer 1/64-bit log2, confusion census
  // over the held-out split. The oracle replays FIT AND SCORING as
  // materialized CTEs (the d14/s14 whole-chain rule).
  def t66_langid_trained(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val train = docs.filter($"doc_id" % 5 =!= 4L)
    val test = docs.filter($"doc_id" % 5 === 4L)
    val m = operators.LangNb.fit(train, "text", "lang")
    operators.LangNb.predict(test, "doc_id", "text", m)
      .join(test.select($"doc_id", $"lang"), Seq("doc_id"))
      .groupBy($"lang", $"lang_pred").agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"lang_pred")
  }

  private lazy val t66_sql =
    s"""WITH tr AS MATERIALIZED (
       |  SELECT doc_id, text, lang FROM documents WHERE doc_id % 5 <> 4),
       |te AS MATERIALIZED (
       |  SELECT doc_id, text, lang FROM documents WHERE doc_id % 5 = 4),
       |tg AS (
       |  SELECT lang, substr(text, CAST(i AS INTEGER), 3) AS gram
       |  FROM tr, UNNEST(range(1, greatest(length(text) - 2, 0) + 1)) AS u(i)),
       |cnt AS MATERIALIZED (
       |  SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tg GROUP BY 1, 2),
       |vocab AS MATERIALIZED (
       |  SELECT gram FROM (
       |    SELECT gram, SUM(c) AS s FROM cnt GROUP BY 1
       |    ORDER BY s DESC, gram LIMIT 4096)),
       |nvoc AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
       |cv AS MATERIALIZED (
       |  SELECT lang, gram, c FROM cnt JOIN vocab USING (gram)),
       |langs AS (SELECT DISTINCT lang FROM tr),
       |tot AS (
       |  SELECT l.lang, COALESCE(s.t, 0) + (SELECT v FROM nvoc) AS tv
       |  FROM langs l LEFT JOIN (
       |    SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM cv GROUP BY 1
       |  ) s USING (lang)),
       |model AS MATERIALIZED (
       |  SELECT lang, gram, ${s64u("c + 1")} AS w64 FROM cv),
       |base AS (SELECT lang, ${s64u("tv")} AS b64 FROM tot),
       |eg AS MATERIALIZED (
       |  SELECT doc_id, gram FROM (
       |    SELECT doc_id, substr(text, CAST(i AS INTEGER), 3) AS gram
       |    FROM te, UNNEST(range(1, greatest(length(text) - 2, 0) + 1)) AS u(i))
       |  JOIN vocab USING (gram)),
       |nv AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM eg GROUP BY 1),
       |hits AS MATERIALIZED (
       |  SELECT doc_id, lang, CAST(SUM(w64) AS BIGINT) AS sw
       |  FROM eg JOIN model USING (gram) GROUP BY 1, 2),
       |sc AS (
       |  SELECT nv.doc_id, b.lang,
       |         COALESCE(h.sw, 0) - nv.n * b.b64 AS score64
       |  FROM nv CROSS JOIN base b
       |  LEFT JOIN hits h ON h.doc_id = nv.doc_id AND h.lang = b.lang),
       |pred AS (
       |  SELECT doc_id, lang AS lang_pred FROM (
       |    SELECT doc_id, lang,
       |           ROW_NUMBER() OVER (PARTITION BY doc_id
       |             ORDER BY score64 DESC, lang) AS rk FROM sc)
       |  WHERE rk = 1)
       |SELECT te.lang, COALESCE(p.lang_pred, 'unknown') AS lang_pred,
       |       CAST(COUNT(*) AS BIGINT) AS n
       |FROM te LEFT JOIN pred p USING (doc_id)
       |GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin

  // ---------------------------------------------------------------- t32
  // The tokenize-then-pack final step, with the TRAINED tokenizer: BPE
  // merges fit from the word-freq dict, each distinct word's subword
  // count broadcast back as a lookup table (corpus token counting is a
  // hash probe, never a per-row merge loop), per-doc BPE token totals,
  // then t08's concat-and-chunk span arithmetic at a 512-token budget.
  // The oracle chains the full BPE replay (words_40 lengths), the
  // count join, and the window-cumsum pack. The lookup broadcast is
  // GATED on the measured vocabulary size (Bpe.docTokenCounts — the
  // TfIdf pattern; PlanShapeSpec pins hint-under-gate vs no-hint-above)
  // so a 10⁸-distinct-word crawl shuffle-joins instead of OOMing.
  def t32_bpe_pack(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val (wf, nVocab) = bpeWordFreq(spark, dir)
    val merges = operators.Bpe.trainMergesFromFreq(wf, bpeMergeCount)
    val docTok =
      operators.Bpe.docTokenCounts(docs, "doc_id", "text", wf, merges,
        knownVocab = Some(nVocab))
    operators.Packing.chunkSpans(docTok, "doc_id", $"n_btok",
      budget = 512L, shards = 4)
      .orderBy($"doc_id")
  }

  private lazy val t32_sql =
    bpeHeadSql + s""",
      |wt AS (SELECT word, CAST(len(syms) AS BIGINT) AS ntok
      |       FROM words_$bpeMergeCount),
      |dt AS (
      |  SELECT doc_id, CAST(SUM(ntok) AS BIGINT) AS len
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |        FROM documents) dw
      |  JOIN wt USING (word)
      |  WHERE word <> '' GROUP BY doc_id),
      |d AS (
      |  SELECT doc_id, doc_id % 4 AS shard, len,
      |    CAST(COALESCE(SUM(len)
      |      OVER (PARTITION BY doc_id % 4 ORDER BY doc_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum_excl
      |  FROM dt)
      |SELECT doc_id, shard,
      |  cum_excl // 512 AS start_chunk,
      |  CASE WHEN len > 0 THEN (cum_excl + len - 1) // 512
      |       ELSE cum_excl // 512 END AS end_chunk,
      |  cum_excl % 512 AS chunk_offset
      |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t43
  // Tokenizer fertility card — the standard multilingual
  // tokenizer-health metric (tokens per word and characters per token,
  // per language): a vocabulary trained on a skewed mix over-segments
  // under-represented languages, and THIS is the audit that shows it.
  // Composition: the cached word-freq dict + trained merges + the
  // broadcast (gated) per-word token-count lookup — so the corpus-side
  // work is ONE word explode + hash probe + (lang) aggregation. The
  // two ratio columns are single IEEE divisions of exact integers (the
  // t33 bpt precedent — deterministic cross-engine). The oracle
  // replays the 40-stage BPE chain and reads word token counts off
  // the final stage.
  def t43_bpe_fertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val (wf, nVocab) = bpeWordFreq(spark, dir)
    val merges = operators.Bpe.trainMergesFromFreq(wf, bpeMergeCount)
    val wt = operators.Bpe.wordTokenCounts(wf, merges)
    val side =
      if (nVocab <= operators.Bpe.maxBroadcastVocab) broadcast(wt) else wt
    docs.select($"lang", explode(split($"text", " ")).as("word"))
      .filter($"word" =!= "")
      .join(side, "word")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_words"),
        sum($"ntok").as("n_btok"),
        sum(length($"word")).cast("long").as("n_chars"))
      .select($"lang", $"n_words", $"n_btok", $"n_chars",
        ($"n_btok".cast("double") / $"n_words".cast("double"))
          .as("fertility"),
        ($"n_chars".cast("double") / $"n_btok".cast("double"))
          .as("chars_per_tok"))
      .orderBy($"lang")
  }

  private lazy val t43_sql =
    bpeHeadSql + s""",
      |wt AS (SELECT word, CAST(len(syms) AS BIGINT) AS ntok
      |       FROM words_$bpeMergeCount),
      |dw AS (SELECT lang, unnest(string_split(text, ' ')) AS word
      |       FROM documents),
      |j AS (SELECT lang, dw.word, wt.ntok FROM dw
      |      JOIN wt USING (word) WHERE word <> '')
      |SELECT lang, COUNT(*) AS n_words,
      |  CAST(SUM(ntok) AS BIGINT) AS n_btok,
      |  CAST(SUM(length(word)) AS BIGINT) AS n_chars,
      |  CAST(SUM(ntok) AS DOUBLE) / COUNT(*) AS fertility,
      |  CAST(SUM(length(word)) AS DOUBLE) / SUM(ntok) AS chars_per_tok
      |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- t49
  // OPTIMAL (Viterbi) unigram segmentation over the trained BPE vocab
  // (SentencePiece's encode, Kudo 2018) with integer 1/64-bit
  // surprisal piece costs from the t29 census — greedy BPE is a
  // feasible segmentation of the same vocabulary, so this is the
  // strictly-≤-cost segmenter (optimality spec-pinned). The oracle
  // replays the WHOLE dynamic program as 12 generated MATERIALIZED CTE
  // stages over symbol positions (the BPE 40-stage replay precedent),
  // tie-broken (cost, n_pieces, earliest split) so the segmentation —
  // not just its cost — is unique and engine-exact.
  def t49_unigram_viterbi(spark: SparkSession, dir: String): DataFrame = {
    val (wf, _) = bpeWordFreq(spark, dir)
    val merges = operators.Bpe.trainMergesFromFreq(wf, bpeMergeCount)
    val census = operators.Bpe.tokenCensusFromFreq(wf, merges)
    operators.Unigram.viterbiTable(wf, census, maxSyms = 12,
      topWords = 500, maxPieceSyms = 8)
      .orderBy($"word")
  }

  private def s64u(q: String): String =
    s"(64 * (length(bin($q)) - 1) " +
      s"+ ((($q) << 6) >> (length(bin($q)) - 1)) - 64)"

  private def uniStageSql(p: Int): String = {
    val qs = (math.max(0, p - 8) until p).map(q =>
      s"SELECT word, cost, np, seg, $q AS q FROM udp_$q")
      .mkString("\n      UNION ALL ")
    s"""udp_$p AS MATERIALIZED (
       |  SELECT word, cost, np, seg FROM (
       |    SELECT word, cost, np, seg,
       |      ROW_NUMBER() OVER (PARTITION BY word ORDER BY cost, np, q)
       |        AS rk
       |    FROM (
       |      SELECT x.word,
       |        x.cost + ${s64u("t.cv")}
       |               - ${s64u("COALESCE(c.cnt, 0) + 1")} AS cost,
       |        x.np + 1 AS np,
       |        CASE WHEN x.np = 0 THEN x.piece
       |             ELSE x.seg || '-' || x.piece END AS seg,
       |        x.q
       |      FROM (
       |        SELECT b.word, b.cost, b.np, b.seg, b.q,
       |          array_to_string(s.syms[b.q+1:$p], '') AS piece
       |        FROM ($qs) b
       |        JOIN usel s USING (word)
       |        WHERE len(s.syms) >= $p) x
       |      LEFT JOIN ucen c ON c.token = x.piece
       |      CROSS JOIN utot t
       |      WHERE $p - x.q = 1 OR c.cnt IS NOT NULL))
       |  WHERE rk = 1)""".stripMargin
  }

  private lazy val t49_sql =
    bpeHeadSql + s""",
      |ucen AS MATERIALIZED (
      |  SELECT token, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(syms) AS token, freq FROM words_$bpeMergeCount)
      |  GROUP BY token),
      |utot AS MATERIALIZED (
      |  SELECT CAST(SUM(cnt) AS BIGINT) + COUNT(*) AS cv FROM ucen),
      |usel AS MATERIALIZED (
      |  SELECT word, syms FROM (
      |    SELECT word, freq, syms,
      |      ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rn
      |    FROM words_0 WHERE len(syms) <= 12)
      |  WHERE rn <= 500),
      |udp_0 AS MATERIALIZED (
      |  SELECT word, CAST(0 AS BIGINT) AS cost, 0 AS np, '' AS seg
      |  FROM usel),
      |${(1 to 12).map(uniStageSql).mkString(",\n")},
      |ufin AS (
      |${(1 to 12).map(p =>
         s"  SELECT $p AS p, word, cost, np, seg FROM udp_$p")
         .mkString("\n  UNION ALL\n")}
      |)
      |SELECT s.word, u.np AS n_pieces, u.cost AS cost64, u.seg AS seg
      |FROM usel s JOIN ufin u ON u.word = s.word AND u.p = len(s.syms)
      |ORDER BY s.word""".stripMargin

  // ---------------------------------------------------------------- t50
  // Snapshot drift census — the monitoring operator a rolling corpus
  // needs: per-token log₂ RATE drift between two snapshots (doc_id
  // halves as the proxy), in exact 1/64-bit integers —
  // d64 = (s64(cA+1)−s64(TA+1)) − (s64(cB+1)−s64(TB+1)) — and the top
  // 50 movers by |d64|. ONE token-census shuffle (conditional sums per
  // half, map-side combined), a 1-row totals broadcast, a narrow s64
  // map, and a TakeOrderedAndProject top-k. At 100 TB: census-bounded,
  // never corpus-quadratic.
  def t50_drift_census(spark: SparkSession, dir: String): DataFrame = {
    val tok = t(spark, dir, "documents")
      .select(($"doc_id" % 2 === 0).as("a"),
        explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val c = tok.groupBy($"token").agg(
      sum(when($"a", 1L).otherwise(0L)).as("cnt_a"),
      sum(when(!$"a", 1L).otherwise(0L)).as("cnt_b"))
    val tot = c.agg(sum($"cnt_a").as("ta"), sum($"cnt_b").as("tb"))
    import operators.NgramLm.surprisal64
    c.crossJoin(broadcast(tot))
      .withColumn("d64",
        (surprisal64($"cnt_a" + 1) - surprisal64($"ta" + 1)) -
          (surprisal64($"cnt_b" + 1) - surprisal64($"tb" + 1)))
      .select($"token", $"cnt_a", $"cnt_b", $"d64")
      .orderBy(abs($"d64").desc, $"token")
      .limit(50)
  }

  private val t50_sql = {
    def s64(q: String): String =
      s"(64 * (length(bin($q)) - 1) " +
        s"+ ((($q) << 6) >> (length(bin($q)) - 1)) - 64)"
    val d64 = s"(${s64("cnt_a + 1")} - ${s64("ta + 1")})" +
      s" - (${s64("cnt_b + 1")} - ${s64("tb + 1")})"
    s"""WITH tk AS (
       |  SELECT doc_id % 2 = 0 AS a,
       |         unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |c AS (
       |  SELECT token,
       |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
       |    CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
       |  FROM tk WHERE token <> '' GROUP BY token),
       |t AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS ta,
       |             CAST(SUM(cnt_b) AS BIGINT) AS tb FROM c)
       |SELECT token, cnt_a, cnt_b, $d64 AS d64
       |FROM c, t
       |ORDER BY abs($d64) DESC, token LIMIT 50""".stripMargin
  }

  // ---------------------------------------------------------------- t51
  // BLOOM-FILTER decontamination — the zero-shuffle form of t09: the
  // benchmark gram set folds into a 2^20-bit Bloom array (a 128 KiB
  // model artifact, bounded by the filter geometry regardless of
  // benchmark size), and the corpus side is ONE codegen scan — no
  // explode, no join, no aggregation; the per-doc distinct-hit count
  // folds row-locally inside functions.BloomGramHits. At 100 TB this
  // is the difference between a corpus-wide gram shuffle and a pure
  // map over the scan. False positives are deterministic (same
  // arithmetic both engines) and false negatives impossible; the spec
  // pins n_bloom ≥ t09's exact n_hits per doc.
  def t51_bloom_decontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val bits = operators.Decontam.bloomBits(
      docs.filter($"doc_id" % 97 === 0), "text", n = 3, k = 3, mBits = 1 << 20)
    operators.Decontam.bloomReport(docs.filter($"doc_id" % 97 =!= 0),
        "doc_id", "text", n = 3, k = 3, mBits = 1 << 20, bits)
      .orderBy($"doc_id")
  }

  private val t51_sql = {
    import graft.functions.BloomGramHits.positionSql
    val m = 1 << 20
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, w,
       |         unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
       |  FROM toks),
       |grams AS (
       |  SELECT doc_id, ${Text.duck.ngramHashSql("w", "i", 3)} AS g
       |  FROM pos),
       |bps AS (
       |  SELECT DISTINCT unnest([${(0 until 3).map(j => positionSql("g", j, m)).mkString(", ")}]) AS p
       |  FROM (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)),
       |cg AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
       |SELECT doc_id, COUNT(*) AS n_bloom
       |FROM cg
       |WHERE ${(0 until 3).map(j =>
             s"${positionSql("g", j, m)} IN (SELECT p FROM bps)")
             .mkString("\n  AND ")}
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t52
  // STREAMING Bloom decontamination (the t51 production twin, the
  // t35/t41 pattern): the benchmark registry folds ONCE into the
  // PERSISTED 128 KiB Bloom artifact (Decontam.buildBloomFilter;
  // later eval suites appendToBloomFilter — a pure bitwise OR), and
  // the live document feed probes it per micro-batch — still the
  // zero-shuffle codegen scan inside every batch, because the
  // artifact is a plain long[], not a session-bound Dataset.
  // Parameter-stamped stage, disk-as-state, replay appends nothing.
  // The oracle IS t51's SQL — stream must equal batch.
  private[graft] def bloomStreamBase(dir: String, n: Int, k: Int,
                                     mBits: Int): String = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    s"/tmp/graft_stream/$key/bloom_n${n}_k${k}_m$mBits" +
      s"_s${srcStamp(dir, "documents.parquet")}"
  }

  def t52_stream_bloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val stage = s"/tmp/graft_stream/$key/documents"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      sources.Store.setSplayed(docs, stage)
    val base = bloomStreamBase(dir, 3, 3, 1 << 20)
    val filterPath = s"$base/filter"
    if (!new java.io.File(s"$filterPath/meta/_SUCCESS").exists())
      operators.Decontam.buildBloomFilter(docs.filter($"doc_id" % 97 === 0),
        "text", n = 3, k = 3, mBits = 1 << 20, filterPath)
    streaming.Streams.bloomDecontamStream(spark, stage, docs,
        "doc_id", "text", filterPath,
        outDir = s"$base/out", checkpoint = s"$base/ckpt",
        where = Some("doc_id % 97 <> 0"))
      .orderBy($"doc_id")
  }

  // t52's oracle IS t51's SQL (stream == batch)
  private lazy val t52_sql = t51_sql

  // ---------------------------------------------------------------- t38
  // Corpus audit card (the governance report a 100 TB shard audit
  // reads): per (lang, source) slice — docs, exact token mass, Gopher
  // pass count (the t21 integer gates), and the exact-duplicate count
  // via md5 fingerprints. Pure composition: one narrow map (flags +
  // fingerprint are codegen'd), ONE (lang, source) aggregation shuffle
  // with a two-level distinct expansion for the fingerprint count.
  // Every cell is an exact integer — the card hash-matches in DuckDB.
  def t38_corpus_card(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    docs.select($"lang", $"source",
        size(split($"text", " ")).cast("long").as("wc"),
        md5($"text").as("fp"),
        operators.QualityRules.keepFlag($"text",
          minWords = 35, maxWords = 70).as("keep"))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"wc").as("n_tokens"),
        sum($"keep").as("gopher_pass"),
        countDistinct($"fp").as("n_uniq"),
        (count(lit(1)) - countDistinct($"fp")).as("n_dup"))
      .orderBy($"lang", $"source")
  }

  private val t38_sql =
    """WITH w AS (
      |  SELECT doc_id, lang, source, string_split(text, ' ') AS ws,
      |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS sl,
      |    md5(text) AS fp
      |  FROM documents),
      |f AS (
      |  SELECT lang, source, CAST(len(ws) AS BIGINT) AS wc, fp,
      |    (CASE WHEN len(ws) BETWEEN 35 AND 70 THEN 1 ELSE 0 END) *
      |    (CASE WHEN sl >= 3 * len(ws) AND sl <= 10 * len(ws)
      |      THEN 1 ELSE 0 END) *
      |    (CASE WHEN
      |      (CASE WHEN list_contains(ws, 'the') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'a') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'of') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'to') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'and') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'in') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'that') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'is') THEN 1 ELSE 0 END) >= 2
      |      THEN 1 ELSE 0 END) *
      |    (CASE WHEN 2 * len(list_distinct(ws)) >= len(ws)
      |      THEN 1 ELSE 0 END) AS keep
      |  FROM w)
      |SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(wc) AS BIGINT) AS n_tokens,
      |  CAST(SUM(keep) AS BIGINT) AS gopher_pass,
      |  COUNT(DISTINCT fp) AS n_uniq,
      |  CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dup
      |FROM f GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- t37
  // MATERIALIZED training shards (the true last mile): per (shard,
  // chunk) the actual packed token-ID array at a 512-token budget —
  // not just the t32 span arithmetic. Chain: the trained BPE merges
  // (cached word-freq), each distinct word's subword SEQUENCE
  // broadcast back (wordTokens — the materializing form of the t32
  // lookup), subword→id from the census rank (a bounded MODEL
  // artifact, so its single-partition rank window is over vocab rows,
  // never data), the t08/t32 cumulative span arithmetic, then one
  // (shard, chunk) shuffle assembling position-sorted id arrays. The
  // oracle replays the 40-stage BPE chain + the same id/rank/pack
  // arithmetic and compares the ARRAYS.
  /** The t37 packed-token row stream (shard, chunk, pos, id) — shared
    * by the oracle query (which string-joins the ids for the driver's
    * hash compare) and `Packing.writeShards` (the REAL array<long>
    * parquet artifact a trainer consumes). */
  private[graft] def t37PackedRows(spark: SparkSession,
                                   dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
    val (wf, nVocab) = bpeWordFreq(spark, dir)
    val merges = operators.Bpe.trainMergesFromFreq(wf, bpeMergeCount)
    // the memoized vocabulary count: the gate costs zero jobs
    val gate = nVocab <= operators.Bpe.maxBroadcastVocab
    def side(df: DataFrame) = if (gate) broadcast(df) else df
    val wt = side(operators.Bpe.wordTokens(wf, merges))
    val vid = side(operators.Bpe.tokenCensusFromFreq(wf, merges)
      .withColumn("id", (row_number().over(
        Window.orderBy($"freq".desc, $"token".asc)) - 1).cast("long"))
      .select($"token", $"id"))
    val spans = operators.Packing.chunkSpans(
      operators.Bpe.docTokenCounts(docs, "doc_id", "text", wf, merges,
        knownVocab = Some(nVocab)),
      "doc_id", $"n_btok", budget = 512L, shards = 4)
      .select($"doc_id", $"shard",
        ($"start_chunk" * 512L + $"chunk_offset").as("cum_excl"))
    val toks = docs
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("wi", "word")))
      .filter($"word" =!= "")
      .join(wt, "word")
      .select($"doc_id", $"wi", posexplode($"toks").as(Seq("si", "token")))
      .join(vid, "token")
    val k = row_number().over(
      Window.partitionBy($"doc_id").orderBy($"wi", $"si")).cast("long") - 1L
    toks.withColumn("k", k)
      .join(spans, "doc_id")
      .withColumn("g", $"cum_excl" + $"k")
      .select($"shard", RF.euclidDiv($"g", lit(512L)).as("chunk"),
        pmod($"g", lit(512L)).as("pos"), $"id")
  }

  def t37_bpe_shards(spark: SparkSession, dir: String): DataFrame =
    t37PackedRows(spark, dir)
      .groupBy($"shard", $"chunk")
      .agg(count(lit(1)).as("n_tokens"),
        // ids as a joined string: the driver's hash compare needs
        // hashable cells (raw array columns aren't) — the array form
        // is Packing.writeShards over t37PackedRows
        concat_ws("-",
          transform(array_sort(collect_list(struct($"pos", $"id"))),
            x => x.getField("id").cast("string"))).as("token_ids"))
      .orderBy($"shard", $"chunk")

  private lazy val t37_sql =
    bpeHeadSql + s""",
      |census AS (SELECT token, CAST(SUM(freq) AS BIGINT) AS freq FROM (
      |  SELECT unnest(syms) AS token, freq FROM words_$bpeMergeCount)
      |  GROUP BY token),
      |vid AS (SELECT token,
      |  CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) - 1 AS BIGINT)
      |    AS id
      |  FROM census),
      |wt AS (SELECT word, syms FROM words_$bpeMergeCount),
      |dt AS (
      |  SELECT doc_id, CAST(SUM(len(syms)) AS BIGINT) AS len
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |        FROM documents) dw
      |  JOIN wt USING (word)
      |  WHERE word <> '' GROUP BY doc_id),
      |d AS (
      |  SELECT doc_id, doc_id % 4 AS shard,
      |    CAST(COALESCE(SUM(len)
      |      OVER (PARTITION BY doc_id % 4 ORDER BY doc_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum_excl
      |  FROM dt),
      |dws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |dwp AS (SELECT doc_id, ws,
      |    unnest(generate_series(1, len(ws))) AS i FROM dws),
      |dw2 AS (SELECT doc_id, i AS wi, ws[i] AS word FROM dwp
      |        WHERE ws[i] <> ''),
      |sub AS (SELECT d2.doc_id, d2.wi, wt.syms,
      |    unnest(generate_series(1, len(wt.syms))) AS j
      |  FROM dw2 d2 JOIN wt USING (word)),
      |st AS (SELECT doc_id, wi, j, syms[j] AS token FROM sub),
      |si AS (SELECT st.doc_id, st.wi, st.j, vid.id
      |       FROM st JOIN vid USING (token)),
      |sk AS (SELECT doc_id, id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wi, j) - 1
      |    AS BIGINT) AS k
      |  FROM si),
      |g AS (SELECT d.shard, (d.cum_excl + sk.k) // 512 AS chunk,
      |      (d.cum_excl + sk.k) % 512 AS pos, sk.id
      |      FROM sk JOIN d USING (doc_id))
      |SELECT shard, CAST(chunk AS BIGINT) AS chunk,
      |  COUNT(*) AS n_tokens,
      |  string_agg(CAST(id AS VARCHAR), '-' ORDER BY pos) AS token_ids
      |FROM g GROUP BY shard, chunk ORDER BY shard, chunk""".stripMargin

  // ---------------------------------------------------------------- t33
  // Perplexity-style LM quality filter (CCNet, Wenzek et al. 2020): fit
  // a bigram LM with add-one smoothing on the in-domain reference slice
  // (lang='en' — CCNet's Wikipedia role), score EVERY document by
  // bits-per-token, keep the low-perplexity slice. Surprisal is the
  // integer 1/64-bit chain (floor-log2 via bin() + mantissa
  // interpolation — no libm), the keep gate the cross-multiplied
  // rational bpt ≤ 24/5: at sf0.01 this keeps ~66% of the in-domain
  // docs and ~10% of the rest, the CCNet in-domain separation. The
  // oracle replays the ENTIRE chain: vocab cap, UNK mapping, bigram +
  // prefix counts, integer odds, shift-interpolated surprisal.
  /** Cached t33 model per (session, dir, stamp) — the bpeWordFreq memo
    * pattern: the score plan references the vocab 4× and the bigram
    * table 2×, so an uncached model re-runs the train-corpus shuffles
    * per reference; superseded entries unpersist. */
  private val lmModelMemo = new SessionMemo[operators.NgramLm.BigramLm](
    (spark, dir) => operators.NgramLm.fit(
      t(spark, dir, "documents").filter($"lang" === "en"), "text",
      cacheModel = true),
    _.unpersist())
  private def lmModel(spark: SparkSession,
                      dir: String): operators.NgramLm.BigramLm =
    lmModelMemo(spark, dir, srcStamp(dir, "documents.parquet"))

  def t33_lm_quality(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    operators.NgramLm.score(docs, "doc_id", "text",
      lmModel(spark, dir), 24L, 5L)
      .orderBy($"doc_id")
  }

  // the t33 model+scoring CTE chain, shared verbatim by t36's oracle
  private val lmChainSql =
    """WITH train AS (SELECT text FROM documents WHERE lang = 'en'),
      |uni AS (SELECT tok, COUNT(*) AS cnt FROM
      |  (SELECT unnest(string_split(text, ' ')) AS tok FROM train)
      |  GROUP BY tok),
      |vocab AS (SELECT tok FROM uni ORDER BY cnt DESC, tok LIMIT 65536),
      |vs AS (SELECT CAST(COUNT(*) + 1 AS BIGINT) AS vp FROM vocab),
      |tws AS (SELECT string_split(text, ' ') AS ws FROM train),
      |tp AS (SELECT ws,
      |    unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i
      |  FROM tws),
      |tm AS (SELECT
      |    CASE WHEN v1.tok IS NULL THEN chr(1) ELSE ws[i] END AS m1,
      |    CASE WHEN v2.tok IS NULL THEN chr(1) ELSE ws[i+1] END AS m2
      |  FROM tp LEFT JOIN vocab v1 ON ws[i] = v1.tok
      |          LEFT JOIN vocab v2 ON ws[i+1] = v2.tok),
      |bi AS (SELECT m1, m2, COUNT(*) AS cbi FROM tm GROUP BY m1, m2),
      |pre AS (SELECT m1, CAST(SUM(cbi) AS BIGINT) AS cpre,
      |        CAST(COUNT(*) AS BIGINT) AS n1 FROM bi GROUP BY m1),
      |cont AS (SELECT m2, CAST(COUNT(*) AS BIGINT) AS bplus
      |         FROM bi GROUP BY m2),
      |ct AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM bi),
      |sdocs AS (SELECT doc_id, string_split(text, ' ') AS ws
      |          FROM documents),
      |sp AS (SELECT doc_id, ws,
      |    unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i
      |  FROM sdocs),
      |sm AS (SELECT doc_id,
      |    CASE WHEN v1.tok IS NULL THEN chr(1) ELSE ws[i] END AS m1,
      |    CASE WHEN v2.tok IS NULL THEN chr(1) ELSE ws[i+1] END AS m2
      |  FROM sp LEFT JOIN vocab v1 ON ws[i] = v1.tok
      |          LEFT JOIN vocab v2 ON ws[i+1] = v2.tok),
      |sq AS (SELECT doc_id,
      |    (COALESCE(pre.cpre, 0) + vs.vp) // (COALESCE(bi.cbi, 0) + 1) AS q
      |  FROM sm LEFT JOIN bi ON sm.m1 = bi.m1 AND sm.m2 = bi.m2
      |          LEFT JOIN pre ON sm.m1 = pre.m1
      |          CROSS JOIN vs),
      |su AS (SELECT doc_id,
      |    CAST(64 * (length(bin(q)) - 1)
      |         + ((q << 6) >> (length(bin(q)) - 1)) - 64 AS BIGINT) AS s1
      |  FROM sq),
      |agg AS (SELECT doc_id, COUNT(*) AS n_big,
      |    CAST(SUM(s1) AS BIGINT) AS s64 FROM su GROUP BY doc_id)
      |""".stripMargin

  private val t33_sql = lmChainSql +
    """SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tok,
      |  CAST(COALESCE(a.n_big, 0) AS BIGINT) AS n_big,
      |  COALESCE(a.s64, 0) AS s64,
      |  CASE WHEN a.n_big > 0
      |       THEN CAST(a.s64 AS DOUBLE) / (64 * a.n_big) END AS bpt,
      |  CAST(CASE WHEN a.n_big > 0 AND a.s64 * 5 <= 24 * 64 * a.n_big
      |       THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM sdocs d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- t42
  // HASH-SPACE perplexity filter — the crawl-scale form of t33: token
  // identity is the BOUNDED code tokenCode mod 2^22, an adjacent pair
  // packs injectively into one i64 (m1<<23 | m2), and the whole model
  // folds into executor-side probe maps driven by ONE codegen pass per
  // document (functions.LmScore64 — no pair explode, no model joins,
  // no per-doc shuffle; measured 8.9s → ~2s at the 100× probe). Same
  // integer surprisal chain and keep gate as t33; divergence is the
  // documented deterministic aliasing + the code-order vocab
  // tie-break. The oracle replays the SAME bounded-code chain, so the
  // result hash-matches exactly.
  private val lmHashModelMemo =
    new SessionMemo[operators.NgramLm.HashedBigramLm](
      (spark, dir) => operators.NgramLm.fitHashed(
        t(spark, dir, "documents").filter($"lang" === "en"), "text",
        cacheModel = true),
      _.unpersist())

  def t42_lm_quality_hashed(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    operators.NgramLm.scoreHashed(docs, "doc_id", "text",
      lmHashModelMemo(spark, dir, srcStamp(dir, "documents.parquet")),
      24L, 5L)
      .orderBy($"doc_id")
  }

  private val t42_sql = {
    def clist(src: String) =
      s"list_transform(string_split($src, ' '), " +
        s"w -> CAST(${Text.tokenCodeSql("w")} AS BIGINT) % 4194304)"
    s"""WITH train AS (SELECT text FROM documents WHERE lang = 'en'),
       |tcs AS (SELECT ${clist("text")} AS cs FROM train),
       |uni AS (SELECT ck, COUNT(*) AS cnt FROM
       |  (SELECT unnest(cs) AS ck FROM tcs) GROUP BY ck),
       |vocab AS (SELECT ck FROM uni ORDER BY cnt DESC, ck LIMIT 65536),
       |vs AS (SELECT CAST(COUNT(*) + 1 AS BIGINT) AS vp FROM vocab),
       |tp AS (SELECT cs,
       |    unnest(generate_series(1, greatest(len(cs) - 1, 0))) AS i
       |  FROM tcs),
       |tm AS (SELECT
       |    CASE WHEN v1.ck IS NULL THEN 4194304 ELSE cs[i] END AS m1,
       |    CASE WHEN v2.ck IS NULL THEN 4194304 ELSE cs[i+1] END AS m2
       |  FROM tp LEFT JOIN vocab v1 ON cs[i] = v1.ck
       |          LEFT JOIN vocab v2 ON cs[i+1] = v2.ck),
       |bi AS (SELECT (m1 << 23) + m2 AS k, COUNT(*) AS cbi FROM tm
       |       GROUP BY 1),
       |pre AS (SELECT k >> 23 AS m1, CAST(SUM(cbi) AS BIGINT) AS cpre
       |        FROM bi GROUP BY 1),
       |sdocs AS (SELECT doc_id, string_split(text, ' ') AS ws,
       |          ${clist("text")} AS cs FROM documents),
       |sp AS (SELECT doc_id, cs,
       |    unnest(generate_series(1, greatest(len(cs) - 1, 0))) AS i
       |  FROM sdocs),
       |sm AS (SELECT doc_id,
       |    CASE WHEN v1.ck IS NULL THEN 4194304 ELSE cs[i] END AS m1,
       |    CASE WHEN v2.ck IS NULL THEN 4194304 ELSE cs[i+1] END AS m2
       |  FROM sp LEFT JOIN vocab v1 ON cs[i] = v1.ck
       |          LEFT JOIN vocab v2 ON cs[i+1] = v2.ck),
       |sq AS (SELECT doc_id,
       |    (COALESCE(pre.cpre, 0) + vs.vp) // (COALESCE(bi.cbi, 0) + 1)
       |      AS q
       |  FROM sm LEFT JOIN bi ON (sm.m1 << 23) + sm.m2 = bi.k
       |          LEFT JOIN pre ON sm.m1 = pre.m1
       |          CROSS JOIN vs),
       |su AS (SELECT doc_id,
       |    CAST(64 * (length(bin(q)) - 1)
       |         + ((q << 6) >> (length(bin(q)) - 1)) - 64 AS BIGINT) AS s1
       |  FROM sq),
       |agg AS (SELECT doc_id, COUNT(*) AS n_big,
       |    CAST(SUM(s1) AS BIGINT) AS s64 FROM su GROUP BY doc_id)
       |SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tok,
       |  CAST(COALESCE(a.n_big, 0) AS BIGINT) AS n_big,
       |  COALESCE(a.s64, 0) AS s64,
       |  CASE WHEN a.n_big > 0
       |       THEN CAST(a.s64 AS DOUBLE) / (64 * a.n_big) END AS bpt,
       |  CAST(CASE WHEN a.n_big > 0 AND a.s64 * 5 <= 24 * 64 * a.n_big
       |       THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM sdocs d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t39
  // Kneser-Ney discounted bigram LM (the production smoothing): d = ½
  // with the add-one continuation distribution keeps the model an
  // EXACTLY proper distribution whose probabilities are integer
  // ratios, so the surprisal decomposes term-by-term through the same
  // 1/64-bit chain as t33 (no overflowable full-numerator products).
  // The model derives from the MEMOIZED t33 bigram table — three
  // bounded aggregations, the corpus is not re-read. Same output shape
  // and keep gate (bpt ≤ 24/5) as t33.
  def t39_kn_quality(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val kn = operators.NgramLm.fitKn(lmModel(spark, dir))
    operators.NgramLm.scoreKn(docs, "doc_id", "text", kn, 24L, 5L)
      .orderBy($"doc_id")
  }

  private val t39_sql = {
    def s64(q: String): String =
      s"(64 * (length(bin($q)) - 1) " +
        s"+ ((($q) << 6) >> (length(bin($q)) - 1)) - 64)"
    lmChainSql +
      s""",jkn AS (SELECT sm.doc_id, pre.cpre, pre.n1,
         |    COALESCE(bi.cbi, 0) AS cbi, COALESCE(cont.bplus, 0) AS bplus,
         |    ct.c + vs.vp AS cv
         |  FROM sm LEFT JOIN bi ON sm.m1 = bi.m1 AND sm.m2 = bi.m2
         |          LEFT JOIN pre ON sm.m1 = pre.m1
         |          LEFT JOIN cont ON sm.m2 = cont.m2
         |          CROSS JOIN ct CROSS JOIN vs),
         |skn AS (SELECT doc_id,
         |    CASE WHEN cpre IS NULL
         |      THEN ${s64("cv")} - ${s64("bplus + 1")}
         |      ELSE ${s64("2 * cpre")} + ${s64("cv")}
         |        - ${s64("greatest(2 * cbi - 1, 0) * cv + n1 * (bplus + 1)")}
         |    END AS s1
         |  FROM jkn),
         |aggkn AS (SELECT doc_id, COUNT(*) AS n_big,
         |    CAST(SUM(s1) AS BIGINT) AS s64 FROM skn GROUP BY doc_id)
         |SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tok,
         |  CAST(COALESCE(a.n_big, 0) AS BIGINT) AS n_big,
         |  COALESCE(a.s64, 0) AS s64,
         |  CASE WHEN a.n_big > 0
         |       THEN CAST(a.s64 AS DOUBLE) / (64 * a.n_big) END AS bpt,
         |  CAST(CASE WHEN a.n_big > 0 AND a.s64 * 5 <= 24 * 64 * a.n_big
         |       THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM sdocs d LEFT JOIN aggkn a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t40
  // Interpolated TRIGRAM Kneser-Ney (production CCNet filters run
  // 5-gram KenLM — this extends the integer chain one order): d = ½ at
  // the trigram level interpolating into the full bigram-KN
  // distribution, every probability still a ratio of integers, so the
  // surprisal decomposes through the same 1/64-bit chain
  // (NgramLm.scoreKn3 scaladoc has the derivation + properness proof,
  // NgramLmSpec checks it in exact arithmetic). The model derives from
  // the MEMOIZED t33 bigram model + ONE more corpus pass for the
  // trigram counts. Same keep gate as t33/t39 (bpt ≤ 24/5); the extra
  // context order makes in-domain text MORE predictable (repeated
  // trigrams score low), widening the en-vs-rest separation margin —
  // NgramLmSpec pins margin(KN3) ≥ margin(KN2).
  private val kn3ModelMemo =
    new SessionMemo[operators.NgramLm.KnTrigramLm](
      (spark, dir) => operators.NgramLm.fitKn3(
        t(spark, dir, "documents").filter($"lang" === "en"), "text",
        lmModel(spark, dir), cacheModel = true),
      _.unpersist())

  def t40_kn3_quality(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    operators.NgramLm.scoreKn3(docs, "doc_id", "text",
      kn3ModelMemo(spark, dir, srcStamp(dir, "documents.parquet")),
      24L, 5L)
      .orderBy($"doc_id")
  }

  /** s64(q) — the 1/64-bit integer surprisal in DuckDB (shared by the
    * KN-family oracles). */
  private def duckS64(q: String): String =
    s"(64 * (length(bin($q)) - 1) " +
      s"+ ((($q) << 6) >> (length(bin($q)) - 1)) - 64)"

  /** Train-side trigram CTEs (tri, pre12) over the lmChainSql base —
    * shared by t40 (KN3) and t58 (KN4). */
  private val kn3TrainCtes =
    """,t3p AS (SELECT ws,
      |    unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i
      |  FROM tws),
      |t3m AS (SELECT
      |    CASE WHEN v1.tok IS NULL THEN chr(1) ELSE ws[i] END AS m1,
      |    CASE WHEN v2.tok IS NULL THEN chr(1) ELSE ws[i+1] END AS m2,
      |    CASE WHEN v3.tok IS NULL THEN chr(1) ELSE ws[i+2] END AS m3
      |  FROM t3p LEFT JOIN vocab v1 ON ws[i] = v1.tok
      |           LEFT JOIN vocab v2 ON ws[i+1] = v2.tok
      |           LEFT JOIN vocab v3 ON ws[i+2] = v3.tok),
      |tri AS (SELECT m1, m2, m3, COUNT(*) AS c123 FROM t3m
      |        GROUP BY m1, m2, m3),
      |pre12 AS (SELECT m1, m2, CAST(SUM(c123) AS BIGINT) AS c12,
      |          CAST(COUNT(*) AS BIGINT) AS n12 FROM tri
      |          GROUP BY m1, m2)""".stripMargin

  private val t40_sql = {
    def s64(q: String): String = duckS64(q)
    lmChainSql + kn3TrainCtes +
      s""",s3p AS (SELECT doc_id, ws,
         |    unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i
         |  FROM sdocs),
         |s3m AS (SELECT doc_id,
         |    CASE WHEN v1.tok IS NULL THEN chr(1) ELSE ws[i] END AS m1,
         |    CASE WHEN v2.tok IS NULL THEN chr(1) ELSE ws[i+1] END AS m2,
         |    CASE WHEN v3.tok IS NULL THEN chr(1) ELSE ws[i+2] END AS m3
         |  FROM s3p LEFT JOIN vocab v1 ON ws[i] = v1.tok
         |           LEFT JOIN vocab v2 ON ws[i+1] = v2.tok
         |           LEFT JOIN vocab v3 ON ws[i+2] = v3.tok),
         |j3 AS (SELECT s.doc_id, tri.c123, pre12.c12, pre12.n12,
         |    bi.cbi, pre.cpre, pre.n1, cont.bplus, ct.c + vs.vp AS cv
         |  FROM s3m s
         |    LEFT JOIN tri ON s.m1 = tri.m1 AND s.m2 = tri.m2
         |                 AND s.m3 = tri.m3
         |    LEFT JOIN pre12 ON s.m1 = pre12.m1 AND s.m2 = pre12.m2
         |    LEFT JOIN bi ON s.m2 = bi.m1 AND s.m3 = bi.m2
         |    LEFT JOIN pre ON s.m2 = pre.m1
         |    LEFT JOIN cont ON s.m3 = cont.m2
         |    CROSS JOIN ct CROSS JOIN vs),
         |k3 AS (SELECT doc_id,
         |    CASE WHEN cpre IS NULL THEN cv ELSE 2 * cpre * cv END AS q2,
         |    CASE WHEN cpre IS NULL THEN COALESCE(bplus, 0) + 1
         |         ELSE greatest(2 * COALESCE(cbi, 0) - 1, 0) * cv
         |              + n1 * (COALESCE(bplus, 0) + 1) END AS p2,
         |    c123, c12, n12
         |  FROM j3),
         |sk3 AS (SELECT doc_id,
         |    CASE WHEN c12 IS NULL THEN ${s64("q2")} - ${s64("p2")}
         |         ELSE ${s64("2 * c12")} + ${s64("q2")}
         |           - ${s64(
                "greatest(2 * COALESCE(c123, 0) - 1, 0) * q2 + n12 * p2")}
         |    END AS s1
         |  FROM k3),
         |agg3 AS (SELECT doc_id, COUNT(*) AS n_tri,
         |    CAST(SUM(s1) AS BIGINT) AS s64 FROM sk3 GROUP BY doc_id)
         |SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tok,
         |  CAST(COALESCE(a.n_tri, 0) AS BIGINT) AS n_tri,
         |  COALESCE(a.s64, 0) AS s64,
         |  CASE WHEN a.n_tri > 0
         |       THEN CAST(a.s64 AS DOUBLE) / (64 * a.n_tri) END AS bpt,
         |  CAST(CASE WHEN a.n_tri > 0 AND a.s64 * 5 <= 24 * 64 * a.n_tri
         |       THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM sdocs d LEFT JOIN agg3 a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t58
  // Interpolated 4-GRAM Kneser-Ney (KenLM-order parity is 5; this
  // proves the order-n template — each added order is the SAME integer
  // recursion step): d = ½ at the 4-gram level interpolating into the
  // full trigram-KN distribution, every probability a ratio of
  // integers, surprisal term-by-term through the 1/64-bit chain
  // (NgramLm.scoreKn4 scaladoc; NgramLmSpec proves order-4 properness
  // in exact arithmetic). Derives from the memoized t40 KN3 model +
  // ONE more corpus pass for the 4-gram counts. Same keep gate.
  private val kn4ModelMemo =
    new SessionMemo[operators.NgramLm.KnQuadLm](
      (spark, dir) => operators.NgramLm.fitKn4(
        t(spark, dir, "documents").filter($"lang" === "en"), "text",
        lmModel(spark, dir), cacheModel = true),
      _.unpersist())

  def t58_kn4_quality(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    operators.NgramLm.scoreKn4(docs, "doc_id", "text",
      kn4ModelMemo(spark, dir, srcStamp(dir, "documents.parquet")),
      24L, 5L)
      .orderBy($"doc_id")
  }

  private val t58_sql = {
    def s64(q: String): String = duckS64(q)
    lmChainSql + kn3TrainCtes +
      s""",t4p AS (SELECT ws,
         |    unnest(generate_series(1, greatest(len(ws) - 3, 0))) AS i
         |  FROM tws),
         |t4m AS (SELECT
         |    CASE WHEN v1.tok IS NULL THEN chr(1) ELSE ws[i] END AS m1,
         |    CASE WHEN v2.tok IS NULL THEN chr(1) ELSE ws[i+1] END AS m2,
         |    CASE WHEN v3.tok IS NULL THEN chr(1) ELSE ws[i+2] END AS m3,
         |    CASE WHEN v4.tok IS NULL THEN chr(1) ELSE ws[i+3] END AS m4
         |  FROM t4p LEFT JOIN vocab v1 ON ws[i] = v1.tok
         |           LEFT JOIN vocab v2 ON ws[i+1] = v2.tok
         |           LEFT JOIN vocab v3 ON ws[i+2] = v3.tok
         |           LEFT JOIN vocab v4 ON ws[i+3] = v4.tok),
         |qua AS (SELECT m1, m2, m3, m4, COUNT(*) AS c1234 FROM t4m
         |        GROUP BY m1, m2, m3, m4),
         |pre123 AS (SELECT m1, m2, m3, CAST(SUM(c1234) AS BIGINT) AS c123p,
         |           CAST(COUNT(*) AS BIGINT) AS n123 FROM qua
         |           GROUP BY m1, m2, m3),
         |s4p AS (SELECT doc_id, ws,
         |    unnest(generate_series(1, greatest(len(ws) - 3, 0))) AS i
         |  FROM sdocs),
         |s4m AS (SELECT doc_id,
         |    CASE WHEN v1.tok IS NULL THEN chr(1) ELSE ws[i] END AS m1,
         |    CASE WHEN v2.tok IS NULL THEN chr(1) ELSE ws[i+1] END AS m2,
         |    CASE WHEN v3.tok IS NULL THEN chr(1) ELSE ws[i+2] END AS m3,
         |    CASE WHEN v4.tok IS NULL THEN chr(1) ELSE ws[i+3] END AS m4
         |  FROM s4p LEFT JOIN vocab v1 ON ws[i] = v1.tok
         |           LEFT JOIN vocab v2 ON ws[i+1] = v2.tok
         |           LEFT JOIN vocab v3 ON ws[i+2] = v3.tok
         |           LEFT JOIN vocab v4 ON ws[i+3] = v4.tok),
         |j4 AS (SELECT s.doc_id, qua.c1234, pre123.c123p, pre123.n123,
         |    tri.c123, pre12.c12, pre12.n12,
         |    bi.cbi, pre.cpre, pre.n1, cont.bplus, ct.c + vs.vp AS cv
         |  FROM s4m s
         |    LEFT JOIN qua ON s.m1 = qua.m1 AND s.m2 = qua.m2
         |                 AND s.m3 = qua.m3 AND s.m4 = qua.m4
         |    LEFT JOIN pre123 ON s.m1 = pre123.m1 AND s.m2 = pre123.m2
         |                    AND s.m3 = pre123.m3
         |    LEFT JOIN tri ON s.m2 = tri.m1 AND s.m3 = tri.m2
         |                 AND s.m4 = tri.m3
         |    LEFT JOIN pre12 ON s.m2 = pre12.m1 AND s.m3 = pre12.m2
         |    LEFT JOIN bi ON s.m3 = bi.m1 AND s.m4 = bi.m2
         |    LEFT JOIN pre ON s.m3 = pre.m1
         |    LEFT JOIN cont ON s.m4 = cont.m2
         |    CROSS JOIN ct CROSS JOIN vs),
         |k4 AS (SELECT doc_id,
         |    CASE WHEN cpre IS NULL THEN cv ELSE 2 * cpre * cv END AS q2,
         |    CASE WHEN cpre IS NULL THEN COALESCE(bplus, 0) + 1
         |         ELSE greatest(2 * COALESCE(cbi, 0) - 1, 0) * cv
         |              + n1 * (COALESCE(bplus, 0) + 1) END AS p2,
         |    c123, c12, n12, c1234, c123p, n123
         |  FROM j4),
         |k4b AS (SELECT doc_id,
         |    CASE WHEN c12 IS NULL THEN q2 ELSE 2 * c12 * q2 END AS q3,
         |    CASE WHEN c12 IS NULL THEN p2
         |         ELSE greatest(2 * COALESCE(c123, 0) - 1, 0) * q2
         |              + n12 * p2 END AS p3,
         |    c1234, c123p, n123
         |  FROM k4),
         |sk4 AS (SELECT doc_id,
         |    CASE WHEN c123p IS NULL THEN ${s64("q3")} - ${s64("p3")}
         |         ELSE ${s64("2 * c123p")} + ${s64("q3")}
         |           - ${s64(
              "greatest(2 * COALESCE(c1234, 0) - 1, 0) * q3 + n123 * p3")}
         |    END AS s1
         |  FROM k4b),
         |agg4 AS (SELECT doc_id, COUNT(*) AS n_quad,
         |    CAST(SUM(s1) AS BIGINT) AS s64 FROM sk4 GROUP BY doc_id)
         |SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tok,
         |  CAST(COALESCE(a.n_quad, 0) AS BIGINT) AS n_quad,
         |  COALESCE(a.s64, 0) AS s64,
         |  CASE WHEN a.n_quad > 0
         |       THEN CAST(a.s64 AS DOUBLE) / (64 * a.n_quad) END AS bpt,
         |  CAST(CASE WHEN a.n_quad > 0 AND a.s64 * 5 <= 24 * 64 * a.n_quad
         |       THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM sdocs d LEFT JOIN agg4 a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t67
  // Interpolated 5-GRAM Kneser-Ney — KenLM's DEFAULT order, the
  // production CCNet perplexity model (NgramLm.scoreKn5; NgramLmSpec
  // proves order-5 properness in exact arithmetic and margin(KN5) >=
  // margin(KN4)). Derives from the memoized KN4 model + ONE more
  // corpus pass for the 5-gram counts. Same keep gate; the oracle
  // extends t58's CTE chain one more order.
  private val kn5ModelMemo =
    new SessionMemo[operators.NgramLm.KnPentaLm](
      (spark, dir) => operators.NgramLm.fitKn5(
        t(spark, dir, "documents").filter($"lang" === "en"), "text",
        lmModel(spark, dir), cacheModel = true),
      _.unpersist())

  def t67_kn5_quality(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    operators.NgramLm.scoreKn5(docs, "doc_id", "text",
      kn5ModelMemo(spark, dir, srcStamp(dir, "documents.parquet")),
      24L, 5L)
      .orderBy($"doc_id")
  }

  private val t67_sql = {
    def s64(q: String): String = duckS64(q)
    lmChainSql + kn3TrainCtes +
      s""",t4p AS (SELECT ws,
         |    unnest(generate_series(1, greatest(len(ws) - 3, 0))) AS i
         |  FROM tws),
         |t4m AS (SELECT
         |    CASE WHEN v1.tok IS NULL THEN chr(1) ELSE ws[i] END AS m1,
         |    CASE WHEN v2.tok IS NULL THEN chr(1) ELSE ws[i+1] END AS m2,
         |    CASE WHEN v3.tok IS NULL THEN chr(1) ELSE ws[i+2] END AS m3,
         |    CASE WHEN v4.tok IS NULL THEN chr(1) ELSE ws[i+3] END AS m4
         |  FROM t4p LEFT JOIN vocab v1 ON ws[i] = v1.tok
         |           LEFT JOIN vocab v2 ON ws[i+1] = v2.tok
         |           LEFT JOIN vocab v3 ON ws[i+2] = v3.tok
         |           LEFT JOIN vocab v4 ON ws[i+3] = v4.tok),
         |qua AS (SELECT m1, m2, m3, m4, COUNT(*) AS c1234 FROM t4m
         |        GROUP BY m1, m2, m3, m4),
         |pre123 AS (SELECT m1, m2, m3, CAST(SUM(c1234) AS BIGINT) AS c123p,
         |           CAST(COUNT(*) AS BIGINT) AS n123 FROM qua
         |           GROUP BY m1, m2, m3),
         |t5p AS (SELECT ws,
         |    unnest(generate_series(1, greatest(len(ws) - 4, 0))) AS i
         |  FROM tws),
         |t5m AS (SELECT
         |    CASE WHEN v1.tok IS NULL THEN chr(1) ELSE ws[i] END AS m1,
         |    CASE WHEN v2.tok IS NULL THEN chr(1) ELSE ws[i+1] END AS m2,
         |    CASE WHEN v3.tok IS NULL THEN chr(1) ELSE ws[i+2] END AS m3,
         |    CASE WHEN v4.tok IS NULL THEN chr(1) ELSE ws[i+3] END AS m4,
         |    CASE WHEN v5.tok IS NULL THEN chr(1) ELSE ws[i+4] END AS m5
         |  FROM t5p LEFT JOIN vocab v1 ON ws[i] = v1.tok
         |           LEFT JOIN vocab v2 ON ws[i+1] = v2.tok
         |           LEFT JOIN vocab v3 ON ws[i+2] = v3.tok
         |           LEFT JOIN vocab v4 ON ws[i+3] = v4.tok
         |           LEFT JOIN vocab v5 ON ws[i+4] = v5.tok),
         |qui AS (SELECT m1, m2, m3, m4, m5, COUNT(*) AS c12345 FROM t5m
         |        GROUP BY m1, m2, m3, m4, m5),
         |pre1234 AS (SELECT m1, m2, m3, m4,
         |            CAST(SUM(c12345) AS BIGINT) AS c1234p,
         |            CAST(COUNT(*) AS BIGINT) AS n1234 FROM qui
         |            GROUP BY m1, m2, m3, m4),
         |s5p AS (SELECT doc_id, ws,
         |    unnest(generate_series(1, greatest(len(ws) - 4, 0))) AS i
         |  FROM sdocs),
         |s5m AS (SELECT doc_id,
         |    CASE WHEN v1.tok IS NULL THEN chr(1) ELSE ws[i] END AS m1,
         |    CASE WHEN v2.tok IS NULL THEN chr(1) ELSE ws[i+1] END AS m2,
         |    CASE WHEN v3.tok IS NULL THEN chr(1) ELSE ws[i+2] END AS m3,
         |    CASE WHEN v4.tok IS NULL THEN chr(1) ELSE ws[i+3] END AS m4,
         |    CASE WHEN v5.tok IS NULL THEN chr(1) ELSE ws[i+4] END AS m5
         |  FROM s5p LEFT JOIN vocab v1 ON ws[i] = v1.tok
         |           LEFT JOIN vocab v2 ON ws[i+1] = v2.tok
         |           LEFT JOIN vocab v3 ON ws[i+2] = v3.tok
         |           LEFT JOIN vocab v4 ON ws[i+3] = v4.tok
         |           LEFT JOIN vocab v5 ON ws[i+4] = v5.tok),
         |j5 AS (SELECT s.doc_id, qui.c12345, pre1234.c1234p, pre1234.n1234,
         |    qua.c1234, pre123.c123p, pre123.n123,
         |    tri.c123, pre12.c12, pre12.n12,
         |    bi.cbi, pre.cpre, pre.n1, cont.bplus, ct.c + vs.vp AS cv
         |  FROM s5m s
         |    LEFT JOIN qui ON s.m1 = qui.m1 AND s.m2 = qui.m2
         |                 AND s.m3 = qui.m3 AND s.m4 = qui.m4
         |                 AND s.m5 = qui.m5
         |    LEFT JOIN pre1234 ON s.m1 = pre1234.m1 AND s.m2 = pre1234.m2
         |                     AND s.m3 = pre1234.m3 AND s.m4 = pre1234.m4
         |    LEFT JOIN qua ON s.m2 = qua.m1 AND s.m3 = qua.m2
         |                 AND s.m4 = qua.m3 AND s.m5 = qua.m4
         |    LEFT JOIN pre123 ON s.m2 = pre123.m1 AND s.m3 = pre123.m2
         |                    AND s.m4 = pre123.m3
         |    LEFT JOIN tri ON s.m3 = tri.m1 AND s.m4 = tri.m2
         |                 AND s.m5 = tri.m3
         |    LEFT JOIN pre12 ON s.m3 = pre12.m1 AND s.m4 = pre12.m2
         |    LEFT JOIN bi ON s.m4 = bi.m1 AND s.m5 = bi.m2
         |    LEFT JOIN pre ON s.m4 = pre.m1
         |    LEFT JOIN cont ON s.m5 = cont.m2
         |    CROSS JOIN ct CROSS JOIN vs),
         |k5 AS (SELECT doc_id,
         |    CASE WHEN cpre IS NULL THEN cv ELSE 2 * cpre * cv END AS q2,
         |    CASE WHEN cpre IS NULL THEN COALESCE(bplus, 0) + 1
         |         ELSE greatest(2 * COALESCE(cbi, 0) - 1, 0) * cv
         |              + n1 * (COALESCE(bplus, 0) + 1) END AS p2,
         |    c123, c12, n12, c1234, c123p, n123, c12345, c1234p, n1234
         |  FROM j5),
         |k5b AS (SELECT doc_id,
         |    CASE WHEN c12 IS NULL THEN q2 ELSE 2 * c12 * q2 END AS q3,
         |    CASE WHEN c12 IS NULL THEN p2
         |         ELSE greatest(2 * COALESCE(c123, 0) - 1, 0) * q2
         |              + n12 * p2 END AS p3,
         |    c1234, c123p, n123, c12345, c1234p, n1234
         |  FROM k5),
         |k5c AS (SELECT doc_id,
         |    CASE WHEN c123p IS NULL THEN q3 ELSE 2 * c123p * q3 END AS q4,
         |    CASE WHEN c123p IS NULL THEN p3
         |         ELSE greatest(2 * COALESCE(c1234, 0) - 1, 0) * q3
         |              + n123 * p3 END AS p4,
         |    c12345, c1234p, n1234
         |  FROM k5b),
         |sk5 AS (SELECT doc_id,
         |    CASE WHEN c1234p IS NULL THEN ${s64("q4")} - ${s64("p4")}
         |         ELSE ${s64("2 * c1234p")} + ${s64("q4")}
         |           - ${s64(
              "greatest(2 * COALESCE(c12345, 0) - 1, 0) * q4 + n1234 * p4")}
         |    END AS s1
         |  FROM k5c),
         |agg5 AS (SELECT doc_id, COUNT(*) AS n_quint,
         |    CAST(SUM(s1) AS BIGINT) AS s64 FROM sk5 GROUP BY doc_id)
         |SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tok,
         |  CAST(COALESCE(a.n_quint, 0) AS BIGINT) AS n_quint,
         |  COALESCE(a.s64, 0) AS s64,
         |  CASE WHEN a.n_quint > 0
         |       THEN CAST(a.s64 AS DOUBLE) / (64 * a.n_quint) END AS bpt,
         |  CAST(CASE WHEN a.n_quint > 0 AND a.s64 * 5 <= 24 * 64 * a.n_quint
         |       THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM sdocs d LEFT JOIN agg5 a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- t36
  // Perplexity-bucketed mixing (CCNet's head/middle/tail): bucket every
  // document by bits-per-token under the t33 model at the corpus
  // terciles (integer cross-multiplied gates — bpt ≤ 4.8 head, ≤ 4.9
  // middle, else tail), then the standard deterministic id-hash
  // downsampling per bucket (head 1.0 / middle 0.5 / tail 0.1 — CCNet
  // keeps the head and thins the tail). Composition of the memoized
  // t33 model with Sampling.sampleByRates: one narrow map over the
  // scored corpus, census folds map-side. The oracle chains the FULL
  // t33 replay, the bucket CASE, and the t06 hash gate.
  def t36_ppl_mix(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val scored = operators.NgramLm.score(docs, "doc_id", "text",
      lmModel(spark, dir), 24L, 5L)
    val bucket =
      when($"n_big" > 0L && $"s64" * 5L <= lit(24L) * lit(64L) * $"n_big",
        "head")
      .when($"n_big" > 0L && $"s64" * 10L <= lit(49L) * lit(64L) * $"n_big",
        "middle")
      .otherwise("tail")
    operators.Sampling.sampleByRates(
      scored.select($"doc_id", bucket.as("bucket")),
      "doc_id", "bucket",
      Map("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.1), default = 0.1)
      .groupBy($"bucket")
      .agg(count(lit(1)).as("kept"), min($"doc_id").as("first_kept"),
        max($"doc_id").as("last_kept"))
      .orderBy($"bucket")
  }

  private val t36_sql = lmChainSql +
    """,b AS (
      |  SELECT d.doc_id,
      |    CASE WHEN a.n_big > 0 AND a.s64 * 5 <= 24 * 64 * a.n_big
      |           THEN 'head'
      |         WHEN a.n_big > 0 AND a.s64 * 10 <= 49 * 64 * a.n_big
      |           THEN 'middle'
      |         ELSE 'tail' END AS bucket
      |  FROM sdocs d LEFT JOIN agg a USING (doc_id)),
      |s AS (
      |  SELECT doc_id, bucket FROM b
      |  WHERE (((doc_id % 2147483648) * 2654435761) % 4294967296
      |     + ((doc_id // 2147483648) * 2246822519) % 4294967296)
      |    % 4294967296 / 4294967296.0
      |    < CASE bucket WHEN 'head' THEN 1.0 WHEN 'middle' THEN 0.5
      |      ELSE 0.1 END)
      |SELECT bucket, COUNT(*) AS kept, MIN(doc_id) AS first_kept,
      |  MAX(doc_id) AS last_kept
      |FROM s GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- t35
  // STREAMING perplexity filter (the t33 production twin, the t27
  // pattern): the document feed scored per micro-batch against the
  // PERSISTED bigram LM (NgramLm.saveModel — fit once on the reference
  // slice, loaded inside the cloned streaming session). Stateless per
  // batch, disk-as-state, checkpointed replay appends nothing. Because
  // the stored model is fit from the same corpus slice, the streamed
  // result must equal batch t33 exactly — the oracle IS t33's SQL.
  /** Parameter-stamped stage base for the t35 streaming LM: model /
    * out / checkpoint live under a dir keyed by (maxVocab, keep gate,
    * SOURCE STAMP), so changed model params or regenerated testdata
    * self-invalidate — a fresh stage dir simply gets built, the stale
    * sibling is never read again (closes the old manual `rm -rf
    * /tmp/graft_stream/.../lm_quality` note). */
  private[graft] def lmStreamBase(dir: String, maxVocab: Int,
                                  keepNum: Long, keepDen: Long): String = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    s"/tmp/graft_stream/$key/lm_quality_v${maxVocab}" +
      s"_k$keepNum-${keepDen}_s${srcStamp(dir, "documents.parquet")}"
  }

  def t35_stream_lm_quality(spark: SparkSession, dir: String): DataFrame = {
    val batch = t(spark, dir, "documents")
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val stage = s"/tmp/graft_stream/$key/documents"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      sources.Store.setSplayed(batch, stage)
    val base = lmStreamBase(dir, 1 << 16, 24L, 5L)
    val modelPath = s"$base/model"
    if (!new java.io.File(s"$modelPath/meta/_SUCCESS").exists())
      operators.NgramLm.saveModel(lmModel(spark, dir), modelPath)
    streaming.Streams.lmQualityStream(spark, stage, batch,
      "doc_id", "text", modelPath, 24L, 5L,
      outDir = s"$base/out", checkpoint = s"$base/ckpt")
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- t34
  // DSIR importance selection (Xie et al. 2023): hashed-bigram bag
  // models on the target (lang='en', the t33 reference slice) and the
  // raw corpus; each doc's log importance weight is the integer
  // 1/64-bit surprisal sum Σ[s64(ct+1) − s64(cr+1)] + n_gram·K64, and
  // the selected slice is the deterministic top-100 by (lw64 DESC,
  // doc_id) — the paper's Gumbel resampling dropped for the replayable
  // top-k variant. Gram hashes are the t09/t14 i64 convention; the
  // bucket tables are bounded by construction and broadcast under the
  // gate; top-k folds to TakeOrderedAndProject (no global sort).
  /** Cached t34 model per (session, dir, stamp) — the lmModel memo. */
  private val dsirModelMemo = new SessionMemo[operators.Dsir.Model](
    (spark, dir) => {
      val docs = t(spark, dir, "documents")
      operators.Dsir.fit(docs.filter($"lang" === "en"), docs,
        "text", n = 2, buckets = 1 << 16, cacheModel = true)
    },
    _.unpersist())
  private def dsirModel(spark: SparkSession,
                        dir: String): operators.Dsir.Model =
    dsirModelMemo(spark, dir, srcStamp(dir, "documents.parquet"))

  def t34_dsir_select(spark: SparkSession, dir: String): DataFrame =
    operators.Dsir.selectTopK(t(spark, dir, "documents"),
      "doc_id", "text", dsirModel(spark, dir), 100)

  // ---------------------------------------------------------------- t41
  // STREAMING DSIR (the t34 production twin, the t35 pattern): the
  // document feed scored per micro-batch against the PERSISTED
  // importance model (Dsir.saveModel — fit once, weigh the live feed);
  // the stream emits EVERY doc's integer weight (global top-k stays a
  // batch op over the accumulated scores). Stateless per batch,
  // disk-as-state, parameter-stamped stage (the t35 stamping), replay
  // appends nothing. The oracle is t34's chain without the top-k —
  // stream must equal batch.
  private[graft] def dsirStreamBase(dir: String, n: Int,
                                    buckets: Int): String = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    s"/tmp/graft_stream/$key/dsir_n${n}_b${buckets}" +
      s"_s${srcStamp(dir, "documents.parquet")}"
  }

  def t41_stream_dsir(spark: SparkSession, dir: String): DataFrame = {
    val batch = t(spark, dir, "documents")
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val stage = s"/tmp/graft_stream/$key/documents"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      sources.Store.setSplayed(batch, stage)
    val base = dsirStreamBase(dir, 2, 1 << 16)
    val modelPath = s"$base/model"
    if (!new java.io.File(s"$modelPath/meta/_SUCCESS").exists())
      operators.Dsir.saveModel(dsirModel(spark, dir), modelPath)
    streaming.Streams.dsirStream(spark, stage, batch, "doc_id", "text",
      modelPath, outDir = s"$base/out", checkpoint = s"$base/ckpt")
      .orderBy($"doc_id")
  }

  private val t34_sql = {
    def s64(q: String): String =
      s"(64 * (length(bin($q)) - 1) " +
        s"+ ((($q) << 6) >> (length(bin($q)) - 1)) - 64)"
    val b = 1 << 16
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS w
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, lang, w,
       |         unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
       |  FROM toks),
       |grams AS (
       |  SELECT doc_id, lang,
       |         ((${Text.duck.ngramHashSql("w", "i", 2)} % $b) + $b) % $b
       |           AS bk
       |  FROM pos),
       |tc AS (SELECT bk, COUNT(*) AS ct FROM grams
       |       WHERE lang = 'en' GROUP BY bk),
       |rc AS (SELECT bk, COUNT(*) AS cr FROM grams GROUP BY bk),
       |nt AS (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS n FROM tc),
       |nr AS (SELECT CAST(COALESCE(SUM(cr), 0) AS BIGINT) AS n FROM rc),
       |k64 AS (SELECT ${s64(s"nr.n + $b")} - ${s64(s"nt.n + $b")} AS k
       |        FROM nt, nr),
       |term AS (
       |  SELECT g.doc_id,
       |    ${s64("COALESCE(tc.ct, 0) + 1")}
       |      - ${s64("COALESCE(rc.cr, 0) + 1")} AS t64
       |  FROM grams g LEFT JOIN tc USING (bk) LEFT JOIN rc USING (bk)),
       |agg AS (SELECT doc_id, COUNT(*) AS n_gram,
       |               CAST(SUM(t64) AS BIGINT) AS s
       |        FROM term GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(a.n_gram, 0) AS BIGINT) AS n_gram,
       |  CAST(COALESCE(a.s, 0) + COALESCE(a.n_gram, 0) * k64.k AS BIGINT)
       |    AS lw64
       |FROM toks d LEFT JOIN agg a USING (doc_id) CROSS JOIN k64
       |ORDER BY lw64 DESC, d.doc_id LIMIT 100""".stripMargin
  }

  // t41's oracle IS t34's chain without the top-k (stream == batch)
  private lazy val t41_sql = {
    val cut = t34_sql.lastIndexOf("ORDER BY lw64")
    t34_sql.take(cut) + "ORDER BY d.doc_id"
  }

  // ---------------------------------------------------------------- t30
  // Deterministic global shuffle + sharding (the trainer's "last mile"):
  // shard = floor(u·8) on the id-hash decision (hash-balanced, no global
  // sort), pos = rank by (u, id) WITHIN the shard — the rank window is
  // shard-partitioned, so the one exchange is 8-way parallel, never a
  // single-partition global row_number. u is an exact 32-bit-significand
  // double → floor/products replay bit-identically in DuckDB.
  def t30_shard_shuffle(spark: SparkSession, dir: String): DataFrame =
    operators.Sampling.shardShuffle(t(spark, dir, "documents"), "doc_id", 8)
      .select($"shard", $"pos", $"doc_id")
      .orderBy($"shard", $"pos")

  private val t30_sql =
    """WITH s AS (SELECT doc_id,
      |    (((doc_id % 2147483648) * 2654435761) % 4294967296
      |     + ((doc_id // 2147483648) * 2246822519) % 4294967296)
      |    % 4294967296 / 4294967296.0 AS u FROM documents),
      |b AS (SELECT doc_id, u, CAST(floor(u * 8) AS INT) AS shard FROM s)
      |SELECT shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY u, doc_id) - 1
      |    AS BIGINT) AS pos,
      |  doc_id
      |FROM b ORDER BY shard, pos""".stripMargin

  // ---------------------------------------------------------------- t31
  // Cluster-balanced downsampling (topic balance): nearest-centroid cell
  // per embedding (the s03 cached Lloyd fit + shuffle-free codegen
  // assignment), every cell capped at the SMALLEST cell's population,
  // kept rows chosen by the deterministic id-hash order. The oracle
  // replays the whole chain: the s03 centroid CTEs, the argmax-cosine
  // assignment, the min-cell cap, and the same hash-rank keep.
  def t31_cluster_balance(spark: SparkSession, dir: String): DataFrame =
    operators.Sampling.clusterBalance(t(spark, dir, "embeddings"),
      "vec_id", "embedding", embCentroids(spark, dir))
      .select($"cell", $"rk", $"id".as("vec_id"))
      .orderBy($"cell", $"rk")

  private lazy val t31_sql =
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |    FROM embeddings),
       |  topv AS (SELECT id, v FROM v ORDER BY id LIMIT 128),
       |  num AS (SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM topv),
       |  cent0 AS (SELECT CAST(rn // 16 AS INT) AS cell, v AS cv
       |    FROM num WHERE rn % 16 = 1),
       |${lloydIterSql("cent0", 1)},
       |${lloydIterSql("cent1", 2)},
       |${lloydIterSql("cent2", 3)},
       |  a AS (SELECT id, cell FROM (
       |    SELECT v.id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.id
       |        ORDER BY ${duckCos("v.v", "c.cv")} DESC, c.cell) AS rk
       |    FROM v CROSS JOIN cent3 c) WHERE rk = 1),
       |  cap AS (SELECT MIN(cnt) AS m FROM
       |    (SELECT COUNT(*) AS cnt FROM a GROUP BY cell)),
       |  r AS (SELECT cell, id,
       |      ROW_NUMBER() OVER (PARTITION BY cell ORDER BY
       |        (((id % 2147483648) * 2654435761) % 4294967296
       |         + ((id // 2147483648) * 2246822519) % 4294967296)
       |        % 4294967296 / 4294967296.0, id) AS rk
       |    FROM a)
       |SELECT r.cell, CAST(r.rk AS INT) AS rk, r.id AS vec_id
       |FROM r, cap WHERE r.rk <= cap.m
       |ORDER BY r.cell, r.rk""".stripMargin

  // ---------------------------------------------------------------- t17
  // Per-source document caps (crawl-corpus domain caps): keep the top-10
  // docs per source by length with doc_id tie-break. The rank filter
  // triggers WindowGroupLimit — each task forwards only its local top-10
  // per source before the single source-partitioned shuffle.
  def t17_source_caps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"source")
      .orderBy($"n_chars".desc, $"doc_id".asc)
    t(spark, dir, "documents")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 10)
      .select($"source", $"rk", $"doc_id", $"n_chars")
      .orderBy($"source", $"rk")
  }

  private val t17_sql =
    """WITH r AS (
      |  SELECT source, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents)
      |SELECT source, rk, doc_id, n_chars FROM r
      |WHERE rk <= 10 ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------------- t18
  // Per-language quality deciles (percentile-threshold filtering): NTILE
  // over the exact t02 quality score with doc_id tie-break (total order
  // → deterministic tile edges), decile census per language. One
  // lang-partitioned window shuffle; the census folds map-side.
  def t18_quality_deciles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.QualityExpr
    val w = Window.partitionBy($"lang")
      .orderBy($"quality".asc, $"doc_id".asc)
    t(spark, dir, "documents")
      .select($"lang", $"doc_id",
        QualityExpr.qualityScore($"text").as("quality"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy($"lang", $"decile")
      .agg(count(lit(1)).as("n"),
        min($"quality").as("q_min"), max($"quality").as("q_max"),
        min($"doc_id").as("first_id"))
      .orderBy($"lang", $"decile")
  }

  private val t18_sql = {
    val punct =
      """CASE WHEN length(text) = 0 THEN 0.0 ELSE
        |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        |      / length(text) END""".stripMargin
    val stop =
      s"""CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0 ELSE
         |    CAST(len(list_filter(string_split(text, ' '),
         |      w -> w IN ($t02_stop))) AS DOUBLE)
         |      / len(string_split(text, ' ')) END""".stripMargin
    val quality =
      s"""floor((0.4 * least(1.0, CAST(len(string_split(text,' ')) AS DOUBLE)/100)
         |    + 0.3 * (1.0 - $punct)
         |    + 0.3 * (1.0 - $stop)) * 10000 + 0.5) / 10000""".stripMargin
    s"""WITH q AS (
       |  SELECT lang, doc_id, $quality AS quality FROM documents),
       |d AS (
       |  SELECT lang, doc_id, quality,
       |    NTILE(10) OVER (PARTITION BY lang
       |      ORDER BY quality, doc_id) AS decile
       |  FROM q)
       |SELECT lang, decile, COUNT(*) AS n,
       |  MIN(quality) AS q_min, MAX(quality) AS q_max,
       |  MIN(doc_id) AS first_id
       |FROM d GROUP BY lang, decile ORDER BY lang, decile""".stripMargin
  }

  // ---------------------------------------------------------------- t19
  // FUZZY benchmark decontamination: MinHash-LSH candidates between the
  // corpus and a (broadcast) benchmark set, verified by exact gram-set
  // containment — catches partial/paraphrased eval leakage t09's
  // verbatim-width probe can't. The benchmark here is the leaked-eval
  // scenario: each bench item is the first ¾ of every 83rd doc's tokens
  // (an eval suite quoting corpus passages); the operator must find the
  // source docs. 8 shingle-minhashes in 4 bands of 2 (LSH recall at the
  // snippet's J≈0.75 is ~96% — and deterministic: fixed seeds, so both
  // engines flag the identical set); the verify gate is the integer
  // compare 2·|common| ≥ |bench|.
  def t19_fuzzy_decontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val bench = docs.filter($"doc_id" % 83 === 0)
      .select($"doc_id", concat_ws(" ", slice(split($"text", " "), lit(1),
        greatest(lit(3), expr("(size(split(text, ' ')) * 3) div 4"))))
        .as("text"))
    operators.Decontam.fuzzyReport(
      docs, "doc_id", "text", bench, "doc_id", "text",
      n = 3, numHashes = 8, bands = 4)
      .orderBy($"doc_id", $"bench_id")
  }

  private val t19_sql = {
    val p = Text.minhashPrime
    val gramsExpr = "list_transform(generate_series(1, greatest(len(w) - 2, 0)), " +
      s"i -> ${Text.duck.ngramHashSql("w", "i", 3)})"
    val sigs = Text.minhashSeeds(8).zipWithIndex.map { case ((a, b), i) =>
      s"coalesce(list_min(list_transform(g, h -> ($a * (h % $p) + $b) % $p)), $p) AS s$i"
    }.mkString(",\n  ")
    val bandCond = (0 until 4).map { k =>
      s"(c.s${2 * k} = b.s${2 * k} AND c.s${2 * k + 1} = b.s${2 * k + 1})"
    }.mkString(" OR ")
    def sigCte(src: String, name: String) =
      s"""${name}_toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
         |${name}_gr AS (SELECT doc_id, $gramsExpr AS g FROM ${name}_toks),
         |$name AS (SELECT doc_id,
         |  $sigs
         |  FROM ${name}_gr)""".stripMargin
    s"""WITH bench AS (
       |  SELECT doc_id, array_to_string(list_slice(w, 1,
       |    greatest(3, (len(w) * 3) // 4)), ' ') AS text
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w
       |        FROM documents WHERE doc_id % 83 = 0)),
       |${sigCte("documents", "c")},
       |${sigCte("bench", "b")},
       |cand AS (SELECT DISTINCT c.doc_id AS doc_id, b.doc_id AS bench_id
       |  FROM c JOIN b ON $bandCond),
       |cdg AS (SELECT doc_id, list_distinct(g) AS dg FROM c_gr),
       |bdg AS (SELECT doc_id, list_distinct(g) AS dg FROM b_gr)
       |SELECT cand.doc_id, cand.bench_id,
       |  CAST(len(list_intersect(x.dg, y.dg)) AS INTEGER) AS n_common,
       |  CAST(len(y.dg) AS INTEGER) AS n_bench
       |FROM cand JOIN cdg x ON x.doc_id = cand.doc_id
       |  JOIN bdg y ON y.doc_id = cand.bench_id
       |WHERE len(list_intersect(x.dg, y.dg)) > 0
       |  AND len(list_intersect(x.dg, y.dg)) * 2 >= len(y.dg)
       |ORDER BY cand.doc_id, cand.bench_id""".stripMargin
  }

  // ---------------------------------------------------------------- q56
  // Stream-STREAM interval join: clicks joined to same-user purchases
  // within 6 hours, both sides live feeds off the staged journal — the
  // state-store-backed funnel join. The oracle is the equivalent batch
  // self-join; the streamed pair set must equal it exactly.
  def q56_stream_interval_join(spark: SparkSession, dir: String): DataFrame = {
    val batch = t(spark, dir, "events")
    val stage = s"/tmp/graft_stream/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/events"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      graft.sources.Store.setSplayed(batch, stage)
    graft.streaming.Streams.intervalJoin(spark, stage, batch,
      prepLeft = df => df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"),
          expr("timestamp_micros(ts div 1000)").as("c_ts"),
          col("event_id").as("c_id")),
      prepRight = df => df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          expr("timestamp_micros(ts div 1000)").as("p_ts"),
          col("event_id").as("p_id")),
      joinExpr = "c_user = p_user AND p_ts >= c_ts AND " +
        "p_ts <= c_ts + INTERVAL 6 HOURS",
      queryName = "graft_sjoin_" + math.abs(dir.hashCode))
      .select($"c_id", $"p_id", $"c_user".as("user_id"))
      .orderBy($"c_id", $"p_id")
  }

  private val q56_sql =
    """SELECT a.event_id AS c_id, b.event_id AS p_id, a.user_id
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND a.event_type = 'click' AND b.event_type = 'purchase'
      |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
      |ORDER BY c_id, p_id""".stripMargin

  // ---------------------------------------------------------------- q57
  // Time-range scan over events: the predicate lands on the ns-long ts
  // (i.e. on MicrosAsNanos of the physical µs column) and the
  // NanosFilterInference rule adds the exact µs-domain conjunct, so the
  // parquet scan row-group-prunes on min/max — the plan property
  // PlanShapeSpec pins. Jan 10-20 of the generated Jan-2024 window.
  private val q57LoNs = 1704844800L * 1000000000L // 2024-01-10T00:00Z
  private val q57HiNs = 1705708800L * 1000000000L // 2024-01-20T00:00Z
  def q57_events_range(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter($"ts" >= q57LoNs && $"ts" < q57HiNs)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"event_type")

  private val q57_sql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE epoch_us(ts) >= 1704844800000000 AND epoch_us(ts) < 1705708800000000
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q58
  // CUBE over (returnflag, linestatus): all four grouping-set levels in
  // one pass — Spark's Expand feeds a single hash aggregate, so the
  // rollup/cube family costs one shuffle regardless of level count (the
  // multi-select UNION a user would hand-write costs one per level).
  // GROUPING() flags disambiguate real NULLs from subtotal rows; within
  // a (g_rf, g_ls) level the nulled columns are constant, so the ORDER
  // BY is total without a null-placement convention.
  def q58_cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(grouping($"l_returnflag").cast("int").as("g_rf"),
        grouping($"l_linestatus").cast("int").as("g_ls"),
        dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select($"g_rf", $"g_ls", $"l_returnflag", $"l_linestatus",
        $"sum_qty", $"n")
      .orderBy($"g_rf", $"g_ls", $"l_returnflag", $"l_linestatus")

  private val q58_sql =
    """SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q59
  // Rolling-window aggregates — the kdb m-family (msum/mavg/mmax) plus
  // lag, per user over the event stream: a 5-row trailing frame ordered
  // by (ts, event_id) (ts alone is not a total order — the tie-break
  // rule every window query here follows). Sums route through
  // DECIMAL(18,2): exact, so Spark's frame accumulation and DuckDB's
  // segment-tree sliding sum agree bit-for-bit; mavg divides the exact
  // decimal sum AFTER the double cast (two correctly-rounded IEEE ops —
  // no round() needed); mmax/lag move values untouched. One shuffle
  // (the partitionBy), every frame computed within its partition.
  def q59_moving(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-4, 0)
    val wo = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val decSum = sum($"value".cast("decimal(18,2)")).over(w).cast("double")
    t(spark, dir, "events").select($"user_id", $"event_id",
        decSum.as("msum"),
        (decSum / count(lit(1)).over(w)).as("mavg"),
        max($"value").over(w).as("mmax"),
        lag($"value", 1).over(wo).as("lag1"))
      .orderBy($"user_id", $"event_id")
  }

  private val q59_sql =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS msum,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    / COUNT(*) OVER w AS mavg,
      |  MAX(value) OVER w AS mmax,
      |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag1
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q60
  // RANGE-frame windowing: trailing ONE HOUR of events per user (the
  // kdb time-windowed running aggregate — frames defined by event-TIME
  // distance, not row count; rows at the same instant are peers and
  // share a frame in both engines). The ordering key is the µs long
  // (`ts div 1000` ↔ epoch_us — the events oracle convention), the
  // frame is a numeric range on it, and the sum rides DECIMAL(18,2) so
  // frame accumulation strategies can't skew the doubles.
  def q60_range_frame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-3600L * 1000000L, 0)
    t(spark, dir, "events")
      .withColumn("us", expr("ts div 1000"))
      .select($"user_id", $"event_id", $"us",
        count(lit(1)).over(w).as("n_1h"),
        sum($"value".cast("decimal(18,2)")).over(w).cast("double")
          .as("sum_1h"))
      .orderBy($"user_id", $"us", $"event_id")
  }

  private val q60_sql =
    """SELECT user_id, event_id, epoch_us(ts) AS us,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, us, event_id""".stripMargin

  // ---------------------------------------------------------------- q62
  // PIVOT: event_type rows → columns, per user (the wide-format export
  // every BI handoff asks for). The pivot value list is EXPLICIT —
  // letting the engine discover it adds a distinct scan AND makes the
  // output schema data-dependent, which breaks both determinism and a
  // 100 TB plan (Spark's auto-pivot collects the distinct values to
  // the driver). One Expand-free pass: pivot compiles to conditional
  // aggregates, exactly the CASE WHEN sums the oracle writes out.
  private val q62Types = Seq("click", "error", "purchase", "signup", "view")
  def q62_pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy($"user_id")
      .pivot("event_type", q62Types)
      .agg(dsum($"value"))
      .na.fill(0.0, q62Types)
      .orderBy($"user_id")

  private val q62_sql =
    """SELECT user_id,
      |  COALESCE(CAST(SUM(CASE WHEN event_type = 'click'
      |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS click,
      |  COALESCE(CAST(SUM(CASE WHEN event_type = 'error'
      |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS error,
      |  COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
      |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS purchase,
      |  COALESCE(CAST(SUM(CASE WHEN event_type = 'signup'
      |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS signup,
      |  COALESCE(CAST(SUM(CASE WHEN event_type = 'view'
      |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q63
  // UNPIVOT (melt): the q62 wide table back to long form — the other
  // half of the reshape pair (feature tables melt to (id, key, value)
  // for storage/streaming). A pure narrow Expand: 5 output rows per
  // input row, no shuffle beyond q62's aggregate.
  def q63_unpivot(spark: SparkSession, dir: String): DataFrame =
    q62_pivot(spark, dir)
      .unpivot(Array($"user_id"), q62Types.map(col).toArray,
        "event_type", "total")
      .orderBy($"user_id", $"event_type")

  private val q63_sql = {
    val body = q62_sql.replace("ORDER BY user_id", "")
    val arms = q62Types.map(t =>
      s"SELECT user_id, '$t' AS event_type, $t AS total FROM p")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH p AS ($body)
       |SELECT user_id, event_type, total FROM (
       |  $arms)
       |ORDER BY user_id, event_type""".stripMargin
  }

  // ---------------------------------------------------------------- q61
  // Arbitrary GROUPING SETS (the rollup/cube generalization): exactly
  // the ((returnflag), (linestatus), ()) levels — a set list neither
  // rollup nor cube produces — in ONE Expand+aggregate pass. SQL text
  // on both sides (Spark's DataFrame API exposes only rollup/cube;
  // GROUPING SETS is its SQL surface).
  def q61_grouping_sets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("q61_lineitem")
    spark.sql(
      """SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM q61_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)
  }

  private val q61_sql =
    """SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- t20
  // Overlapping token windows (RAG/context prep): 64-token windows at
  // stride 48 (16-token overlap), last window clipped, every token
  // covered. Pure per-row arithmetic + explode — no shuffle.
  def t20_chunk_overlap(spark: SparkSession, dir: String): DataFrame =
    operators.Packing.chunkOverlap(t(spark, dir, "documents"),
      "doc_id", size(Text.tokens($"text")), size = 64, stride = 48)
      .orderBy($"doc_id", $"chunk_idx")

  private val t20_sql =
    """WITH d AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, len,
      |    1 + (greatest(len - 64, 0) + 47) // 48 AS n_chunks
      |  FROM d WHERE len > 0),
      |e AS (
      |  SELECT doc_id, len,
      |    unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      |  FROM c)
      |SELECT doc_id, chunk_idx,
      |  chunk_idx * 48 + 1 AS start_tok,
      |  least(chunk_idx * 48 + 64, len) AS end_tok,
      |  least(chunk_idx * 48 + 64, len) - (chunk_idx * 48 + 1) + 1 AS n_toks
      |FROM e ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- t21
  // Gopher-style hard quality rules (Rae et al. 2021 §A1.1): per-rule
  // 0/1 flags + keep, all INTEGER gates (rationals cross-multiplied) so
  // the decision is bit-identical cross-engine. Word-count bounds are
  // scaled to this corpus (docs run 10-99 words; Gopher's 50-100k bound
  // would pass everything) — the RULE SHAPE is what's under test.
  def t21_gopher_rules(spark: SparkSession, dir: String): DataFrame =
    operators.QualityRules.gopher(t(spark, dir, "documents"),
      "doc_id", "text", minWords = 35, maxWords = 70)
      .orderBy($"doc_id")

  private val t21_sql =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS sl
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS wc,
      |    CAST(CASE WHEN len(ws) BETWEEN 35 AND 70
      |      THEN 1 ELSE 0 END AS BIGINT) AS r_wc,
      |    CAST(CASE WHEN sl >= 3 * len(ws) AND sl <= 10 * len(ws)
      |      THEN 1 ELSE 0 END AS BIGINT) AS r_mwl,
      |    CAST(CASE WHEN
      |      (CASE WHEN list_contains(ws, 'the') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'a') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'of') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'to') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'and') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'in') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'that') THEN 1 ELSE 0 END) +
      |      (CASE WHEN list_contains(ws, 'is') THEN 1 ELSE 0 END) >= 2
      |      THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
      |    CAST(CASE WHEN 2 * len(list_distinct(ws)) >= len(ws)
      |      THEN 1 ELSE 0 END AS BIGINT) AS r_uniq
      |  FROM w)
      |SELECT doc_id, wc, r_wc, r_mwl, r_stop, r_uniq,
      |  r_wc * r_mwl * r_stop * r_uniq AS keep
      |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t22
  // Cross-source contamination census: the d10 simhash near-dup pairs
  // annotated with each side's source, folded to an unordered
  // source-pair matrix — "which sources copy from each other", the
  // audit a multi-source 100 TB crawl mix runs before weighting
  // sources. The doc→source joins broadcast (the pair list is small
  // relative to the corpus by construction).
  def t22_source_overlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.simhashNearDup64(docs, "doc_id", "text", maxHamming = 3)
    val src = docs.select($"doc_id", $"source")
    pairs
      .join(src.select($"doc_id".as("id_a"), $"source".as("__sa")), "id_a")
      .join(src.select($"doc_id".as("id_b"), $"source".as("__sb")), "id_b")
      .select(least($"__sa", $"__sb").as("src_a"),
        greatest($"__sa", $"__sb").as("src_b"))
      .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy($"src_a", $"src_b")
  }

  private val t22_sql = {
    def chunk(c: String, k: Int) = s"($c // ${1L << (16 * k)}) % 65536"
    val joins = (0 until 4).map { k =>
      val earlier = (0 until k)
        .map(pk => s"${chunk("a.sh", pk)} <> ${chunk("b.sh", pk)}")
        .map(c => s"\n    AND $c").mkString
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b
         |    ON ${chunk("a.sh", k)} = ${chunk("b.sh", k)}
         |    AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3$earlier""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH sh AS (SELECT doc_id, ${Text.duck.simhash64Sql("text")} AS sh
       |  FROM documents),
       |p AS (
       |  $joins),
       |ann AS (
       |  SELECT least(da.source, db.source) AS src_a,
       |    greatest(da.source, db.source) AS src_b
       |  FROM p JOIN documents da ON p.id_a = da.doc_id
       |         JOIN documents db ON p.id_b = db.doc_id)
       |SELECT src_a, src_b, COUNT(*) AS n_pairs
       |FROM ann GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin
  }

  // ---------------------------------------------------------------- t23
  // Temperature-flattened source mix (α = 1/2, the XLM-R multilingual
  // sampling rule): keep rate_s = sqrt(n_min / n_s), so kept counts are
  // ∝ sqrt(n_s) — the head sources thinned, the smallest kept whole.
  // sqrt is IEEE-correctly-rounded on the exact rational n_min/n_s, so
  // the rates — and every id-hash keep decision under them — are
  // bit-identical cross-engine with NO rounding tricks.
  def t23_temperature_mix(spark: SparkSession, dir: String): DataFrame =
    operators.Sampling.temperatureSample(
        t(spark, dir, "documents"), "doc_id", "source")
      .groupBy($"source")
      .agg(min($"rate").as("rate"), count(lit(1)).as("kept"),
        min($"doc_id").as("first_kept"))
      .orderBy($"source")

  private val t23_sql =
    """WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
      |r AS (SELECT source,
      |    sqrt(CAST((SELECT MIN(n) FROM c) AS DOUBLE) / n) AS rate
      |  FROM c),
      |s AS (
      |  SELECT d.source, d.doc_id, r.rate
      |  FROM documents d JOIN r ON d.source = r.source
      |  WHERE (((d.doc_id % 2147483648) * 2654435761) % 4294967296
      |     + ((d.doc_id // 2147483648) * 2246822519) % 4294967296)
      |    % 4294967296 / 4294967296.0 < r.rate)
      |SELECT source, MIN(rate) AS rate, COUNT(*) AS kept,
      |  MIN(doc_id) AS first_kept
      |FROM s GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d01
  // Exact dedup: hash-groupBy on the fingerprint, keep min doc_id.
  def d01_dedup_exact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(spark, dir, "documents"), "doc_id", "text")
      .select($"keep_id", $"n_dups")
      .orderBy($"keep_id")

  private val d01_sql =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
      |FROM documents
      |GROUP BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
      |ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------- d02
  // MinHash signatures (4 portable hash functions over token codes).
  def d02_minhash(spark: SparkSession, dir: String): DataFrame = {
    val sigged = Dedup.withMinhashSignature(t(spark, dir, "documents"), "text", 4)
    sigged.select($"doc_id", $"sig_0", $"sig_1", $"sig_2", $"sig_3")
      .orderBy($"doc_id")
  }

  private val d02_sql = {
    val sigs = Text.minhashSeeds(4).zipWithIndex.map { case ((a, b), i) =>
      s"${Text.duck.minhashSql("text", a, b)} AS sig_$i"
    }.mkString(",\n  ")
    s"""SELECT doc_id,
       |  $sigs
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- d13
  // Shingle MinHash: signatures over word-3-gram hashes — the
  // production MinHash form (unigram MinHash loses word order). Docs
  // with < 3 tokens take the sentinel P in every slot.
  def d13_minhash_shingles(spark: SparkSession, dir: String): DataFrame = {
    val sigged = Dedup.withShingleMinhashSignature(
      t(spark, dir, "documents"), "text", k = 4, n = 3)
    sigged.select($"doc_id", $"ssig_0", $"ssig_1", $"ssig_2", $"ssig_3")
      .orderBy($"doc_id")
  }

  private val d13_sql = {
    val p = Text.minhashPrime
    val grams = "list_transform(generate_series(1, greatest(len(w) - 2, 0)), " +
      s"i -> ${Text.duck.ngramHashSql("w", "i", 3)})"
    val sigs = Text.minhashSeeds(4).zipWithIndex.map { case ((a, b), i) =>
      s"coalesce(list_min(list_transform(g, " +
        s"h -> ($a * (h % $p) + $b) % $p)), $p) AS ssig_$i"
    }.mkString(",\n  ")
    s"""SELECT doc_id,
       |  $sigs
       |FROM (SELECT doc_id, $grams AS g
       |      FROM (SELECT doc_id, string_split(text, ' ') AS w
       |            FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- d14
  // SemDeDup (arXiv:2303.09540): k-means-cell-blocked semantic dedup
  // over the embedding column — Lloyd centroids (the s03 build), cosine
  // pairs within cells only, connected components, canonical keep-id +
  // cluster size per vector. The oracle replays the whole chain: the
  // s03 Lloyd CTEs, argmax-cos assignment, a within-cell pair join, and
  // the d11 recursive transitive closure.
  def d14_semdedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.semDedup(t(spark, dir, "embeddings"), "vec_id", "embedding",
      nCells = 8, lloydIters = 3, threshold = 0.35,
      cents0 = Some(embCentroids(spark, dir)))
      .select($"id".as("vec_id"), $"cell", $"comp", $"cluster_n")
      .orderBy($"vec_id")

  private val d14_sql =
    s"""WITH RECURSIVE v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |    FROM embeddings),
       |  topv AS (SELECT id, v FROM v ORDER BY id LIMIT 128),
       |  num AS (SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM topv),
       |  cent0 AS (SELECT CAST(rn // 16 AS INT) AS cell, v AS cv
       |    FROM num WHERE rn % 16 = 1),
       |${lloydIterSql("cent0", 1)},
       |${lloydIterSql("cent1", 2)},
       |${lloydIterSql("cent2", 3)},
       |  a AS (SELECT id, v, cell FROM (
       |    SELECT v.id, v.v, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.id
       |        ORDER BY ${duckCos("v.v", "c.cv")} DESC, c.cell) AS rk
       |    FROM v CROSS JOIN cent3 c) WHERE rk = 1),
       |  e AS (SELECT x.id AS src, y.id AS dst
       |    FROM a x JOIN a y ON x.cell = y.cell AND x.id <> y.id
       |    WHERE list_cosine_similarity(x.v, y.v) >= 0.35),
       |  walk(id, comp) AS (
       |    SELECT id, id FROM v
       |    UNION
       |    SELECT e.dst, w.comp FROM walk w JOIN e ON e.src = w.id),
       |  comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
       |  sizes AS (SELECT comp, COUNT(*) AS cluster_n FROM comps GROUP BY comp)
       |SELECT c.id AS vec_id, a.cell, c.comp, s.cluster_n
       |FROM comps c JOIN sizes s ON s.comp = c.comp JOIN a ON a.id = c.id
       |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- d03
  // Exact n-gram (token-set) Jaccard over blocked candidate pairs.
  def d03_jaccard_pairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    // tokens sorted once per doc; the per-pair kernel is then a single
    // merge scan (SortedIntersectSize) — the pair count is quadratic in
    // block size, so the per-pair cost is what matters
    val a = docs.select($"lang".as("blk_l"), $"source".as("blk"),
      $"doc_id".as("id_a"),
      sort_array(array_distinct(Text.tokens($"text"))).as("toks_a"))
    val b = docs.select($"lang".as("blk_l"), $"source".as("blk"),
      $"doc_id".as("id_b"),
      sort_array(array_distinct(Text.tokens($"text"))).as("toks_b"))
    a.join(b, Seq("blk_l", "blk"))
      .filter($"id_a" < $"id_b")
      .withColumn("__i",
        graft.functions.ArrayExprs.sortedIntersectSize($"toks_a", $"toks_b"))
      .withColumn("jac", $"__i".cast("double") /
        (size($"toks_a") + size($"toks_b") - $"__i"))
      .filter($"jac" >= 0.3)
      .select($"id_a", $"id_b", round($"jac", 4).as("jac"))
      .orderBy($"id_a", $"id_b")
  }

  private val d03_sql =
    """WITH toks AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(string_split(text, ' ')) AS tk
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  ROUND(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
      |    (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))), 4) AS jac
      |FROM toks a JOIN toks b
      |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
      |    (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) >= 0.3
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- d04
  // SimHash 16-bit signatures.
  def d04_simhash(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select($"doc_id",
        graft.functions.SimHashExpr.simhash16($"text").as("sh"))
      .orderBy($"doc_id")

  private val d04_sql =
    s"""SELECT doc_id, ${Text.duck.simhash16Sql("text")} AS sh
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d05
  // Embedding near-dup: cosine over label-blocked pairs (IVF-style).
  def d05_embed_neardup(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(t(spark, dir, "embeddings"),
      "vec_id", "embedding", "label", 0.3)
      .orderBy($"id_a", $"id_b")

  private val d05_sql =
    """WITH v AS (SELECT vec_id, label,
      |    CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cos
      |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.3
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- s01
  // Brute-force cosine top-k against a query vector (exact baseline).
  def s01_cosine_topk(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(t(spark, dir, "embeddings"),
      "vec_id", "embedding", queryId = 0L, k = 10)
      .select($"id".as("vec_id"), $"score")

  private val s01_sql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      |    FROM embeddings),
      |  q AS (SELECT emb AS qv FROM v WHERE vec_id = 0)
      |SELECT v.vec_id, ROUND(list_cosine_similarity(v.emb, q.qv), 6) AS score
      |FROM v, q WHERE v.vec_id <> 0
      |ORDER BY score DESC, v.vec_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- s02
  // LSH-bucketed approximate top-k (scale path). Oracled: the fixed-seed
  // hyperplanes are embedded in the DuckDB SQL as DOUBLE[] literals
  // (shortest-repr round-trip = identical binary), so bucket membership
  // replays exactly; the rerank is the s01-proven cosine parity.
  def s02_ann_lsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(t(spark, dir, "embeddings"),
      "vec_id", "embedding", queryId = 0L, k = 10, dim = 64, nBits = 4)
      .select($"id".as("vec_id"), $"score")

  private val s02_sql = {
    val bkt = Similarity.hyperplanes(64, 4).zipWithIndex.map { case (p, i) =>
      val arr = p.map(_.toString).mkString("[", ", ", "]")
      s"CASE WHEN list_inner_product(v, $arr::DOUBLE[]) > 0 THEN ${1 << i} ELSE 0 END"
    }.mkString("\n    + ")
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |    FROM embeddings),
       |  b AS (SELECT id, v, $bkt AS bkt FROM v),
       |  q AS (SELECT v AS qv, bkt AS qbkt FROM b WHERE id = 0)
       |SELECT b.id AS vec_id, ROUND(list_cosine_similarity(b.v, q.qv), 6) AS score
       |FROM b, q WHERE b.bkt = q.qbkt AND b.id <> 0
       |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  }

  // ---------------------------------------------------------------- d06
  // MinHash-LSH dedup end-to-end: banded candidate generation, then
  // exact Jaccard verification — DuckDB-oracled end to end (the oracle
  // replays the full pipeline: 16 minhashes, 2 banded buckets, the
  // degenerate-bucket cap, pair distinct, token-set Jaccard ≥ 0.5).
  def d06_lsh_candidates(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val cands = Dedup.lshCandidatePairs(docs, "doc_id", "text",
      numHashes = 16, bands = 2, maxBucketSize = 100)
    Dedup.jaccardVerify(cands, docs, "doc_id", "text", threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  private val d06_sql = {
    val sigCols = Text.minhashSeeds(16).zipWithIndex.map { case ((a, b), i) =>
      s"${Text.duck.minhashSql("text", a, b)} AS s$i"
    }.mkString(",\n    ")
    def band(lo: Int) = (lo until lo + 8).map(i => s"s$i").mkString(", ")
    s"""WITH sigs AS (
       |  SELECT doc_id, $sigCols
       |  FROM documents),
       |bands AS (
       |  SELECT doc_id, 0 AS band, concat_ws('_', ${band(0)}) AS bucket FROM sigs
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, concat_ws('_', ${band(8)}) AS bucket FROM sigs),
       |big AS (SELECT band, bucket FROM bands
       |  GROUP BY band, bucket HAVING COUNT(*) > 100),
       |kept AS (SELECT bands.* FROM bands ANTI JOIN big USING (band, bucket)),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM kept a JOIN kept b USING (band, bucket) WHERE a.doc_id < b.doc_id),
       |tok AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
       |  FROM documents)
       |SELECT p.id_a, p.id_b,
       |  ROUND(CAST(len(list_intersect(ta.tk, tb.tk)) AS DOUBLE) /
       |    (len(ta.tk) + len(tb.tk) - len(list_intersect(ta.tk, tb.tk))), 4) AS jac
       |FROM pairs p JOIN tok ta ON ta.doc_id = p.id_a
       |  JOIN tok tb ON tb.doc_id = p.id_b
       |WHERE CAST(len(list_intersect(ta.tk, tb.tk)) AS DOUBLE) /
       |    (len(ta.tk) + len(tb.tk) - len(list_intersect(ta.tk, tb.tk))) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------- t44
  // Persisted LSH dedup index lifecycle — the incremental-snapshot
  // dedup a rolling crawl needs: BUILD the signature index on the first
  // half of the corpus, APPEND the third quarter (the next snapshot),
  // then PROBE the last quarter as the new batch — candidates come from
  // the STORED signatures (the old corpus's text is never re-read),
  // verified by exact Jaccard. The oracle cannot tell build from append
  // (that is the point: incremental ≡ rebuilt — spec-pinned too), so it
  // replays signatures over doc_id % 4 < 3 as the index side.
  def t44_lsh_index_dedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val path = s"/tmp/graft_lshidx/${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
      s"_${srcStamp(dir, "documents.parquet")}"
    // `appended` marks the END of the two-step lifecycle: buckets/_SUCCESS
    // alone would pass after a crash between build and append.
    if (!new java.io.File(s"$path/appended").exists()) {
      Dedup.buildLshIndex(docs.filter($"doc_id" % 4 < 2), "doc_id", "text",
        numHashes = 16, bands = 2, path)
      Dedup.appendToLshIndex(docs.filter($"doc_id" % 4 === 2), "doc_id",
        "text", path)
      new java.io.File(s"$path/appended").createNewFile()
    }
    val cands = Dedup.probeLshIndex(docs.filter($"doc_id" % 4 === 3),
      "doc_id", "text", path, maxBucketSize = 100)
      .select($"id_idx".as("id_a"), $"id_new".as("id_b"))
    Dedup.jaccardVerify(cands, docs, "doc_id", "text", threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  private val t44_sql = {
    val sigCols = Text.minhashSeeds(16).zipWithIndex.map { case ((a, b), i) =>
      s"${Text.duck.minhashSql("text", a, b)} AS s$i"
    }.mkString(",\n    ")
    def band(lo: Int) = (lo until lo + 8).map(i => s"s$i").mkString(", ")
    s"""WITH sigs AS (
       |  SELECT doc_id, $sigCols
       |  FROM documents),
       |bands AS (
       |  SELECT doc_id, 0 AS band, concat_ws('_', ${band(0)}) AS bucket FROM sigs
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, concat_ws('_', ${band(8)}) AS bucket FROM sigs),
       |idx AS (SELECT * FROM bands WHERE doc_id % 4 < 3),
       |newb AS (SELECT * FROM bands WHERE doc_id % 4 = 3),
       |big AS (SELECT band, bucket FROM idx
       |  GROUP BY band, bucket HAVING COUNT(*) > 100),
       |kept AS (SELECT idx.* FROM idx ANTI JOIN big USING (band, bucket)),
       |pairs AS (SELECT DISTINCT k.doc_id AS id_a, n.doc_id AS id_b
       |  FROM kept k JOIN newb n USING (band, bucket)),
       |tok AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
       |  FROM documents)
       |SELECT p.id_a, p.id_b,
       |  ROUND(CAST(len(list_intersect(ta.tk, tb.tk)) AS DOUBLE) /
       |    (len(ta.tk) + len(tb.tk) - len(list_intersect(ta.tk, tb.tk))), 4) AS jac
       |FROM pairs p JOIN tok ta ON ta.doc_id = p.id_a
       |  JOIN tok tb ON tb.doc_id = p.id_b
       |WHERE CAST(len(list_intersect(ta.tk, tb.tk)) AS DOUBLE) /
       |    (len(ta.tk) + len(tb.tk) - len(list_intersect(ta.tk, tb.tk))) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------- t47
  // Streaming LSH-index ingest — t44's incremental snapshot arriving as
  // a LIVE feed: build the index on the first half, stream-ingest the
  // third quarter's signatures from the shared documents feed (routed
  // by a `where` predicate), probe the last quarter. Stream == batch by
  // construction, so the oracle IS t44's SQL; at-least-once appends are
  // EXACTLY-ONCE at the candidate level (probe is distinct — a replayed
  // batch only duplicates signature rows).
  def t47_stream_lsh_ingest(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val stage = s"/tmp/graft_stream/$key/documents"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      sources.Store.setSplayed(docs, stage)
    val base = s"/tmp/graft_stream/$key/" +
      s"lsh_h16_b2_${srcStamp(dir, "documents.parquet")}"
    val idxPath = s"$base/index"
    if (!new java.io.File(s"$base/done").exists()) {
      Dedup.buildLshIndex(docs.filter($"doc_id" % 4 < 2), "doc_id", "text",
        numHashes = 16, bands = 2, idxPath)
      streaming.Streams.lshIngest(spark, stage, docs, "doc_id", "text",
        idxPath, checkpoint = s"$base/ckpt",
        where = Some("doc_id % 4 = 2"))
      new java.io.File(s"$base/done").createNewFile()
    }
    val cands = Dedup.probeLshIndex(docs.filter($"doc_id" % 4 === 3),
      "doc_id", "text", idxPath, maxBucketSize = 100)
      .select($"id_idx".as("id_a"), $"id_new".as("id_b"))
    Dedup.jaccardVerify(cands, docs, "doc_id", "text", threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  // ---------------------------------------------------------------- t48
  // Token-budget epoch mixing — the repeat-upsampling half of a LLaMA-
  // style mix recipe: per-source integer token budgets materialize as
  // full epochs + a deterministic hash-ordered partial epoch (the
  // greedy-pack overshoot rule). src3's budget is below one epoch (the
  // partial-only case); unbudgeted sources drop. Output = the trainer's
  // sampling manifest (one row per materialized copy).
  def t48_epoch_mix(spark: SparkSession, dir: String): DataFrame =
    operators.Sampling.epochMix(t(spark, dir, "documents"),
      "doc_id", "source", "text",
      Map("src0" -> 8000L, "src1" -> 6000L, "src2" -> 2500L,
        "src3" -> 700L))
      .select($"id".as("doc_id"), $"src".as("source"), $"epoch")
      .orderBy($"doc_id", $"epoch")

  private val t48_sql =
    """WITH tk AS (SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    (((doc_id % 2147483648) * 2654435761) % 4294967296
      |     + ((doc_id // 2147483648) * 2246822519) % 4294967296)
      |    % 4294967296 AS h
      |  FROM documents
      |  WHERE source IN ('src0', 'src1', 'src2', 'src3')),
      |b AS (SELECT * FROM (VALUES ('src0', 8000), ('src1', 6000),
      |    ('src2', 2500), ('src3', 700)) AS t(source, b_src)),
      |tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS t_src
      |        FROM tk GROUP BY source),
      |w AS (SELECT tk.doc_id, tk.source, b.b_src, tot.t_src,
      |    CAST(COALESCE(SUM(n) OVER (PARTITION BY tk.source
      |      ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum_excl
      |  FROM tk JOIN b USING (source) JOIN tot USING (source)),
      |e AS (SELECT doc_id, source,
      |    b_src // t_src
      |      + CASE WHEN cum_excl < b_src % t_src THEN 1 ELSE 0 END
      |      AS epochs
      |  FROM w)
      |SELECT doc_id, source,
      |  CAST(unnest(generate_series(0, epochs - 1)) AS BIGINT) AS epoch
      |FROM e WHERE epochs > 0 ORDER BY doc_id, epoch""".stripMargin

  // ---------------------------------------------------------------- t45
  // Prototype semantic quality filter (the CLIP-score/DataComp shape):
  // centroid of the curated anchor set (label 0) as the quality
  // prototype — an exact-decimal mean, so a replayable model artifact —
  // then every vector scored by cosine to it, keep = score ≥ τ. The
  // scoring plan is ONE narrow codegen map (centroid is a literal):
  // at 100 TB this is scan-speed model-based filtering.
  def t45_proto_quality(spark: SparkSession, dir: String): DataFrame =
    Similarity.prototypeScore(t(spark, dir, "embeddings"),
      "vec_id", "embedding", protoCentroid(spark, dir), threshold = 0.2)
      .select($"id".as("vec_id"), $"score", $"keep")
      .orderBy($"vec_id")

  private val t45_sql =
    """WITH v AS (SELECT vec_id, label,
      |    CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |px AS (SELECT i, CAST(emb[i] AS DOUBLE) AS x FROM (
      |  SELECT emb, unnest(generate_series(1, len(emb))) AS i
      |  FROM v WHERE label = 0)),
      |m AS (SELECT i, CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
      |        / COUNT(*) AS m
      |      FROM px GROUP BY i),
      |c AS (SELECT list(m ORDER BY i) AS cv FROM m)
      |SELECT vec_id, ROUND(list_cosine_similarity(emb, cv), 6) AS score,
      |  CASE WHEN list_cosine_similarity(emb, cv) >= 0.2 THEN 1 ELSE 0 END
      |    AS keep
      |FROM v, c ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- t46
  // k-center greedy coreset (Gonzalez farthest-point) — the diversity
  // selector: 8 exemplars covering the embedding space, each round ONE
  // narrow scan + a 1-row top-k (centers ride as literals). The oracle
  // replays the greedy chain as 7 generated MATERIALIZED CTE stages
  // (the s07 lesson: without MATERIALIZED DuckDB re-inlines each stage
  // per reference and the chain goes exponential).
  def t46_kcenter_coreset(spark: SparkSession, dir: String): DataFrame =
    Similarity.kCenterGreedy(t(spark, dir, "embeddings"),
      "vec_id", "embedding", k = 8, seedId = 0L)
      .select($"rank", $"id", $"far")
      .orderBy($"rank")

  private val t46_sql = {
    def stage(i: Int): String = {
      val coss = (0 until i).map(j =>
        s"list_cosine_similarity(v.emb, (SELECT emb FROM c$j))")
      val mc = if (i == 1) coss.head
               else s"greatest(${coss.mkString(",\n    ")})"
      val excl = (0 until i).map(j =>
        s"v.vec_id <> (SELECT vec_id FROM c$j)").mkString("\n    AND ")
      s"""c$i AS MATERIALIZED (SELECT vec_id, emb, ROUND($mc, 6) AS far
         |  FROM v WHERE $excl
         |  ORDER BY $mc ASC, vec_id LIMIT 1)""".stripMargin
    }
    val ranks = (1 until 8).map(i =>
      s"UNION ALL SELECT $i, vec_id, far FROM c$i").mkString("\n  ")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |    FROM embeddings),
       |c0 AS MATERIALIZED (SELECT vec_id, emb, CAST(NULL AS DOUBLE) AS far
       |  FROM v WHERE vec_id = 0),
       |${(1 until 8).map(stage).mkString(",\n")}
       |SELECT * FROM (
       |  SELECT 0 AS rank, vec_id AS id, far FROM c0
       |  $ranks
       |) ORDER BY rank""".stripMargin
  }

  // ---------------------------------------------------------------- d07
  // SimHash near-dup pairs (blocked hamming), DuckDB-oracled end to end.
  def d07_simhash_neardup(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup(t(spark, dir, "documents"), "doc_id", "text",
      maxHamming = 3, blockBits = 8)
      .orderBy($"id_a", $"id_b")

  private val d07_sql =
    s"""WITH sh AS (SELECT doc_id, ${Text.duck.simhash16Sql("text")} AS sh
       |  FROM documents),
       |blk AS (SELECT doc_id, sh, sh // 256 AS blk FROM sh)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
       |FROM blk a JOIN blk b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sh, b.sh)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- d08
  // Multi-permutation SimHash near-dup: 3 rotations of the signature
  // each block on their top 8 bits, candidates UNION — recovers pairs a
  // single blocking table misses when they differ in the top bits.
  // Fully DuckDB-oracled (rotation arithmetic mirrored in SQL).
  def d08_simhash_multiperm(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupMulti(t(spark, dir, "documents"), "doc_id", "text",
      maxHamming = 3, blockBits = 8, rotations = Seq(0, 5, 11))
      .orderBy($"id_a", $"id_b")

  private val d08_sql = {
    val rots = Seq(0, 5, 11)
    def blk(c: String, r: Int) =
      s"(($c * ${1L << r}) % 65536 + $c // ${1L << (16 - r)}) // 256"
    val joins = rots.zipWithIndex.map { case (r, i) =>
      // first-match rule mirrors the Spark operator: a pair reports
      // under its first rotation whose blocks collide → disjoint
      // branches, UNION ALL
      val earlier = rots.take(i)
        .map(pr => s"${blk("a.sh", pr)} <> ${blk("b.sh", pr)}")
        .map(c => s"\n  AND $c").mkString
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
         |FROM sh a JOIN sh b
         |  ON ${blk("a.sh", r)} = ${blk("b.sh", r)}
         |  AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 3$earlier""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH sh AS (SELECT doc_id, ${graft.functions.Text.duck.simhash16Sql("text")} AS sh
       |  FROM documents)
       |  $joins
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------- d09
  // 64-bit-space SimHash signatures (63 active bits; the production
  // dedup width — four 16-bit polynomial token-code lanes, see
  // functions.SimHash64 / Text.duck.tokenCode64Sql).
  def d09_simhash64(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select($"doc_id",
        graft.functions.SimHashExpr.simhash64($"text").as("sh"))
      .orderBy($"doc_id")

  private val d09_sql =
    s"""SELECT doc_id, ${Text.duck.simhash64Sql("text")} AS sh
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d10
  // 64-bit SimHash near-dup: four 16-bit chunk tables; hamming ≤ 3
  // pairs share ≥ 1 untouched chunk (pigeonhole) — EXACT candidate
  // recall, first-match-disjoint branches, no DISTINCT shuffle.
  def d10_simhash64_neardup(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup64(t(spark, dir, "documents"), "doc_id", "text",
      maxHamming = 3)
      .orderBy($"id_a", $"id_b")

  // the sh + pigeonhole-pair CTE prefix, shared by d10 and t55
  private def simhash64PairsSql: String = {
    def chunk(c: String, k: Int) = s"($c // ${1L << (16 * k)}) % 65536"
    val joins = (0 until 4).map { k =>
      val earlier = (0 until k)
        .map(pk => s"${chunk("a.sh", pk)} <> ${chunk("b.sh", pk)}")
        .map(c => s"\n    AND $c").mkString
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
         |  FROM sh a JOIN sh b
         |    ON ${chunk("a.sh", k)} = ${chunk("b.sh", k)}
         |    AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sh, b.sh)) <= 3$earlier""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH sh AS (SELECT doc_id, ${Text.duck.simhash64Sql("text")} AS sh
       |  FROM documents),
       |pairs AS (
       |  $joins)""".stripMargin
  }

  private val d10_sql =
    s"""$simhash64PairsSql
       |SELECT id_a, id_b, hamming FROM pairs
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- t55
  // SPLIT-LEAKAGE census (eval hygiene): near-dup pairs (the d10
  // simhash64 pigeonhole join) that CROSS the t15 deterministic
  // train/val/test split — each row is a document whose near-duplicate
  // sits in a different split, i.e. evaluation contamination by
  // duplication. The split is a PURE FUNCTION of doc_id
  // (Sampling.splitAssign), so the engine enriches the pair list with
  // a narrow map — NO join against the corpus-size split table; at
  // 100 TB the cost is the d10 blocking join alone.
  def t55_split_leakage(spark: SparkSession, dir: String): DataFrame = {
    val sb = Seq("train" -> 0.8, "val" -> 0.9)
    def sp(c: org.apache.spark.sql.Column) =
      operators.Sampling.splitAssign(c, sb, "test")
    Dedup.simhashNearDup64(t(spark, dir, "documents"), "doc_id", "text",
        maxHamming = 3)
      .select($"id_a", $"id_b", sp($"id_a").as("split_a"),
        sp($"id_b").as("split_b"), $"hamming")
      .filter($"split_a" =!= $"split_b")
      .orderBy($"id_a", $"id_b")
  }

  private val t55_sql =
    s"""$simhash64PairsSql,
       |u AS (
       |  SELECT doc_id,
       |    CASE WHEN d < 0.8 THEN 'train' WHEN d < 0.9 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |    (((doc_id % 2147483648) * 2654435761) % 4294967296
       |     + ((doc_id // 2147483648) * 2246822519) % 4294967296)
       |    % 4294967296 / 4294967296.0 AS d
       |  FROM documents))
       |SELECT p.id_a, p.id_b, ua.split AS split_a, ub.split AS split_b,
       |  p.hamming
       |FROM pairs p JOIN u ua ON ua.doc_id = p.id_a
       |  JOIN u ub ON ub.doc_id = p.id_b
       |WHERE ua.split <> ub.split
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- t59
  // INCREMENTAL cluster maintenance on a persisted dedup index: the
  // stored (id, comp) labels absorb a new batch's pairs through a
  // QUOTIENT merge (Dedup.appendToClusterState — |affected clusters| +
  // |batch| nodes, never corpus-sized) instead of re-clustering. The
  // query BUILDS state from the first three id-quarters' d10 pairs,
  // APPENDS the last quarter incrementally, and reports stored cluster
  // sizes — the ORACLE replays the FULL corpus closure (the d11
  // recursive CTE) and sizes it, so hash-green here proves
  // incremental ≡ full re-cluster on real data.
  def t59_cluster_state(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val path = s"/tmp/graft_t59_v1/${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
      s"_${srcStamp(dir, "documents.parquet")}"
    if (!new java.io.File(s"$path/clusters/_SUCCESS").exists()) {
      val pairs = Dedup.simhashNearDup64(docs, "doc_id", "text",
        maxHamming = 3)
      val isOld = (c: org.apache.spark.sql.Column) => c % 4 < 3
      Dedup.buildClusterState(docs.filter(isOld($"doc_id")), "doc_id",
        pairs.filter(isOld($"id_a") && isOld($"id_b")), path)
      Dedup.appendToClusterState(docs.filter($"doc_id" % 4 === 3), "doc_id",
        pairs.filter(!(isOld($"id_a") && isOld($"id_b"))), path)
    }
    Dedup.clusterSizes(spark, path).orderBy($"comp")
  }

  private val t59_sql = {
    def chunk(c: String, k: Int) = s"($c // ${1L << (16 * k)}) % 65536"
    val on = (0 until 4)
      .map(k => s"${chunk("a.sh", k)} = ${chunk("b.sh", k)}")
      .mkString(" OR ")
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, ${Text.duck.simhash64Sql("text")} AS sh
       |  FROM documents),
       |edges AS (
       |  SELECT a.doc_id AS src, b.doc_id AS dst
       |  FROM sh a JOIN sh b
       |    ON ($on) AND a.doc_id <> b.doc_id
       |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
       |walk(id, comp) AS (
       |  SELECT doc_id, doc_id FROM sh
       |  UNION
       |  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
       |labels AS (
       |  SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
       |SELECT comp, CAST(COUNT(*) AS BIGINT) AS n
       |FROM labels GROUP BY comp ORDER BY comp""".stripMargin
  }

  // ---------------------------------------------------------------- t56
  // Raw-HTML → clean-text extraction (the stage a crawl pipeline runs
  // before EVERYTHING else here; functions/HtmlExpr.scala has the rule
  // chain). The testdata has no raw-HTML column, so a deterministic
  // page is CONSTRUCTED per doc from (doc_id, lang, source, text) —
  // identically in both engines, html_len pins the construction — with
  // style/script to drop, nav boilerplate, entities (incl. the
  // &amp;lt; double-encoding), and a doc_id%4-selected malformed tail.
  // Engine side: ONE narrow codegen map, no shuffle; oracle replays
  // the identical chain via Html.cleanChainSql.
  def t56_html_extract(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val staged = d.select($"doc_id", $"lang",
      operators.Html.stagedHtmlCol($"doc_id", $"lang", $"source", $"text")
        .as("html"))
    operators.Html.cleanHtml(staged, "html", textOut = "text_out")
      .select($"doc_id", $"lang", length($"html").as("html_len"),
        $"n_tags", $"n_blocks", $"n_boiler", $"boiler_frac",
        length($"text_out").as("text_len"), $"text_out".as("text"))
      .orderBy($"doc_id")
  }

  private val t56_sql =
    operators.Html.cleanChainSql(operators.Html.stagedHtmlSql,
      Seq("doc_id", "lang")) + "\nORDER BY doc_id"

  // ---------------------------------------------------------------- d11
  // Near-dup cluster resolution: connected components over the d10
  // (simhash64) pairs by min-label propagation — every doc labeled with
  // its cluster's minimum doc_id; `comp == doc_id` rows are the
  // canonical keep-list. Oracled against a DuckDB recursive transitive
  // closure over the same edges.
  def d11_dedup_components(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.simhashNearDup64(docs, "doc_id", "text", maxHamming = 3)
    Dedup.connectedComponents(docs, "doc_id", pairs)
      .select($"id".as("doc_id"), $"comp")
      .orderBy($"doc_id")
  }

  private val d11_sql = {
    def chunk(c: String, k: Int) = s"($c // ${1L << (16 * k)}) % 65536"
    val on = (0 until 4)
      .map(k => s"${chunk("a.sh", k)} = ${chunk("b.sh", k)}")
      .mkString(" OR ")
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, ${Text.duck.simhash64Sql("text")} AS sh
       |  FROM documents),
       |edges AS (
       |  SELECT a.doc_id AS src, b.doc_id AS dst
       |  FROM sh a JOIN sh b
       |    ON ($on) AND a.doc_id <> b.doc_id
       |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
       |walk(id, comp) AS (
       |  SELECT doc_id, doc_id FROM sh
       |  UNION
       |  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id)
       |SELECT id AS doc_id, MIN(comp) AS comp
       |FROM walk GROUP BY id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- d12
  // The applied dedup: keep one canonical doc per near-dup cluster
  // (comp == doc_id) and report the kept corpus with its cluster size —
  // the end-to-end raw-docs → clusters → shipped-corpus step.
  def d12_dedup_apply(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.simhashNearDup64(docs, "doc_id", "text", maxHamming = 3)
    val comps = Dedup.connectedComponents(docs, "doc_id", pairs)
    val sizes = comps.groupBy($"comp").agg(count(lit(1)).as("cluster_n"))
    comps.filter($"id" === $"comp")
      .join(sizes, "comp")
      .join(docs.select($"doc_id", length($"text").as("text_len")),
        $"id" === $"doc_id")
      .select($"doc_id", $"cluster_n", $"text_len")
      .orderBy($"doc_id")
  }

  private val d12_sql = {
    def chunk(c: String, k: Int) = s"($c // ${1L << (16 * k)}) % 65536"
    val on = (0 until 4)
      .map(k => s"${chunk("a.sh", k)} = ${chunk("b.sh", k)}")
      .mkString(" OR ")
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, ${Text.duck.simhash64Sql("text")} AS sh
       |  FROM documents),
       |edges AS (
       |  SELECT a.doc_id AS src, b.doc_id AS dst
       |  FROM sh a JOIN sh b
       |    ON ($on) AND a.doc_id <> b.doc_id
       |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
       |walk(id, comp) AS (
       |  SELECT doc_id, doc_id FROM sh
       |  UNION
       |  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
       |comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
       |sizes AS (SELECT comp, COUNT(*) AS cluster_n FROM comps GROUP BY comp)
       |SELECT c.id AS doc_id, s.cluster_n,
       |  CAST(length(d.text) AS INTEGER) AS text_len
       |FROM comps c JOIN sizes s ON c.comp = s.comp
       |  JOIN documents d ON d.doc_id = c.id
       |WHERE c.id = c.comp ORDER BY doc_id""".stripMargin
  }

  // ================================================================
  // Storage, streaming, temporal, casts, generation (SURVEY §2.1/§2.8/
  // §2.10).
  // ================================================================
  import graft.sources.Store
  import graft.streaming.Streams

  // ---------------------------------------------------------------- q19
  // Parted (date-partitioned) storage round-trip: write lineitem
  // Hive-partitioned by ship month, reload, query one month — the filter
  // on the virtual partition column prunes partitions before IO
  // (reference set-parted/get-parted, /root/reference/core/vary.c:176).
  def q19_parted(spark: SparkSession, dir: String): DataFrame = {
    val path = s"/tmp/graft_parted/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/lineitem"
    // stage once — the testdata is immutable, so an existing _SUCCESS
    // marker means the parted store is current (same rule as q21's stage)
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      val li = t(spark, dir, "lineitem")
        .withColumn("ship_month", date_format($"l_shipdate", "yyyy-MM"))
      Store.setParted(li, path, "ship_month")
    }
    Store.getParted(spark, path)
      .filter($"ship_month" === "1995-03")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  private val q19_sql =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem WHERE strftime(l_shipdate, '%Y-%m') = '1995-03'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q20
  // Typed CSV round-trip (reference read-csv/write-csv with explicit
  // type vector, /root/reference/core/io.c:367-1030).
  def q20_csv(spark: SparkSession, dir: String): DataFrame = {
    val path = s"/tmp/graft_csv/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/nation"
    val nation = t(spark, dir, "nation")
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      Store.writeCsv(nation, path)
    Store.readCsv(spark, path, nation.schema)
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n"), min($"n_name").as("first_name"))
      .orderBy($"n_regionkey")
  }

  private val q20_sql =
    """SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS first_name
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  // ---------------------------------------------------------------- q21
  // Streaming parity: events parquet ingested as a micro-batch stream,
  // tumbling 1-hour windows (the reference's xbar-on-timestamps + by:
  // loop, SURVEY §2.10), materialized via a memory sink. The streaming
  // result must equal the equivalent batch aggregation — the oracle IS
  // the batch query.
  def q21_stream_tumbling(spark: SparkSession, dir: String): DataFrame = {
    val batch = t(spark, dir, "events")
    val name = "graft_stream_" + math.abs(dir.hashCode)
    // the streaming file source ingests a directory (the reference's
    // journal dir); stage the events table into one (once — the testdata
    // is immutable, so an existing _SUCCESS marker means it's current)
    val stage = s"/tmp/graft_stream/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/events"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      Store.setSplayed(batch, stage)
    Streams.tumblingCounts(spark, stage, batch,
      tsCol = "ts2", keyCol = "event_type", valueCol = "value",
      windowSec = 3600, queryName = name,
      prep = df => df.withColumn("ts2", expr("timestamp_micros(ts div 1000)")))
      .select(unix_timestamp($"window.start").as("hour_epoch"),
        $"event_type", $"n", round($"sum_value", 4).as("sum_value"))
      .orderBy($"hour_epoch", $"event_type")
  }

  private val q21_sql =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |  event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      |FROM events GROUP BY hour_epoch, event_type
      |ORDER BY hour_epoch, event_type""".stripMargin

  // ---------------------------------------------------------------- q22
  // Temporal functions (reference temporal library, SURVEY §2.8):
  // component extraction, date arithmetic, day deltas.
  def q22_temporal(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select($"o_orderkey",
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        dayofmonth($"o_orderdate").cast("long").as("dom"),
        date_add($"o_orderdate".cast("date"), 30).as("due_date"),
        datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"))
      .orderBy($"o_orderkey")

  private val q22_sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  CAST(day(o_orderdate) AS BIGINT) AS dom,
      |  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
      |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q23
  // Casts (reference `as`, /root/reference/core/compose.c:42): numeric
  // truncation, to-string, string-to-number round trips.
  def q23_casts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        $"l_extendedprice".cast("long").as("price_trunc"),
        concat($"l_returnflag", lit("#"), $"l_linenumber".cast("string")).as("tag"),
        substring($"l_orderkey".cast("string"), 1, 3).cast("long").as("key_prefix"))
      .orderBy($"l_orderkey", $"l_linenumber")

  private val q23_sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(trunc(l_extendedprice) AS BIGINT) AS price_trunc,
      |  l_returnflag || '#' || CAST(l_linenumber AS VARCHAR) AS tag,
      |  CAST(substr(CAST(l_orderkey AS VARCHAR), 1, 3) AS BIGINT) AS key_prefix
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q24
  // concat (table append, type-promoting; reference
  // /root/reference/core/compose.c:465) + grouped collect
  // (aggr_collect → ordered distinct string agg).
  def q24_concat_group(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val both = li.filter($"l_quantity" > 48)
      .unionByName(li.filter($"l_quantity" < 2))
    both.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        concat_ws(",", array_sort(collect_set($"l_linestatus"))).as("statuses"))
      .orderBy($"l_returnflag")
  }

  private val q24_sql =
    """WITH both_ends AS (
      |  SELECT * FROM lineitem WHERE l_quantity > 48
      |  UNION ALL SELECT * FROM lineitem WHERE l_quantity < 2)
      |SELECT l_returnflag, COUNT(*) AS n,
      |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
      |FROM both_ends GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q25
  // Generation (reference til/rand, /root/reference/core/compose.c:70):
  // deterministic ranges; rand is engine-specific so only til is
  // oracle-checked.
  def q25_til(spark: SparkSession, dir: String): DataFrame =
    spark.range(0, 1000).toDF("i")
      .select($"i", RF.xbar(lit(100L), $"i").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n"), sum($"i").as("s"))
      .orderBy($"bucket")

  private val q25_sql =
    """SELECT (i - i % 100) AS bucket, COUNT(*) AS n,
      |  CAST(SUM(i) AS BIGINT) AS s
      |FROM range(0, 1000) t(i) GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q26
  // Tbl facade select: where → by → mappings (non-agg defaults to
  // first-per-group in arrival order) → take. Oracle pins arrival order
  // via arg_min on the unique (l_orderkey, l_linenumber) key, which is
  // the file order of the generated data.
  def q26_facade_select(spark: SparkSession, dir: String): DataFrame =
    // pin arrival order so "first-per-group" is well defined for the
    // oracle; (l_orderkey, l_linenumber) alone is NOT unique in the
    // synthetic data, so l_linestatus joins the sort key to make the
    // order total
    Tbl(t(spark, dir, "lineitem")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_linestatus"))
      .select(
        mappings = Seq(
          "sum_qty" -> dsum($"l_quantity"),
          "n" -> count(lit(1)),
          "first_status" -> $"l_linestatus"),
        where = $"l_quantity" > 10,
        by = Seq("l_returnflag"))
      .df.orderBy($"l_returnflag")

  private val q26_sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n,
      |  arg_min(l_linestatus, (l_orderkey*10 + l_linenumber)*1000
      |    + ascii(substr(l_linestatus, 1, 1))) AS first_status
      |FROM lineitem WHERE l_quantity > 10
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q27
  // Tbl facade update: conditional column rewrite, CoW semantics.
  def q27_facade_update(spark: SparkSession, dir: String): DataFrame =
    Tbl(t(spark, dir, "orders"))
      // additive surcharge: exact in binary doubles, so no cross-engine
      // round-half divergence (multiplicative updates hit .005 halfway
      // cases where Spark rounds the shortest decimal repr and DuckDB
      // the exact binary value)
      .update(Seq("o_totalprice" -> ($"o_totalprice" + 250.0)),
        where = $"o_orderpriority" === "1-URGENT")
      .df
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderkey")

  private val q27_sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderpriority = '1-URGENT'
      |    THEN o_totalprice + 250.0 ELSE o_totalprice END AS o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- m01
  // Multimodal metadata: documents' text bytes as opaque binary payloads
  // (media blobs), expression-level metadata — lengths + checksums.
  def m01_media_meta(spark: SparkSession, dir: String): DataFrame = {
    val media = t(spark, dir, "documents")
      .select($"doc_id", $"lang".as("kind"), $"text".cast("binary").as("data"))
    operators.Multimodal.mediaMeta(media, "doc_id", "data", "kind")
      .orderBy($"media_id")
  }

  private val m01_sql =
    """SELECT doc_id AS media_id, lang AS kind,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  md5(text) AS checksum
      |FROM documents ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- m02
  // Multimodal decode stub via typed mapPartitions (mapInPandas shape):
  // per-media pseudo-pixel features. DuckDB-oracled: the payloads are the
  // docs' UTF-8 bytes and the corpus is ASCII, so byte values == ascii()
  // codes on the oracle side (MultimodalSpec pins non-ASCII bytes too).
  def m02_media_decode(spark: SparkSession, dir: String): DataFrame = {
    val media = t(spark, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("data"))
    operators.Multimodal.extractFeatures(media, "doc_id", "data")
      .select($"media_id", $"n_bytes", $"n_frames",
        round($"mean_intensity", 4).as("mean_intensity"))
      .orderBy($"media_id")
  }

  private val m02_sql =
    """SELECT doc_id AS media_id,
      |  CAST(length(text) AS INTEGER) AS n_bytes,
      |  CAST(ceil(length(text) / 64.0) AS INTEGER) AS n_frames,
      |  ROUND(CASE WHEN length(text) = 0 THEN 0.0
      |    ELSE CAST(list_sum(list_transform(range(1, length(text) + 1),
      |      j -> ascii(substr(text, j, 1)))) AS DOUBLE) / length(text) END, 4)
      |    AS mean_intensity
      |FROM documents ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- m03
  // Frame sampling (flatMap/UDTF shape): every 2nd 64-byte frame.
  def m03_frame_sample(spark: SparkSession, dir: String): DataFrame = {
    val media = t(spark, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("data"))
    operators.Multimodal.sampleFrames(media, "doc_id", "data", stride = 2)
      .select($"media_id", $"frame_idx", $"frame_bytes",
        round($"intensity", 4).as("intensity"))
      .orderBy($"media_id", $"frame_idx")
  }

  private val m03_sql =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents)
      |SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_idx,
      |  CAST(LEAST(64, n - i * 64) AS INTEGER) AS frame_bytes,
      |  ROUND(CAST(list_sum(list_transform(
      |      range(i * 64 + 1, LEAST(n, (i + 1) * 64) + 1),
      |      j -> ascii(substr(text, j, 1)))) AS DOUBLE)
      |    / LEAST(64, n - i * 64), 4) AS intensity
      |FROM d, unnest(range(0, CAST(ceil(n / 64.0) AS BIGINT))) AS t(i)
      |WHERE i % 2 = 0
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- m04
  // Perceptual-hash media dedup: the aHash family over the decoded
  // pixel stream — 62 equal spans, bit = span mean > global mean
  // (CROSS-MULTIPLIED, pure integers, 62 bits so the signature stays
  // non-negative and the d10 blocked-hamming arithmetic applies
  // unchanged) — then the shared 4×16-bit pigeonhole pair join
  // (Dedup.hammingNearDup64). The media-dedup step of a multimodal
  // pipeline: one typed decode pass, signatures only ever shuffle.
  def m04_phash(spark: SparkSession, dir: String): DataFrame = {
    val media = t(spark, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("data"))
    operators.Multimodal.perceptualHash(media, "doc_id", "data")
      .select($"media_id", $"n_bytes", $"phash")
      .orderBy($"media_id")
  }

  // (The pair join over these signatures — Dedup.hammingNearDup64, the
  // shared d10 4×16-bit pigeonhole — is exercised on planted near-dup
  // payloads in MultimodalSpec: this corpus has no hamming≤3 media
  // pairs, and a 0-row oracle would be vacuous.)
  private def phashSql(where: String, withBytes: Boolean): String = {
    val bytesCol =
      if (withBytes) "CAST(MIN(n) AS INTEGER) AS n_bytes,\n  " else ""
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
      |  WHERE $where),
      |tot AS (SELECT doc_id, n,
      |  CAST(coalesce(list_sum(list_transform(range(1, n + 1),
      |    j -> ascii(substr(text, j, 1)))), 0) AS BIGINT) AS total
      |  FROM d),
      |cells AS (SELECT d.doc_id, d.n, k, tot.total,
      |  CAST(coalesce(list_sum(list_transform(
      |    range((k * d.n) // 62 + 1, ((k + 1) * d.n) // 62 + 1),
      |    j -> ascii(substr(d.text, j, 1)))), 0) AS BIGINT) AS cs,
      |  ((k + 1) * d.n) // 62 - (k * d.n) // 62 AS cl
      |  FROM d JOIN tot USING (doc_id), unnest(range(0, 62)) AS t(k))
      |SELECT doc_id AS media_id, $bytesCol
      |  CAST(COALESCE(SUM(
      |    CASE WHEN cl > 0 AND cs * n > total * cl
      |         THEN (CAST(1 AS BIGINT) << k) ELSE 0 END), 0) AS BIGINT)
      |    AS phash
      |FROM cells GROUP BY doc_id ORDER BY media_id""".stripMargin
  }

  private val m04_sql = phashSql("TRUE", withBytes = true)

  // ---------------------------------------------------------------- m06
  // DCT-based perceptual hash (pHash proper, next to m04's aHash):
  // fixed-point DCT coefficient signs over exactly-centered box means —
  // EXACTLY invariant under uniform brightness shifts and positive
  // contrast scaling (MultimodalSpec pins planted shifted pairs; aHash
  // flips cells under both). Integer arithmetic end-to-end; the cosine
  // table is generated ONCE with StrictMath and embedded in the oracle
  // as literals (the s13 JL signs precedent) — no trig cross-engine.
  def m06_dct_hash(spark: SparkSession, dir: String): DataFrame = {
    val media = t(spark, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("data"))
    operators.Multimodal.dctHash(media, "doc_id", "data")
      .select($"media_id", $"n_bytes", $"dhash")
      .orderBy($"media_id")
  }

  private val m06_sql = {
    import operators.Multimodal.{DctBits, DctN, dctTable}
    val tvals = (0 until DctBits).flatMap(ki => (0 until DctN).map(b =>
      s"(${ki + 1},$b,${dctTable(ki)(b)})")).mkString(",")
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |bx AS (SELECT doc_id, b,
       |    CAST(coalesce(list_sum(list_transform(
       |      range((b * n) // $DctN + 1, ((b + 1) * n) // $DctN + 1),
       |      j -> ascii(substr(text, j, 1)))), 0) AS BIGINT) AS cs,
       |    ((b + 1) * n) // $DctN - (b * n) // $DctN AS cl
       |  FROM d, unnest(range(0, $DctN)) AS t(b)),
       |sm AS (SELECT doc_id, b,
       |    CASE WHEN cl > 0 THEN cs // cl ELSE 0 END AS s FROM bx),
       |ts AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS tot FROM sm
       |       GROUP BY doc_id),
       |dct(k, b, tv) AS (SELECT * FROM (VALUES $tvals)),
       |coef AS (SELECT sm.doc_id, dct.k,
       |    CAST(SUM(($DctN * sm.s - ts.tot) * dct.tv) AS BIGINT) AS c
       |  FROM sm JOIN ts USING (doc_id) JOIN dct ON dct.b = sm.b
       |  GROUP BY sm.doc_id, dct.k)
       |SELECT d.doc_id AS media_id, CAST(d.n AS INTEGER) AS n_bytes,
       |  CAST(COALESCE(SUM(CASE WHEN c > 0
       |    THEN (CAST(1 AS BIGINT) << (k - 1)) ELSE 0 END), 0) AS BIGINT)
       |    AS dhash
       |FROM d LEFT JOIN coef ON coef.doc_id = d.doc_id
       |GROUP BY d.doc_id, d.n ORDER BY media_id""".stripMargin
  }

  // ---------------------------------------------------------------- m05
  // PERSISTED perceptual-hash signature index + streaming media ingest
  // (the media half of the t44/t47 snapshot-dedup lifecycle): half the
  // corpus builds the index (one decode pass), a quarter streams in per
  // micro-batch (Streams.phashIngest — bytes hash ONCE, on arrival; the
  // index holds 8-byte signatures, never pixels), probes then dedup new
  // batches against the accumulated store (probe pairs are spec-pinned
  // on planted payloads — this corpus has no hamming<=3 media pairs and
  // a 0-row oracle would be vacuous). The ORACLE pins the lifecycle's
  // signature contents: store == batch aHash over exactly the
  // built+ingested docs.
  def m05_phash_index(spark: SparkSession, dir: String): DataFrame = {
    val media = t(spark, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("data"))
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val stage = s"/tmp/graft_stream/$key/documents"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      sources.Store.setSplayed(t(spark, dir, "documents"), stage)
    val base = s"/tmp/graft_stream/$key/" +
      s"phash_idx_s${srcStamp(dir, "documents.parquet")}"
    val idxPath = s"$base/index"
    if (!new java.io.File(s"$base/done").exists()) {
      operators.Dedup.buildSigIndex(
        operators.Multimodal.perceptualHash(
          media.filter($"doc_id" % 4 < 2), "doc_id", "data")
          .select($"media_id".as("id"), $"phash".as("sh")),
        kind = "phash62", idxPath)
      streaming.Streams.phashIngest(spark, stage,
        t(spark, dir, "documents"), "doc_id", "text",
        idxPath, checkpoint = s"$base/ckpt",
        where = Some("doc_id % 4 = 2"))
      new java.io.File(s"$base/done").createNewFile()
    }
    spark.read.parquet(s"$idxPath/chunks")
      .select($"id".as("media_id"), $"sh".as("phash")).distinct()
      .orderBy($"media_id")
  }

  // the oracle replays the signatures of exactly the built+ingested docs
  private lazy val m05_sql = phashSql("doc_id % 4 <> 3", withBytes = false)

  // ---------------------------------------------------------------- q28
  // bin (vectorized binary search: greatest threshold ≤ x, reference
  // /root/reference/core/items.c:1552) — expressed as an as-of join
  // against the sorted break table.
  def q28_bin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val breaks = (0L to 500000L by 25000L).toDF("thr")
      .withColumn("bin_idx", (($"thr") / 25000).cast("long"))
    val orders = t(spark, dir, "orders")
      .select($"o_orderkey", $"o_totalprice", lit(1).as("k"),
        $"o_totalprice".as("price"))
    operators.AsofJoin.asofJoin(orders,
      breaks.withColumn("k", lit(1)).withColumn("price", $"thr".cast("double")),
      keys = Seq("k"), ts = "price")
      .select($"o_orderkey", $"bin_idx", $"thr")
      .orderBy($"o_orderkey")
  }

  private val q28_sql =
    """SELECT o.o_orderkey, b.bin_idx, b.thr
      |FROM orders o
      |ASOF LEFT JOIN (
      |  SELECT thr, thr // 25000 AS bin_idx, CAST(thr AS DOUBLE) AS price
      |  FROM (SELECT unnest(range(0, 500001, 25000)) AS thr)) b
      |  ON o.o_totalprice >= b.price
      |ORDER BY o.o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q29
  // take with negative count = tail (reference take,
  // /root/reference/core/items.c:398): last 5 orders by key.
  def q29_tail(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus")
      .orderBy($"o_orderkey".desc).limit(5)
      .orderBy($"o_orderkey")

  private val q29_sql =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_orderstatus FROM orders
      |  ORDER BY o_orderkey DESC LIMIT 5)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q30
  // union (distinct, reference /root/reference/core/items.c:1022) and
  // sect (intersection, :898) over key vectors.
  def q30_union_sect(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .groupBy($"o_custkey")
      .agg(max($"o_orderpriority" === "1-URGENT").as("has_u"),
           max($"o_orderpriority" === "5-LOW").as("has_l"))
      .agg(count(lit(1)).as("n_union"),
           count(when($"has_u" && $"has_l", 1)).as("n_sect"))

  private val q30_sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_union,
      |  CAST(COUNT(*) FILTER (WHERE has_u AND has_l) AS BIGINT) AS n_sect
      |FROM (
      |  SELECT o_custkey,
      |    BOOL_OR(o_orderpriority = '1-URGENT') AS has_u,
      |    BOOL_OR(o_orderpriority = '5-LOW') AS has_l
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |  GROUP BY o_custkey)""".stripMargin

  // ---------------------------------------------------------------- q31
  // Array ops over the embedding column (reference list ops + fold,
  // SURVEY §2.8/§2.9): size, max, filter-count, L2 norm via fold.
  def q31_arrays(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .select($"vec_id",
        size($"e").cast("long").as("dim"),
        round(array_max($"e"), 6).as("maxv"),
        size(filter($"e", x => x > 0)).cast("long").as("n_pos"),
        round(sqrt(aggregate($"e", lit(0.0), (a, x) => a + x * x)), 6).as("l2"))
      .orderBy($"vec_id")

  private val q31_sql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings)
      |SELECT vec_id,
      |  CAST(len(e) AS BIGINT) AS dim,
      |  ROUND(list_max(e), 6) AS maxv,
      |  CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_pos,
      |  ROUND(sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')), 6) AS l2
      |FROM v ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q32
  // apply / map-left (zip two sequences element-wise, reference
  // /root/reference/core/iter.c:585-837): dot of the embedding with its
  // own reversal.
  def q32_zip_apply(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .select($"vec_id",
        round(aggregate(zip_with($"e", reverse($"e"), (x, y) => x * y),
          lit(0.0), (a, x) => a + x), 6).as("dot_rev"))
      .orderBy($"vec_id")

  private val q32_sql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings)
      |SELECT vec_id,
      |  ROUND(list_sum(list_transform(range(1, len(e) + 1),
      |    i -> e[i] * e[len(e) + 1 - i])), 6) AS dot_rev
      |FROM v ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q33
  // rollup (beyond the reference — Spark/SQL native): subtotals and a
  // grand total over the pricing groups.
  def q33_rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce($"l_returnflag", lit("(all)")).as("flag"),
        coalesce($"l_linestatus", lit("(all)")).as("status"),
        $"sum_qty", $"n")
      .orderBy($"flag", $"status")

  private val q33_sql =
    """SELECT COALESCE(l_returnflag, '(all)') AS flag,
      |  COALESCE(l_linestatus, '(all)') AS status,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin

  // ---------------------------------------------------------------- q34
  // Sessionization: per-user sessions split on >30min gaps (lag +
  // running sum of break flags — the scan-based time-series pattern the
  // reference builds from scan/xbar, SURVEY §2.9/§2.10).
  def q34_sessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000 * 1000
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"))
      .withColumn("brk",
        when(($"ts_us" - lag($"ts_us", 1).over(byUser)) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum($"brk").over(cum))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts_us").as("start_us"), max($"ts_us").as("end_us"))
      .orderBy($"user_id", $"sess_id")
  }

  private val q34_sql =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000
      |    THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sessioned AS (
      |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS sess_id
      |  FROM flagged)
      |SELECT user_id, sess_id, COUNT(*) AS n_events,
      |  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
      |FROM sessioned GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_id""".stripMargin

  // ---------------------------------------------------------------- q35
  // High-cardinality multi-key group-by (the H2O group-by Q7 shape —
  // the reference's slowest benchmark query, BASELINE.md): 4 grouping
  // keys, partial+final hash aggregation, single shuffle.
  def q35_groupby_wide(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      // group on the INT month key (year*100+month) and render the
      // "yyyy-MM" string once per GROUP after the agg, not once per row
      // — at 200k groups over 600k rows that's 3× fewer string builds,
      // and the narrow int key hashes/compares cheaper in the partial
      // agg. Lexicographic "yyyy-MM" order == numeric ym order, so the
      // ORDER BY is unchanged.
      .groupBy($"l_returnflag", $"l_linestatus", $"l_suppkey",
        (year($"l_shipdate") * 100 + month($"l_shipdate")).as("__ym"))
      .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select($"l_returnflag", $"l_linestatus", $"l_suppkey",
        concat(expr("__ym div 100").cast("string"), lit("-"),
          lpad(($"__ym" % 100).cast("string"), 2, "0")).as("ship_month"),
        $"sum_qty", $"n")
      .orderBy($"l_returnflag", $"l_linestatus", $"l_suppkey", $"ship_month")

  private val q35_sql =
    """SELECT l_returnflag, l_linestatus, l_suppkey,
      |  strftime(l_shipdate, '%Y-%m') AS ship_month,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus, l_suppkey, ship_month
      |ORDER BY l_returnflag, l_linestatus, l_suppkey, ship_month""".stripMargin

  // ---------------------------------------------------------------- q36
  // Large⋈large equi-join (the H2O join shape, BASELINE.md inner-join):
  // both sides over the broadcast threshold → shuffled join on the key.
  // Round-9 100× audit (graft.TimeJoin A/B at 60M⋈15M): the SHUFFLED
  // HASH join is the stable winner (4.5 s vs sort-merge's 4.6-24 s —
  // SMJ pays two 15M-row sorts and spills erratically), and
  // pre-aggregating lineitem by orderkey before the join LOSES: the 15M-
  // key partial agg hash map costs more than the ~4× row fold saves.
  // The hint pins SHJ per-query (the reference's ij is a hash join too,
  // core/join.c) without flipping preferSortMergeJoin session-wide.
  def q36_join_big(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders").hint("shuffle_hash"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        dsum($"l_extendedprice").as("sum_price"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"o_orderpriority")

  private val q36_sql =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- r01
  // Rayfall front-end: the reference's own query language, parsed and
  // compiled onto the Tbl facade → the same Catalyst plan as q01.
  def r01_rayfall_select(spark: SparkSession, dir: String): DataFrame =
    rayfall.Rayfall.query(
      """(select {sum_qty: (sum l_quantity)
        |         n: (count l_quantity)
        |         avg_disc: (avg l_discount)
        |         from: lineitem
        |         where: (> l_quantity 10)
        |         by: l_returnflag})""".stripMargin,
      Map("lineitem" -> t(spark, dir, "lineitem")))
      .select($"l_returnflag", round($"sum_qty", 2).as("sum_qty"), $"n",
        round($"avg_disc", 4).as("avg_disc"))
      .orderBy($"l_returnflag")

  private val r01_sql =
    """SELECT l_returnflag, ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  COUNT(l_quantity) AS n, ROUND(AVG(l_discount), 4) AS avg_disc
      |FROM lineitem WHERE l_quantity > 10
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- r02
  // Rayfall scalar library: Euclidean division, xbar bucketing, within,
  // glob like — all through the parser.
  def r02_rayfall_scalars(spark: SparkSession, dir: String): DataFrame =
    rayfall.Rayfall.query(
      """(select {o_orderkey: o_orderkey
        |         halfkey: (/ o_orderkey 2)
        |         bucket: (xbar o_orderkey 1000)
        |         midprice: (within o_totalprice [50000.0 150000.0])
        |         urgent: (like o_orderpriority "1*")
        |         from: orders})""".stripMargin,
      Map("orders" -> t(spark, dir, "orders")))
      .orderBy($"o_orderkey")

  private val r02_sql =
    """SELECT o_orderkey,
      |  CAST(FLOOR(CAST(o_orderkey AS DOUBLE) / 2) AS BIGINT) AS halfkey,
      |  o_orderkey - o_orderkey % 1000 AS bucket,
      |  o_totalprice BETWEEN 50000.0 AND 150000.0 AS midprice,
      |  o_orderpriority LIKE '1%' AS urgent
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q37
  // Word count: raze+map composition (reference flatten/explode surface,
  // SURVEY §2.9 UDTF row) — explode tokens, count, top 20.
  def q37_wordcount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token")
      .limit(20)

  private val q37_sql =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q38
  // find (index of first occurrence, /root/reference/core/items.c:302)
  // + group (value → indices dict, /root/reference/core/compose.c:1071):
  // per event type, the first qualifying event and the group's span.
  def q38_find_group(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter($"value" > 30)
      .groupBy($"event_type")
      .agg(min($"event_id").as("first_match"),
        max($"event_id").as("last_match"),
        count(lit(1)).as("n_indices"))
      .orderBy($"event_type")

  private val q38_sql =
    """SELECT event_type, MIN(event_id) AS first_match,
      |  MAX(event_id) AS last_match, COUNT(*) AS n_indices
      |FROM events WHERE value > 30
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q39
  // Sketch aggregates (beyond the reference — the 100 TB path where
  // exact distinct counts are not affordable). HLL/quantile-sketch
  // results are engine-specific → rows-only driver check; accuracy
  // bounds are asserted in ApproxSpec.
  def q39_approx(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(1000))
          .as("approx_med_price"))
      .orderBy($"l_returnflag")

  // ---------------------------------------------------------------- q64
  // DETERMINISTIC HyperLogLog census — q39's missing half: q39's
  // approx_count_distinct is engine-internal (rows-only check); this
  // sketch's hashing, registers, integer harmonic sum and estimate are
  // all replayable arithmetic, so the WHOLE sketch hash-matches in
  // DuckDB. One narrow hash map over the scan + one (slice, bucket)
  // register aggregate (≤ m rows/slice cross the shuffle — registers,
  // never keys). Raw-regime estimator only (ln is libm-unreplayable;
  // the small-n linear-counting bias is documented on Hll.census).
  def q64_hll(spark: SparkSession, dir: String): DataFrame =
    operators.Hll.census(t(spark, dir, "lineitem"),
      Seq("l_returnflag"), "l_orderkey", logM = 10)
      .orderBy($"l_returnflag")

  private val q64_sql =
    operators.Hll.censusSql("lineitem", "l_returnflag", "l_orderkey", 10)

  // ---------------------------------------------------------------- t53
  // STREAMING HLL ingest (the q64 production twin): a live feed's
  // registers append to the PERSISTED store per micro-batch
  // (Streams.hllIngest — MAX-merge makes at-least-once appends exactly
  // idempotent), the census max-merges at read time. Stream == batch:
  // max over per-batch registers equals registers of the whole feed,
  // so the oracle IS q64's SQL. Parameter-stamped stage dirs.
  private[graft] def hllStreamBase(dir: String, logM: Int): String = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    s"/tmp/graft_stream/$key/hll_m${logM}" +
      s"_s${srcStamp(dir, "lineitem.parquet")}"
  }

  def t53_stream_hll(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val stage = s"/tmp/graft_stream/$key/lineitem"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      sources.Store.setSplayed(li, stage)
    val base = hllStreamBase(dir, 10)
    val store = s"$base/store"
    if (!new java.io.File(s"$base/done").exists()) {
      operators.Hll.buildHllStore(li.limit(0),
        Seq("l_returnflag"), "l_orderkey", logM = 10, store)
      streaming.Streams.hllIngest(spark, stage, li, store,
        checkpoint = s"$base/ckpt")
      new java.io.File(s"$base/done").createNewFile()
    }
    operators.Hll.censusFromStore(spark, store).orderBy($"l_returnflag")
  }

  // t53's oracle IS q64's SQL (stream == batch)
  private lazy val t53_sql = q64_sql

  // ---------------------------------------------------------------- t60
  // Persisted quantile-CENSUS store + streaming ingest — the EXACT
  // mergeable-summary counterpart of t53's HLL store: (slice, value,
  // count) cells merge by SUM, so a rolling corpus keeps cut points
  // exact forever at |slices|·|values| cells of state. At-least-once
  // replays collapse via the batch-stamped distinct-at-read (exact
  // counts can't max-merge). The whole table arrives via the stream,
  // so the oracle IS q65's batch SQL — stream == batch.
  private def censusStreamBase(dir: String): String = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    s"/tmp/graft_stream/$key/qcensus_v1" +
      s"_s${srcStamp(dir, "lineitem.parquet")}"
  }

  def t60_stream_quantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val stage = s"/tmp/graft_stream/$key/lineitem"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      sources.Store.setSplayed(li, stage)
    val base = censusStreamBase(dir)
    val store = s"$base/store"
    if (!new java.io.File(s"$base/done").exists()) {
      operators.Quantiles.buildCensusStore(li.limit(0),
        Seq("l_returnflag"), "l_quantity", store)
      streaming.Streams.censusIngest(spark, stage, li, store,
        checkpoint = s"$base/ckpt")
      new java.io.File(s"$base/done").createNewFile()
    }
    operators.Quantiles.quantilesFromStore(spark, store, Seq(50, 90, 99))
      .orderBy($"l_returnflag")
  }

  // t60's oracle IS q65's SQL (stream == batch)
  private lazy val t60_sql = q65_sql

  // ---------------------------------------------------------------- t61
  // STREAMING raw-HTML extraction — t56 on a live crawl feed: the
  // staged per-doc pages stream through the same stateless codegen
  // chain micro-batch by micro-batch, so the accumulated output equals
  // the batch run row-for-row and the oracle IS t56's SQL. Readers
  // dedupe on doc_id (at-least-once append, the t27 stateless-map
  // convention).
  def t61_stream_html(spark: SparkSession, dir: String): DataFrame = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft_stream/$key/html_v1" +
      s"_s${srcStamp(dir, "documents.parquet")}"
    val staged = t(spark, dir, "documents").select($"doc_id", $"lang",
      operators.Html.stagedHtmlCol($"doc_id", $"lang", $"source", $"text")
        .as("html"))
    if (!new java.io.File(s"$base/feed/_SUCCESS").exists())
      staged.write.mode("overwrite").parquet(s"$base/feed")
    if (!new java.io.File(s"$base/done").exists()) {
      streaming.Streams.htmlCleanStream(spark, s"$base/feed", staged,
        "html", outDir = s"$base/out", checkpoint = s"$base/ckpt")
      new java.io.File(s"$base/done").createNewFile()
    }
    spark.read.parquet(s"$base/out")
      .dropDuplicates("doc_id")
      .select($"doc_id", $"lang", length($"html").as("html_len"),
        $"n_tags", $"n_blocks", $"n_boiler", $"boiler_frac",
        length($"text_out").as("text_len"), $"text_out".as("text"))
      .orderBy($"doc_id")
  }

  // t61's oracle IS t56's SQL (stream == batch)
  private lazy val t61_sql = t56_sql

  // ---------------------------------------------------------------- t54
  // Time-windowed distinct-user census (the monitoring report a live
  // event pipeline reads: distinct users per hour per event type) —
  // the q64 HLL sketch composed with the q09 xbar hour bucket. Small
  // windows sit below the raw-regime floor, so the ESTIMATE is biased
  // there (documented on Hll.census) — but every number is still
  // replayable arithmetic, so the whole card hash-matches; at 100 TB
  // the per-window register rows (≤ m per slice) are what cross the
  // shuffle, never user ids.
  def t54_hll_windows(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val e = t(spark, dir, "events").select($"event_type",
      ((RF.xbar(lit(hourNs), $"ts").cast("decimal(38,0)") / hourNs)
        .cast("long") * 3600).as("hour_epoch"),
      $"user_id")
    operators.Hll.census(e, Seq("event_type", "hour_epoch"), "user_id",
      logM = 8)
      .orderBy($"event_type", $"hour_epoch")
  }

  private val t54_sql = operators.Hll.censusSqlFrom(
    """(SELECT event_type,
      |   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |   user_id FROM events)""".stripMargin,
    Seq("event_type", "hour_epoch"), "user_id", logM = 8)

  // ---------------------------------------------------------------- q65
  // EXACT quantiles via value census — no global sort, no per-group
  // row buffering (q17's `median` sorts every row of a group; here
  // only (slice, value, count) census cells cross the shuffle — at
  // 100 TB that's |slices|·|distinct values| cells regardless of row
  // count). percentile_disc lower-bound semantics with cross-
  // multiplied integer thresholds; the reported cut points are census
  // KEYS, not computed floats — exact on any engine.
  def q65_quantile_census(spark: SparkSession, dir: String): DataFrame =
    operators.Quantiles.quantileCensus(t(spark, dir, "lineitem"),
      Seq("l_returnflag"), "l_quantity", Seq(50, 90, 99))
      .orderBy($"l_returnflag")

  private val q65_sql = operators.Quantiles.quantileCensusSql(
    "lineitem", Seq("l_returnflag"), "l_quantity", Seq(50, 90, 99))

  // ---------------------------------------------------------------- q66
  // Semi-structured JSON property extraction (events.props is a JSON
  // blob — the clickstream/telemetry shape): per event type, integer
  // aggregates over the extracted field. The parse is a narrow map
  // over the scan (get_json_object; missing/malformed rows yield NULL
  // and are filtered, spec-pinned) — one agg shuffle after, nothing
  // else. Integer sums only, so the card hash-matches without any
  // decimal routing.
  def q66_json_extract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .filter($"k".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        max($"k").as("max_k"),
        count(when($"k" >= 50, 1)).as("n_hi"))
      .orderBy($"event_type")

  private val q66_sql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k,
      |  CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
      |FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k
      |      FROM events)
      |WHERE k IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q67
  // Hourly retention cohorts (the product-analytics card): of the
  // users active in hour h, how many are also active in hour h+1.
  // Scale shape: ONE distinct (user, hour) census (bounded by
  // users×hours, not events), then NO join at all — "active in h+1"
  // is `lead(h)` over the per-user hour order, so retention is a
  // per-user window (one exchange on user_id) followed by the final
  // per-hour count. Event rows never join, census rows never self-join.
  def q67_retention(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val c = t(spark, dir, "events")
      .select($"user_id",
        (RF.xbar(lit(hourNs), $"ts").cast("decimal(38,0)") / hourNs)
          .cast("long").as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"h")
    c.withColumn("ret",
        when(lead($"h", 1).over(w) === $"h" + 1, 1L).otherwise(0L))
      .groupBy($"h")
      .agg(count(lit(1)).as("n_active"), sum($"ret").as("n_retained"))
      .select(($"h" * 3600).as("hour_epoch"), $"n_active", $"n_retained")
      .orderBy($"hour_epoch")
  }

  private val q67_sql =
    """WITH c AS (
      |  SELECT DISTINCT user_id,
      |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h
      |  FROM events),
      |act AS (SELECT h, COUNT(*) AS n_active FROM c GROUP BY h),
      |ret AS (
      |  SELECT a.h, COUNT(*) AS n_retained
      |  FROM c a JOIN c b ON a.user_id = b.user_id AND b.h = a.h + 1
      |  GROUP BY a.h)
      |SELECT act.h * 3600 AS hour_epoch, act.n_active,
      |  COALESCE(ret.n_retained, 0) AS n_retained
      |FROM act LEFT JOIN ret ON ret.h = act.h
      |ORDER BY hour_epoch""".stripMargin

  // ---------------------------------------------------------------- q68
  // DETERMINISTIC Pearson correlation + population covariance —
  // Spark's corr/covar_pop are streaming-moment DOUBLE aggregates
  // whose value depends on row order (not replayable); here the
  // moments are EXACT integers (quantity is integral, price scales by
  // 100 → y100; per-row products fit i64, ALL product sums ride
  // DECIMAL(38,0) ↔ DuckDB HUGEINT — i64 sums would ANSI-abort at
  // large SF), and the final scalar chain (cast-to-double,
  // sqrt, divide — each correctly rounded from exact inputs) is
  // identical both engines, so the statistics hash-match. One agg
  // shuffle of 6 integer moments per slice.
  def q68_corr(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir, "lineitem").select($"l_returnflag",
      $"l_quantity".cast("long").as("x"),
      round($"l_extendedprice" * 100).cast("long").as("y"))
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val a = m.groupBy($"l_returnflag").agg(
      count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
      sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
      sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"),
      sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"))
    val num = d($"n") * d($"sxy") - d($"sx") * d($"sy")
    val vx = d($"n") * d($"sxx") - d($"sx") * d($"sx")
    val vy = d($"n") * $"syy" - d($"sy") * d($"sy")
    a.select($"l_returnflag", $"n",
        RF.roundBin(num.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))), 6)
          .as("corr_qty_price"),
        RF.roundBin(num.cast("double") / ($"n" * $"n").cast("double")
          / 100.0, 4).as("covar_pop_qty_price"))
      .orderBy($"l_returnflag")
  }

  private val q68_sql =
    """WITH m AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |a AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM m GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  floor(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
      |    * 1000000 + 0.5) / 1000000 AS corr_qty_price,
      |  floor(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * n AS DOUBLE) / 100.0
      |    * 10000 + 0.5) / 10000 AS covar_pop_qty_price
      |FROM a ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q69
  // Rank-family windows WITH TIES: dense_rank / percent_rank /
  // cume_dist ordered by quantity alone (50 distinct values → real
  // peer groups). These depend only on the ORDER BY key values, never
  // on row order within a peer group, so they're deterministic without
  // a tie-break; percent_rank = (rank−1)/(n−1) and cume_dist = peers/n
  // divide the same integers on both engines → bit-identical doubles,
  // no rounding needed. Output sampled AFTER the window (the window
  // must see the full partition).
  def q69_rank_family(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"l_returnflag").orderBy($"l_quantity")
    t(spark, dir, "lineitem")
      .select($"l_returnflag", $"l_quantity", $"l_orderkey",
        $"l_linenumber",
        dense_rank().over(w).as("drank"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
      .filter($"l_orderkey" % 499 === 0)
      .orderBy($"l_returnflag", $"l_quantity", $"l_orderkey",
        $"l_linenumber")
  }

  private val q69_sql =
    """SELECT * FROM (
      |  SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber,
      |    DENSE_RANK() OVER w AS drank,
      |    PERCENT_RANK() OVER w AS prank,
      |    CUME_DIST() OVER w AS cdist
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity))
      |WHERE l_orderkey % 499 = 0
      |ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q70
  // Per-key exponential moving average (the kdb-family ema, beyond the
  // reference's m-family): a RECURSION over each user's time order
  // that no window frame expresses replayably (the closed form needs
  // pow — not correctly rounded, the t13 ln rule). Engine = the scan
  // shape: one key repartition, in-partition sort, one sequential fold
  // pass (operators/Ema — keys never straddle partitions, so folds run
  // parallel across keys). α = 1/2 as the rational 1/2; the per-step
  // chain is identical to the DuckDB recursive-CTE replay, so the
  // doubles hash-match with NO rounding.
  def q70_ema(spark: SparkSession, dir: String): DataFrame =
    operators.Ema.ema(t(spark, dir, "events"), "user_id", "ts",
        "event_id", "value", aNum = 1, aDen = 2)
      .orderBy($"user_id", $"event_id")

  private val q70_sql =
    """WITH RECURSIVE b AS (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events),
      |rec AS (
      |  SELECT user_id, event_id, rn, value AS ema FROM b WHERE rn = 1
      |  UNION ALL
      |  SELECT b.user_id, b.event_id, b.rn,
      |    (1 * b.value + 1 * rec.ema) / 2
      |  FROM rec JOIN b ON b.user_id = rec.user_id AND b.rn = rec.rn + 1)
      |SELECT user_id, event_id, ema FROM rec
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q71
  // Deterministic exact MODE per slice — Spark's `mode` breaks ties
  // arbitrarily (not replayable); the census form makes the tie-break
  // total: min value among max-count values, via ONE value census
  // (cells cross the shuffle, never rows — the q65 shape) and a
  // min_by/struct argmax. Also reports the count and the number of
  // tied values (the governance detail an "arbitrary mode" hides).
  def q71_mode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_quantity".cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .groupBy($"l_returnflag")
      // (max count, then min value) as ONE integer argmax key — valid
      // because 0 <= v < 64 (the q17 composite-order-key rule)
      .agg(max_by($"v", $"c" * 64 - $"v").as("mode_v"),
        max($"c").as("mode_n"),
        count(lit(1)).as("n_values"))
      .orderBy($"l_returnflag")

  private val q71_sql =
    """WITH c AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v,
      |    COUNT(*) AS c
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag,
      |  arg_max(v, c * 64 - v) AS mode_v,
      |  MAX(c) AS mode_n,
      |  COUNT(*) AS n_values
      |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q72
  // SESSIONIZATION (the event-analytics primitive): per user, a new
  // session starts when the gap to the previous event exceeds 8 h (the
  // median inter-event gap in this corpus is ~7.3 h, so sessions are
  // multi-event and the running-sum logic is actually exercised);
  // session ids are the running count of session starts — two windows
  // sharing ONE user_id exchange (lag + running sum), then the
  // per-session census. Integer ns arithmetic; the oracle replays at µs
  // (ts_ns = µs·1000 exactly, so the gap predicates agree).
  def q72_sessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapNs = 8L * 3600 * 1000 * 1000 * 1000
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    t(spark, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("new_s",
        when(lag($"ts", 1).over(w).isNull ||
          $"ts" - lag($"ts", 1).over(w) > gapNs, 1L).otherwise(0L))
      .withColumn("session_n", sum($"new_s").over(wRun))
      .groupBy($"user_id", $"session_n")
      .agg(count(lit(1)).as("n_events"),
        expr("min(ts) div 1000").as("start_us"),
        expr("max(ts) div 1000").as("end_us"),
        expr("(max(ts) - min(ts)) div 1000").as("dur_us"),
        countDistinct($"event_type").as("n_types"))
      .orderBy($"user_id", $"session_n")
  }

  private val q72_sql =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
      |           FROM events),
      |f AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |                       OR us - lag(us) OVER w > 28800000000
      |                     THEN 1 ELSE 0 END AS new_s
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
      |        ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_n
      |      FROM f)
      |SELECT user_id, CAST(session_n AS BIGINT) AS session_n,
      |  COUNT(*) AS n_events, MIN(us) AS start_us, MAX(us) AS end_us,
      |  MAX(us) - MIN(us) AS dur_us,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
      |FROM s GROUP BY user_id, session_n
      |ORDER BY user_id, session_n""".stripMargin

  // ---------------------------------------------------------------- q73
  // FUNNEL analysis (view → click → purchase): per user the earliest
  // view, the first click strictly after it, the first purchase
  // strictly after that. Three conditional-min aggregations chained
  // through two broadcast-size joins on user_id (the per-user row is
  // 150-ish at any SF slice — each stage's table is |users|, never
  // |events|); stage reached = how deep the chain got. µs output.
  def q73_funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select($"user_id", $"ts", $"event_type")
    val s1 = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val s2 = e.filter($"event_type" === "click").join(s1, "user_id")
      .filter($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val s3 = e.filter($"event_type" === "purchase").join(s2, "user_id")
      .filter($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select($"user_id",
        expr("t1 div 1000").as("t1_us"),
        expr("t2 div 1000").as("t2_us"),
        expr("t3 div 1000").as("t3_us"),
        (lit(1L) + when($"t2".isNotNull, 1L).otherwise(0L) +
          when($"t3".isNotNull, 1L).otherwise(0L)).as("stage"))
      .orderBy($"user_id")
  }

  private val q73_sql =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type
      |           FROM events),
      |s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
      |       WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
      |SELECT s1.user_id, t1 AS t1_us, t2 AS t2_us, t3 AS t3_us,
      |  1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
      |    + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS stage
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q40
  // window-join jtype 0 — the reference's `window-join` proper: the
  // PREVAILING right row (last view at-or-before the window start) plus
  // the rows in (lo, hi] (kdb wj; /root/reference/core/aggr.c:143-151,
  // core/join.c:358). The oracle mirrors the two pair sets: an ASOF
  // join at the window start, UNION ALL the half-open range join.
  def q40_window_join_prev(spark: SparkSession, dir: String): DataFrame = {
    val halfHourNs = 1800L * 1000 * 1000 * 1000
    val e = t(spark, dir, "events")
    val left = e.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts")
    val right = e.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value")
    operators.WindowJoin.windowJoin(left, right,
      leftId = Seq("event_id"), keys = Seq("user_id"), ts = "ts",
      loOffset = lit(-halfHourNs), hiOffset = lit(halfHourNs),
      aggs = Seq(count($"value").as("n_views"),
        round(sum($"value"), 4).as("sum_views")),
      jtype = 0)
      .select($"event_id", $"user_id",
        coalesce($"n_views", lit(0L)).as("n_views"), $"sum_views")
      .orderBy($"event_id")
  }

  private val q40_sql =
    """WITH l AS (SELECT * FROM events WHERE event_type = 'signup'),
      |  r AS (SELECT * FROM events WHERE event_type = 'view'),
      |  pairs AS (
      |    SELECT l.event_id, r.value
      |    FROM l JOIN r ON l.user_id = r.user_id
      |      AND epoch_ns(r.ts) > epoch_ns(l.ts) - 1800000000000
      |      AND epoch_ns(r.ts) <= epoch_ns(l.ts) + 1800000000000
      |    UNION ALL
      |    SELECT lw.event_id, rp.value
      |    FROM (SELECT event_id, user_id,
      |            epoch_ns(ts) - 1800000000000 AS lo FROM l) lw
      |    ASOF JOIN (SELECT user_id, epoch_ns(ts) AS rts, value FROM r) rp
      |      ON lw.user_id = rp.user_id AND lw.lo >= rp.rts)
      |SELECT l.event_id, l.user_id, COUNT(p.value) AS n_views,
      |  ROUND(SUM(p.value), 4) AS sum_views
      |FROM l LEFT JOIN pairs p ON l.event_id = p.event_id
      |GROUP BY l.event_id, l.user_id
      |ORDER BY l.event_id""".stripMargin

  // ---------------------------------------------------------------- r03
  // Rayfall left-join with the reference's override rule: shared
  // non-key column (c_acctbal) takes the right side's value on a match,
  // keeps the left value on a miss.
  def r03_rayfall_join(spark: SparkSession, dir: String): DataFrame = {
    val spend = t(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .groupBy($"o_custkey".as("c_custkey"))
      .agg(dsum($"o_totalprice").as("c_acctbal"))
    rayfall.Rayfall.query("(left-join [c_custkey] customer spend)",
      Map("customer" -> t(spark, dir, "customer"), "spend" -> spend))
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  private val r03_sql =
    """WITH spend AS (
      |  SELECT o_custkey AS c_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS c_acctbal
      |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
      |SELECT c.c_custkey, c.c_name,
      |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
      |       ELSE c.c_acctbal END AS c_acctbal
      |FROM customer c LEFT JOIN spend s ON c.c_custkey = s.c_custkey
      |ORDER BY c.c_custkey""".stripMargin

  // ---------------------------------------------------------------- q41
  // Multi-key as-of join (reference asof-join takes N equi-keys before
  // the time column): match on (user_id, value-band) then greatest ts.
  def q41_asof_multikey(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .withColumn("band", floor($"value" / 10))
    val left = e.filter($"event_type".isin("click", "view"))
    val right = e.filter($"event_type" === "error")
      .select($"user_id", $"band", $"ts", $"value".as("err_value"))
    operators.AsofJoin.asofJoin(left, right, Seq("user_id", "band"), "ts")
      .select($"event_id", $"user_id", $"band", $"err_value")
      .orderBy($"event_id")
  }

  private val q41_sql =
    """WITH e AS (SELECT *, CAST(floor(value / 10) AS BIGINT) AS band FROM events)
      |SELECT l.event_id, l.user_id, l.band, r.value AS err_value
      |FROM (SELECT * FROM e WHERE event_type IN ('click','view')) l
      |ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'error') r
      |  ON l.user_id = r.user_id AND l.band = r.band AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin

  // ---------------------------------------------------------------- q42
  // group → indices (reference group: vector → dict of value→indices,
  // /root/reference/core/compose.c:1071): per event type, the first ten
  // occurrence ids, string-joined for cross-engine hashability.
  def q42_group_indices(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy($"event_type")
      .agg(concat_ws(",",
        slice(sort_array(collect_list($"event_id")), 1, 10)).as("first_ids"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")

  private val q42_sql =
    """SELECT event_type,
      |  array_to_string(list_sort(list(event_id))[1:10], ',') AS first_ids,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q43
  // TPC-H Q3 shape: 3-table join, revenue agg, top-k. Catalyst
  // broadcasts the filtered customer dim; revenue routed through
  // DECIMAL(18,4) so the parallel sum hash-matches.
  def q43_tpch3(spark: SparkSession, dir: String): DataFrame = {
    val rev = ($"l_extendedprice" * (lit(1) - $"l_discount"))
      .cast("decimal(18,4)")
    t(spark, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      .join(t(spark, dir, "orders"), $"c_custkey" === $"o_custkey")
      .join(t(spark, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey")
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  private val q43_sql =
    """SELECT o_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q44
  // TPC-H Q5 shape: 5-table star join — region→nation→customer→orders→
  // lineitem; Catalyst reorders and broadcasts the small dims.
  def q44_tpch5(spark: SparkSession, dir: String): DataFrame = {
    val rev = ($"l_extendedprice" * (lit(1) - $"l_discount"))
      .cast("decimal(18,4)")
    t(spark, dir, "region").filter($"r_name".isin("ASIA", "EUROPE", "AMERICA"))
      .join(t(spark, dir, "nation"), $"n_regionkey" === $"r_regionkey")
      .join(t(spark, dir, "customer"), $"c_nationkey" === $"n_nationkey")
      .join(t(spark, dir, "orders"), $"o_custkey" === $"c_custkey")
      .join(t(spark, dir, "lineitem"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name")
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n"))
      .orderBy($"n_name")
  }

  private val q44_sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE r_name IN ('ASIA','EUROPE','AMERICA')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- s03
  // IVF-indexed approximate top-k: coarse centroids → cell assignment →
  // probe the query's cells only (rows-only; recall asserted in spec).
  def s03_ann_ivf(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(t(spark, dir, "embeddings"),
      "vec_id", "embedding", queryId = 0L, k = 10, nCells = 8, nProbe = 2,
      cents0 = Some(embCentroids(spark, dir)))
      .select($"id".as("vec_id"), $"score")

  /** Fitted centroids for the embeddings table, built once per process
    * per sf dir. Centroids are an index ARTIFACT — s04 persists them to
    * disk; the interactive s03/d14 queries amortize the identical build
    * the same way a deployment would (build batch, query many). The
    * exact-decimal Lloyd fit is deterministic, so cached == fresh. */
  private val centCache = new java.util.concurrent.ConcurrentHashMap[
    String, Array[(Int, Seq[Double])]]()
  private def embCentroids(spark: SparkSession,
                           dir: String): Array[(Int, Seq[Double])] =
    centCache.computeIfAbsent(s"$dir@${srcStamp(dir, "embeddings.parquet")}", _ =>
      Similarity.fitCentroids(t(spark, dir, "embeddings"),
        "vec_id", "embedding", nCells = 8, Similarity.LloydIters))

  /** Anchor-set prototype centroid (label-0 vectors) — a per-corpus
    * model artifact like the Lloyd centroids: deterministic exact mean,
    * so cached == fresh. */
  private val protoCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Double]]()
  private def protoCentroid(spark: SparkSession, dir: String): Seq[Double] =
    protoCache.computeIfAbsent(s"$dir@${srcStamp(dir, "embeddings.parquet")}",
      _ => Similarity.exactMean(
        t(spark, dir, "embeddings").filter($"label" === 0), "embedding"))

  /** Source mtime for index-artifact cache keys: a driver-side testdata
    * regeneration within a long-lived JVM must not reuse stale fits. */
  private def srcStamp(dir: String, file: String): Long = {
    val src = new java.io.File(dir, file)
    if (src.isFile) src.lastModified
    else Option(src.listFiles).map(_.map(_.lastModified).foldLeft(0L)(math.max))
      .getOrElse(0L)
  }

  /** Explicit cosine (dot / norms) — textually the engine's formula so the
    * oracle's assignment argmax sees the same FP ops as NearestCentroid. */
  private def duckCos(a: String, b: String) =
    s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"

  /** One Lloyd iteration in DuckDB: assign to `prev` centroids (argmax
    * cosine, lowest cell on ties — NearestCentroid's rule), then the
    * element-wise mean per cell with coordinate sums in DECIMAL(38,18) —
    * exact, so bit-identical to the Spark build; empty cells keep their
    * previous centroid. Produces CTEs a<n>, m<n>, cent<n>. */
  private def lloydIterSql(prev: String, n: Int): String =
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

  // Self-contained IVF replication: seed centroids = every 16th of the
  // first 128 rows by id, refined by 3 Lloyd iterations (exact decimal
  // means — see lloydIterSql); assignment = argmax cosine (sim DESC,
  // cell ASC); probe = the query's 2 nearest cells; exact rerank within.
  private val s03_sql =
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |    FROM embeddings),
       |  topv AS (SELECT id, v FROM v ORDER BY id LIMIT 128),
       |  num AS (SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM topv),
       |  cent0 AS (SELECT CAST(rn // 16 AS INT) AS cell, v AS cv
       |    FROM num WHERE rn % 16 = 1),
       |${lloydIterSql("cent0", 1)},
       |${lloydIterSql("cent1", 2)},
       |${lloydIterSql("cent2", 3)},
       |  a AS (SELECT id, v, cell FROM (
       |    SELECT v.id, v.v, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.id
       |        ORDER BY ${duckCos("v.v", "c.cv")} DESC, c.cell) AS rk
       |    FROM v CROSS JOIN cent3 c) WHERE rk = 1),
       |  q AS (SELECT v AS qv FROM v WHERE id = 0),
       |  probe AS (SELECT c.cell FROM cent3 c, q
       |    ORDER BY ${duckCos("q.qv", "c.cv")} DESC, c.cell LIMIT 2)
       |SELECT a.id AS vec_id, ROUND(list_cosine_similarity(a.v, q.qv), 6) AS score
       |FROM a, q WHERE a.cell IN (SELECT cell FROM probe) AND a.id <> 0
       |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin

  // s04 searches the PERSISTED index built from the same data with the
  // same nCells/nProbe/k — by construction its answer equals s03's, so
  // the oracle is the same replication.
  private val s04_sql = s03_sql

  // ---------------------------------------------------------------- s11
  // IVF k-NN JOIN: batch retrieval — 20 query vectors, each searching
  // only its 2 nearest cells, per-query top-5 via the map-side
  // WindowGroupLimit (the s06 shape over the s03 index). The oracle
  // replays the Lloyd chain, per-query probe-cell argmax, and the
  // rounded-score rank.
  def s11_ivf_knn_join(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfKnnJoin(t(spark, dir, "embeddings"),
      "vec_id", "embedding", queryIds = (0L until 20L).toSeq,
      k = 5, nProbe = 2, cents = embCentroids(spark, dir))
      .select($"qid", $"rk", $"id".as("vec_id"), $"score")
      .orderBy($"qid", $"rk")

  private val s11_sql =
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |    FROM embeddings),
       |  topv AS (SELECT id, v FROM v ORDER BY id LIMIT 128),
       |  num AS (SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM topv),
       |  cent0 AS (SELECT CAST(rn // 16 AS INT) AS cell, v AS cv
       |    FROM num WHERE rn % 16 = 1),
       |${lloydIterSql("cent0", 1)},
       |${lloydIterSql("cent1", 2)},
       |${lloydIterSql("cent2", 3)},
       |  a AS (SELECT id, v, cell FROM (
       |    SELECT v.id, v.v, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.id
       |        ORDER BY ${duckCos("v.v", "c.cv")} DESC, c.cell) AS rk
       |    FROM v CROSS JOIN cent3 c) WHERE rk = 1),
       |  qs AS (SELECT id AS qid, v AS qv FROM v WHERE id < 20),
       |  probe AS (SELECT qid, cell FROM (
       |    SELECT q.qid, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid
       |        ORDER BY ${duckCos("q.qv", "c.cv")} DESC, c.cell) AS rk
       |    FROM qs q CROSS JOIN cent3 c) WHERE rk <= 2)
       |SELECT qid, rk, vec_id, score FROM (
       |  SELECT q.qid, a.id AS vec_id,
       |    ROUND(list_cosine_similarity(a.v, q.qv), 6) AS score,
       |    ROW_NUMBER() OVER (PARTITION BY q.qid
       |      ORDER BY ROUND(list_cosine_similarity(a.v, q.qv), 6) DESC,
       |               a.id) AS rk
       |  FROM qs q JOIN probe p USING (qid)
       |  JOIN a ON a.cell = p.cell AND a.id <> q.qid)
       |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin

  // ---------------------------------------------------------------- s17
  // Matryoshka prefix-truncated search (MRL serving): cosine over the
  // first 16 of 64 dims → shortlist 32 → exact full-dim rerank →
  // top-10. The zero-transform nested-representation funnel next to JL
  // (random projection) and SQ8/PQ (quantization).
  def s17_mrl_search(spark: SparkSession, dir: String): DataFrame =
    Similarity.mrlTopK(t(spark, dir, "embeddings"), "vec_id", "embedding",
      queryId = 0L, k = 10, dPrefix = 16, shortlist = 32)
      .select($"id".as("vec_id"), $"score")

  private val s17_sql =
    """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
      |    CAST(embedding AS DOUBLE[])[1:16] AS p FROM embeddings),
      |q AS (SELECT v AS qv, p AS qp FROM v WHERE id = 0),
      |short AS (
      |  SELECT id, v.v, q.qv,
      |    ROUND(list_cosine_similarity(v.p, q.qp), 6) AS pscore
      |  FROM v, q WHERE id <> 0
      |  ORDER BY pscore DESC, id LIMIT 32)
      |SELECT id AS vec_id,
      |  ROUND(list_cosine_similarity(v, qv), 6) AS score
      |FROM short ORDER BY score DESC, id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- s16
  // FILTERED vector retrieval (the tenant/category-scoped search every
  // production vector store serves): k-NN among rows sharing the
  // query's label — the equality predicate folds INTO the broadcast
  // join condition, so only qualifying rows are scored/ranked.
  def s16_filtered_knn(spark: SparkSession, dir: String): DataFrame =
    Similarity.filteredKnnJoin(t(spark, dir, "embeddings"),
      "vec_id", "embedding", "label", queryIds = (0L until 10L).toSeq,
      k = 5)
      .select($"qid", $"rk", $"id".as("vec_id"), $"score")
      .orderBy($"qid", $"rk")

  private val s16_sql =
    """SELECT qid, rk, vec_id, score FROM (
      |  SELECT q.vec_id AS qid, v.vec_id,
      |    ROUND(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
      |      CAST(q.embedding AS DOUBLE[])), 6) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY ROUND(list_cosine_similarity(
      |        CAST(v.embedding AS DOUBLE[]),
      |        CAST(q.embedding AS DOUBLE[])), 6) DESC, v.vec_id) AS rk
      |  FROM embeddings v JOIN embeddings q
      |    ON q.vec_id < 10 AND v.vec_id <> q.vec_id
      |   AND v.label = q.label)
      |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin

  // ---------------------------------------------------------------- s12
  // MMR diversified re-ranking (Carbonell & Goldstein 1998) — the
  // post-ANN diversity pass a RAG retriever runs: greedy
  // λ·rel − (1−λ)·max-sim-to-selected over the bounded 32-row
  // relevance shortlist, λ = 7/10 (mmr = the 10-scaled integer-weight
  // form, NULL for the seed rank). Corpus cost = ONE
  // TakeOrderedAndProject scan; diversification touches the shortlist
  // only. The oracle replays the greedy as 7 MATERIALIZED CTE stages
  // (the t46 pattern).
  def s12_mmr_rerank(spark: SparkSession, dir: String): DataFrame =
    Similarity.mmrRerank(t(spark, dir, "embeddings"),
      "vec_id", "embedding", queryId = 0L, shortlist = 32, k = 8,
      lamNum = 7, lamDen = 10)
      .select($"rank", $"id".as("vec_id"), $"rel", $"mmr")
      .orderBy($"rank")

  private val s12_sql = {
    def stage(i: Int): String = {
      val sims = (0 until i).map(j =>
        s"ROUND(list_cosine_similarity(sl.emb, (SELECT emb FROM c$j)), 6)")
      val m = if (i == 1) sims.head
              else s"greatest(${sims.mkString(",\n      ")})"
      val excl = (0 until i).map(j =>
        s"sl.vec_id <> (SELECT vec_id FROM c$j)").mkString("\n    AND ")
      s"""c$i AS MATERIALIZED (SELECT vec_id, emb, rel,
         |    7 * rel - 3 * $m AS mmr
         |  FROM sl WHERE $excl
         |  ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
    }
    val ranks = (1 until 8).map(i =>
      s"UNION ALL SELECT $i, vec_id, rel, mmr FROM c$i").mkString("\n  ")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |    FROM embeddings),
       |q AS (SELECT emb AS qv FROM v WHERE vec_id = 0),
       |sl AS MATERIALIZED (
       |  SELECT v.vec_id, v.emb,
       |    ROUND(list_cosine_similarity(v.emb, q.qv), 6) AS rel
       |  FROM v, q WHERE v.vec_id <> 0
       |  ORDER BY rel DESC, v.vec_id LIMIT 32),
       |c0 AS MATERIALIZED (SELECT vec_id, emb, rel,
       |    CAST(NULL AS DOUBLE) AS mmr
       |  FROM sl ORDER BY rel DESC, vec_id LIMIT 1),
       |${(1 until 8).map(stage).mkString(",\n")}
       |SELECT * FROM (
       |  SELECT 0 AS rank, vec_id, rel, mmr FROM c0
       |  $ranks
       |) ORDER BY rank""".stripMargin
  }

  // ---------------------------------------------------------------- s13
  // Johnson–Lindenstrauss projected search (Achlioptas ±1): 64 → 16
  // dims via deterministic Rademacher signs (no stored matrix — the
  // "matrix" is integer hash arithmetic both engines evaluate
  // identically), then exact top-k cosine in the projected space. The
  // projection is ONE narrow codegen map; the oracle unrolls the same
  // left-assoc ± chains term by term (signs folded at SQL-generation
  // time), so projected vectors are bit-identical cross-engine.
  def s13_jl_search(spark: SparkSession, dir: String): DataFrame =
    Similarity.jlTopK(t(spark, dir, "embeddings"),
      "vec_id", "embedding", queryId = 0L, k = 10, dOut = 16)
      .select($"id".as("vec_id"), $"score")

  private val s13_sql = {
    import graft.functions.JlExpr.projectionSql
    val dims = (0 until 16).map(j =>
      projectionSql("emb", 64, j)).mkString("[\n    ", ",\n    ", "]")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |    FROM embeddings),
       |p AS (SELECT vec_id, $dims AS pv FROM v),
       |q AS (SELECT pv AS qv FROM p WHERE vec_id = 0)
       |SELECT p.vec_id,
       |  ROUND(list_cosine_similarity(p.pv, q.qv), 6) AS score
       |FROM p, q WHERE p.vec_id <> 0
       |ORDER BY score DESC, p.vec_id LIMIT 10""".stripMargin
  }

  // ---------------------------------------------------------------- s14
  // Graph ANN (operators/GraphAnn): deterministic NN-descent k-NN graph
  // + batched beam search. The oracle replays the WHOLE construction
  // AND traversal as CTE stages (hash bucket seeding → 2 NN-descent
  // rounds → 3 beam hops), so the REAL approximate path is hash-green —
  // the s11 nProbe=nCells precedent taken one step further. Params are
  // production-shaped (beam 12 ≪ n), not degenerate-exact.
  /** The s14 graph index, staged per corpus stamp (the s04
    * _SUCCESS-guard pattern) and its kernel payload memoized per
    * session (the bpeWordFreq rule — searches never re-pay the
    * collect). Kernel ≡ stage form bit-for-bit, GraphAnnSpec-pinned. */
  private val graphKernelMemo =
    new SessionMemo[operators.GraphAnn.KernelIndex](
      (spark, dir) => {
        val path =
          s"/tmp/graft_s14_graph/${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
            s"_${srcStamp(dir, "embeddings.parquet")}"
        if (!new java.io.File(s"$path/edges/_SUCCESS").exists())
          operators.GraphAnn.buildGraphIndex(t(spark, dir, "embeddings"),
            "vec_id", "embedding", k = 6, nBuckets = 24, iters = 2,
            path = path)
        operators.GraphAnn.kernelIndex(
          spark.read.parquet(s"$path/edges").distinct(),
          spark.read.parquet(s"$path/nodes"), "id", "v")
      }, _ => ())

  def s14_graph_ann(spark: SparkSession, dir: String): DataFrame =
    operators.GraphAnn.searchKernel(spark,
      graphKernelMemo(spark, dir, srcStamp(dir, "embeddings.parquet")),
      queryIds = (0L until 10L).toSeq, k = 5, beamWidth = 12, hops = 3,
      nSeeds = 8)
      .select($"qid", $"rk", $"id".as("vec_id"), $"score")
      .orderBy($"qid", $"rk")

  private val s14_sql =
    s"""WITH v AS MATERIALIZED (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |${operators.GraphAnn.knnGraphSql(k = 6, nBuckets = 24, iters = 2)},
       |${operators.GraphAnn.searchSql(iters = 2, k = 5, beamWidth = 12,
            hops = 3, nSeeds = 8, queryPred = "id < 10")}"""
      .stripMargin.replace("SELECT qid, rk, id, score FROM (",
        "SELECT qid, rk, id AS vec_id, score FROM (")

  // ---------------------------------------------------------------- s04
  // Persisted IVF index lifecycle: build once (centroids + cell-partitioned
  // inverted lists on disk), then a partition-pruned probe — the scan
  // reads only nProbe/nCells of the corpus (rows-only; scores asserted
  // against brute force in PipelineSpec).
  def s04_ivf_index(spark: SparkSession, dir: String): DataFrame = {
    // v2: round-8 Lloyd centroids — new path so a stale every-16th index
    // staged by an earlier run can't satisfy the _SUCCESS guard
    val path = s"/tmp/graft_ivf_v2/${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (!new java.io.File(s"$path/vectors/_SUCCESS").exists())
      Similarity.buildIvfIndex(t(spark, dir, "embeddings"),
        "vec_id", "embedding", nCells = 8, path)
    val qv = t(spark, dir, "embeddings").filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .collect().head.getSeq[Double](0)
    Similarity.searchIvfIndex(spark, path, qv, k = 10, nProbe = 2,
      excludeId = 0L)
      .select($"id".as("vec_id"), $"score")
  }

  // ---------------------------------------------------------------- s05
  // Scalar int8 quantization of the embedding corpus: per-dimension
  // min-max ranges (pass 1, d-row agg) inlined as literals, then a
  // narrow quantize+reconstruction-error map (pass 2, no shuffle).
  // Codes and errors are chains of correctly-rounded IEEE double ops
  // on exact inputs, so both engines hash-match without rounding.
  /** Per-dimension (min, max) ranges — a quantizer artifact, cached per
    * corpus stamp exactly like the Lloyd centroids (deterministic, so
    * cached == fresh; a deployment fits once and quantizes many). */
  private val rangeCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Double], Array[Double])]()
  private def embRanges(spark: SparkSession,
                        dir: String): (Array[Double], Array[Double]) =
    rangeCache.computeIfAbsent(s"$dir@${srcStamp(dir, "embeddings.parquet")}",
      _ => operators.Quantize.dimensionRanges(
        t(spark, dir, "embeddings"), "embedding"))

  def s05_quantize(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val (mins, maxs) = embRanges(spark, dir)
    operators.Quantize.quantize(emb, "embedding", mins, maxs)
      // CSV, not array<long>: the driver's row sort needs every output
      // column orderable (the d02 flatten convention)
      .select($"vec_id",
        concat_ws(",", $"codes".cast("array<string>")).as("codes_csv"),
        $"max_err")
      .orderBy($"vec_id")
  }

  private val s05_sql =
    """WITH px AS (
      |  SELECT vec_id, i, CAST(e[i] AS DOUBLE) AS x FROM (
      |    SELECT vec_id, embedding AS e,
      |           unnest(generate_series(1, len(embedding))) AS i
      |    FROM embeddings)),
      |st AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM px GROUP BY i),
      |q AS (
      |  SELECT vec_id, px.i, x, mn, mx,
      |    CASE WHEN mx = mn THEN 0
      |         ELSE CAST(floor((x - mn) / (mx - mn) * 255 + 0.5) AS BIGINT)
      |    END AS c
      |  FROM px JOIN st USING (i)),
      |e AS (
      |  SELECT vec_id, i, c,
      |    abs(x - (mn + CAST(c AS DOUBLE) * (mx - mn) / 255)) AS err
      |  FROM q)
      |SELECT vec_id, array_to_string(list(c ORDER BY i), ',') AS codes_csv,
      |  MAX(err) AS max_err
      |FROM e GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- s09
  // SQ8 search: brute-force max-inner-product over the dequantized int8
  // codes (the FAISS SQ8 layout — d bytes/vector scanned, floats
  // untouched after the quantize pass). Reconstructions and dot
  // products are exact IEEE chains on both engines, so the scores
  // hash-match without tolerance.
  def s09_sq8_search(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val (mins, maxs) = embRanges(spark, dir)
    operators.Quantize.sq8TopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, mins, maxs)
      .select($"id".as("vec_id"), $"score")
  }

  private val s09_sql =
    """WITH px AS (
      |  SELECT vec_id, i, CAST(e[i] AS DOUBLE) AS x FROM (
      |    SELECT vec_id, embedding AS e,
      |           unnest(generate_series(1, len(embedding))) AS i
      |    FROM embeddings)),
      |st AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM px GROUP BY i),
      |q AS (
      |  SELECT vec_id, px.i, mn, mx,
      |    CASE WHEN mx = mn THEN 0
      |         ELSE CAST(floor((x - mn) / (mx - mn) * 255 + 0.5) AS BIGINT)
      |    END AS c
      |  FROM px JOIN st USING (i)),
      |deq AS (
      |  SELECT vec_id,
      |    list(mn + CAST(c AS DOUBLE) * (mx - mn) / 255 ORDER BY i) AS dv
      |  FROM q GROUP BY vec_id),
      |qd AS (SELECT dv AS qv FROM deq WHERE vec_id = 0)
      |SELECT d.vec_id, ROUND(list_inner_product(d.dv, qd.qv), 6) AS score
      |FROM deq d CROSS JOIN qd WHERE d.vec_id <> 0
      |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- s07
  // Product quantization (Jégou et al. 2011): the 64-dim corpus encoded
  // as 4 sub-centroid codes (16-dim subspaces, 8 L2 Lloyd centroids
  // each — 64 floats → 4 codes), then ADC-scored against query 0: the
  // approximate distance is 4 table lookups per vector, never a float
  // read. One query oracles the whole chain — per-subspace Lloyd fit,
  // code assignment, and the ADC sum — replayed in DuckDB with the
  // identical IEEE op sequence (unrolled left-associated L2 chains,
  // exact-decimal Lloyd means).
  private val PqM = 4; private val PqKSub = 8; private val PqIters = 2
  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[(Int, Seq[Double])]]]()
  private def pqBooks(spark: SparkSession,
                      dir: String): Array[Array[(Int, Seq[Double])]] =
    pqCache.computeIfAbsent(s"$dir@${srcStamp(dir, "embeddings.parquet")}", _ =>
      operators.Pq.fitCodebooks(t(spark, dir, "embeddings"),
        "vec_id", "embedding", m = PqM, kSub = PqKSub, iters = PqIters))

  def s07_pq_adc(spark: SparkSession, dir: String): DataFrame = {
    val books = pqBooks(spark, dir)
    val enc = operators.Pq.encode(
      t(spark, dir, "embeddings"), "vec_id", "embedding", books)
    val qv = enc.filter($"id" === 0).select($"v")
      .collect().head.getSeq[Double](0)
    enc.select($"id".as("vec_id"),
        concat_ws(",", $"codes".cast("array<string>")).as("codes_csv"),
        round(operators.Pq.adcDistance($"codes", qv, books), 6).as("adc"))
      .orderBy($"vec_id")
  }

  /** Left-associated unrolled squared-L2 chain over dims 1..d — the
    * exact IEEE op order of NearestCentroidL2.dist2's sequential loop
    * (0.0 + t1 == t1 for the non-negative squares). */
  private def pqL2Sql(a: Int => String, b: Int => String, d: Int): String =
    (1 to d).map(i => s"(${a(i)}-${b(i)})*(${a(i)}-${b(i)})").mkString(" + ")

  /** One Lloyd iteration of chain `p`, subspace `s`, in DuckDB: L2
    * assignment against `cent${n-1}$p_$s` (dist ASC, cell ASC —
    * NearestCentroidL2's lowest-index tie rule), then exact
    * DECIMAL(38,18) coordinate means; empty cells keep their previous
    * centroid. */
  private def pqLloydIterSql(p: String, s: Int, n: Int, dsub: Int): String = {
    val dist = pqL2Sql(i => s"vs.v[$i]", i => s"c.cv[$i]", dsub)
    s"""  a$n$p$s AS MATERIALIZED (SELECT id, v, cell FROM (
       |    SELECT vs.id, vs.v, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY vs.id
       |        ORDER BY $dist ASC, c.cell) AS rk
       |    FROM vs$p$s vs CROSS JOIN cent${n - 1}$p$s c) WHERE rk = 1),
       |  m$n$p$s AS MATERIALIZED (SELECT a.cell, p.pos,
       |      CAST(SUM(CAST(a.v[p.pos] AS DECIMAL(38,18))) AS DOUBLE)
       |        / COUNT(*) AS m
       |    FROM a$n$p$s a CROSS JOIN
       |      (SELECT generate_series AS pos FROM generate_series(1, $dsub)) p
       |    GROUP BY a.cell, p.pos),
       |  cent$n$p$s AS MATERIALIZED (SELECT c.cell,
       |      CASE WHEN COUNT(m.m) = 0 THEN first(c.cv)
       |           ELSE list(m.m ORDER BY m.pos) END AS cv
       |    FROM cent${n - 1}$p$s c LEFT JOIN m$n$p$s m ON m.cell = c.cell
       |    GROUP BY c.cell)""".stripMargin
  }

  /** Full per-subspace chain of prefix `p` over source CTE `src` (with
    * row numbering `num`): slice, seeds (every 16th of the first
    * kSub·16 rows by id — centroidRows' rule), `iters` Lloyd rounds,
    * final assignment `asg$p$s` (id, cell). */
  private def pqSubChainSql(p: String, src: String, num: String,
                            s: Int, lo: Int, dsub: Int, iters: Int): String = {
    val seeds =
      s"""  vs$p$s AS MATERIALIZED (SELECT id, v[${lo + 1}:${lo + dsub}] AS v FROM $src),
         |  cent0$p$s AS MATERIALIZED (SELECT CAST(rn // 16 AS INT) AS cell,
         |    v[${lo + 1}:${lo + dsub}] AS cv FROM $num WHERE rn % 16 = 1)""".stripMargin
    val its = (1 to iters).map(n => pqLloydIterSql(p, s, n, dsub))
    val dist = pqL2Sql(i => s"vs.v[$i]", i => s"c.cv[$i]", dsub)
    val asg =
      s"""  asg$p$s AS MATERIALIZED (SELECT id, cell FROM (
         |    SELECT vs.id, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY vs.id
         |        ORDER BY $dist ASC, c.cell) AS rk
         |    FROM vs$p$s vs CROSS JOIN cent$iters$p$s c) WHERE rk = 1)""".stripMargin
    (seeds +: its :+ asg).mkString(",\n")
  }

  private def pqNumSql(num: String, src: String, rows: Int): String =
    s"""  $num AS MATERIALIZED (SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn
       |    FROM (SELECT id, v FROM $src ORDER BY id LIMIT $rows))""".stripMargin

  private val s07_sql = {
    val dsub = 16
    val perSub = (0 until PqM)
      .map(s => pqSubChainSql("_", "v", "num", s, s * dsub, dsub, PqIters))
      .mkString(",\n")
    val codeJoin = (1 until PqM)
      .map(s => s"JOIN asg_$s a$s ON a$s.id = a0.id").mkString(" ")
    val codeCols = (0 until PqM).map(s => s"a$s.cell AS c$s").mkString(", ")
    val csv = (0 until PqM).map(s => s"CAST(k.c$s AS VARCHAR)")
      .mkString(" || ',' || ")
    val adcJoin = (0 until PqM)
      .map(s => s"JOIN cent${PqIters}_$s b$s ON b$s.cell = k.c$s").mkString(" ")
    val adc = (0 until PqM).map { s =>
      val lo = s * dsub
      "(" + pqL2Sql(i => s"q.qv[${lo + i}]", i => s"b$s.cv[$i]", dsub) + ")"
    }.mkString(" + ")
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |    FROM embeddings),
       |${pqNumSql("num", "v", PqKSub * 16)},
       |$perSub,
       |  k AS (SELECT a0.id, $codeCols FROM asg_0 a0 $codeJoin),
       |  q AS (SELECT v AS qv FROM v WHERE id = 0)
       |SELECT k.id AS vec_id, $csv AS codes_csv,
       |  ROUND($adc, 6) AS adc
       |FROM k CROSS JOIN q $adcJoin
       |ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- s10
  // Batched ADC k-NN join: top-5 PQ-approximate neighbors for three
  // query vectors in ONE pass over the codes scan (broadcast distance
  // tables + WindowGroupLimit). Ranked on the RAW ADC chain (bitwise
  // cross-engine), rounded for output.
  private val s10Qids = Seq(0L, 7L, 42L)
  def s10_pq_knn(spark: SparkSession, dir: String): DataFrame =
    operators.Pq.adcKnnJoin(t(spark, dir, "embeddings"),
      "vec_id", "embedding", s10Qids, k = 5, m = PqM, kSub = PqKSub,
      iters = PqIters, books0 = Some(pqBooks(spark, dir)))
      .select($"qid", $"rk", $"id".as("vec_id"),
        round($"adc", 6).as("adc"))
      .orderBy($"qid", $"rk")

  private val s10_sql = {
    val dsub = 16
    val perSub = (0 until PqM)
      .map(s => pqSubChainSql("_", "v", "num", s, s * dsub, dsub, PqIters))
      .mkString(",\n")
    val codeJoin = (1 until PqM)
      .map(s => s"JOIN asg_$s a$s ON a$s.id = a0.id").mkString(" ")
    val codeCols = (0 until PqM).map(s => s"a$s.cell AS c$s").mkString(", ")
    val adcJoin = (0 until PqM)
      .map(s => s"JOIN cent${PqIters}_$s b$s ON b$s.cell = k.c$s").mkString(" ")
    val adc = (0 until PqM).map { s =>
      val lo = s * dsub
      "(" + pqL2Sql(i => s"q.qv[${lo + i}]", i => s"b$s.cv[$i]", dsub) + ")"
    }.mkString(" + ")
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |    FROM embeddings),
       |${pqNumSql("num", "v", PqKSub * 16)},
       |$perSub,
       |  k AS (SELECT a0.id, $codeCols FROM asg_0 a0 $codeJoin),
       |  q AS (SELECT id AS qid, v AS qv FROM v
       |    WHERE id IN (${s10Qids.mkString(", ")})),
       |  scored AS (SELECT q.qid, k.id, $adc AS adc
       |    FROM k CROSS JOIN q $adcJoin
       |    WHERE k.id <> q.qid),
       |  ranked AS (SELECT qid, id, adc,
       |      ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY adc ASC, id ASC) AS rk
       |    FROM scored)
       |SELECT qid, rk, id AS vec_id, ROUND(adc, 6) AS adc
       |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin
  }

  // ---------------------------------------------------------------- s08
  // IVFADC (Jégou et al. 2011 §IV — the FAISS `IVF8,PQ4` layout): L2
  // coarse cells, PQ codebooks on the CELL RESIDUALS, search = probe 2
  // cells + ADC over their codes only. The oracle replays the full
  // chain: coarse Lloyd (64-dim unrolled L2), residual construction,
  // per-subspace residual Lloyd, code assignment, per-cell ADC tables.
  private val ivfPqCache = new java.util.concurrent.ConcurrentHashMap[
    String, operators.Pq.IvfPqModel]()
  private def ivfPqModel(spark: SparkSession,
                         dir: String): operators.Pq.IvfPqModel =
    ivfPqCache.computeIfAbsent(s"$dir@${srcStamp(dir, "embeddings.parquet")}",
      _ => operators.Pq.fitIvfPq(t(spark, dir, "embeddings"),
        "vec_id", "embedding", nCells = 8, m = PqM, kSub = PqKSub,
        coarseIters = PqIters, pqIters = PqIters))

  def s08_ivfpq(spark: SparkSession, dir: String): DataFrame =
    operators.Pq.ivfPqTopK(t(spark, dir, "embeddings"),
      "vec_id", "embedding", queryId = 0L, k = 10, nProbe = 2,
      ivfPqModel(spark, dir))
      .select($"id".as("vec_id"), $"adc")

  private val s08_sql = {
    val dsub = 16
    val coarse = pqSubChainSql("c", "v", "num", 0, 0, 64, PqIters)
    val resid =
      s"""  resv AS MATERIALIZED (SELECT a.id, a.cell AS ccell,
         |    list_transform(generate_series(1, 64), i -> vv.v[i] - cc.cv[i]) AS v
         |    FROM asgc0 a JOIN vsc0 vv ON vv.id = a.id
         |    JOIN cent${PqIters}c0 cc ON cc.cell = a.cell)""".stripMargin
    val perSub = (0 until PqM)
      .map(s => pqSubChainSql("r", "resv", "numr", s, s * dsub, dsub, PqIters))
      .mkString(",\n")
    val codeJoin = (1 until PqM)
      .map(s => s"JOIN asgr$s a$s ON a$s.id = a0.id").mkString(" ")
    val codeCols = (0 until PqM).map(s => s"a$s.cell AS c$s").mkString(", ")
    val probeDist = pqL2Sql(i => s"q.qv[$i]", i => s"c.cv[$i]", 64)
    val adcJoin = (0 until PqM)
      .map(s => s"JOIN cent${PqIters}r$s b$s ON b$s.cell = sel.c$s").mkString(" ")
    val adc = (0 until PqM).map { s =>
      val lo = s * dsub
      "(" + pqL2Sql(i => s"(q.qv[${lo + i}]-cc.cv[${lo + i}])",
        i => s"b$s.cv[$i]", dsub) + ")"
    }.mkString(" + ")
    s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |    FROM embeddings),
       |${pqNumSql("num", "v", PqKSub * 16)},
       |$coarse,
       |$resid,
       |${pqNumSql("numr", "resv", PqKSub * 16)},
       |$perSub,
       |  k AS (SELECT a0.id, $codeCols FROM asgr0 a0 $codeJoin),
       |  q AS (SELECT v AS qv FROM v WHERE id = 0),
       |  probe AS (SELECT c.cell FROM cent${PqIters}c0 c CROSS JOIN q
       |    ORDER BY $probeDist ASC, c.cell LIMIT 2),
       |  sel AS (SELECT k.id, k.c0, k.c1, k.c2, k.c3, a.cell AS ccell
       |    FROM k JOIN asgc0 a ON a.id = k.id
       |    WHERE a.cell IN (SELECT cell FROM probe) AND k.id <> 0)
       |SELECT sel.id AS vec_id, ROUND($adc, 6) AS adc
       |FROM sel CROSS JOIN q
       |JOIN cent${PqIters}c0 cc ON cc.cell = sel.ccell
       |$adcJoin
       |ORDER BY adc, vec_id LIMIT 10""".stripMargin
  }

  // ---------------------------------------------------------------- s06
  // k-NN join: exact top-3 cosine neighbors for a 10-vector query set in
  // one pass (batch retrieval / hard-negative mining). Query side
  // broadcasts; WindowGroupLimit caps the qid shuffle at tasks×Q×k rows.
  def s06_knn_join(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnJoin(t(spark, dir, "embeddings"),
      "vec_id", "embedding", queryIds = 0L until 10L, k = 3)
      .select($"qid", $"rk", $"id".as("vec_id"), $"score")
      .orderBy($"qid", $"rk")

  private val s06_sql =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      |    FROM embeddings),
      |q AS (SELECT vec_id AS qid, emb AS qv FROM v WHERE vec_id < 10),
      |s AS (
      |  SELECT q.qid, v.vec_id,
      |    ROUND(list_cosine_similarity(v.emb, q.qv), 6) AS score
      |  FROM v, q WHERE v.vec_id <> q.qid),
      |r AS (
      |  SELECT qid, vec_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY qid
      |      ORDER BY score DESC, vec_id) AS rk
      |  FROM s)
      |SELECT qid, rk, vec_id, score FROM r
      |WHERE rk <= 3 ORDER BY qid, rk""".stripMargin

  // ---------------------------------------------------------------- r04
  // Rayfall as-of join: the reference's (asof-join [keys t] l r) form.
  def r04_rayfall_asof(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val clicks = e.filter($"event_type" === "click")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value".as("purchase_value"))
    rayfall.Rayfall.query("(asof-join [user_id ts] clicks purchases)",
      Map("clicks" -> clicks, "purchases" -> purchases))
      .select($"event_id", $"user_id", $"purchase_value")
      .orderBy($"event_id")
  }

  private val r04_sql =
    """SELECT l.event_id, l.user_id, r.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin

  // ---------------------------------------------------------------- r05
  // Rayfall update: where-gated column rewrite through the parser
  // (reference ray_update, /root/reference/core/update.c). *2 is exact in
  // IEEE double, so both engines hold bit-identical doubles — emit DOUBLE
  // on both sides; a double→DECIMAL cast would reintroduce per-engine
  // rounding at .xx5 binary boundaries (the r2 HASHFAIL).
  def r05_rayfall_update(spark: SparkSession, dir: String): DataFrame =
    rayfall.Rayfall.query(
      """(update {o_totalprice: (* o_totalprice 2)
        |         from: orders
        |         where: (== o_orderpriority "1-URGENT")})""".stripMargin,
      Map("orders" -> t(spark, dir, "orders")))
      .select($"o_orderkey", $"o_totalprice".as("price"))
      .orderBy($"o_orderkey")

  private val r05_sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderpriority = '1-URGENT'
      |    THEN o_totalprice * 2 ELSE o_totalprice END AS price
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- r06
  // Rayfall grouped update: the aggregate evaluates per group over the
  // where-filtered rows and broadcasts back to the matching rows only
  // (reference update with by:, docs/.../queries/update.md).
  def r06_rayfall_group_update(spark: SparkSession, dir: String): DataFrame =
    rayfall.Rayfall.query(
      """(update {o_totalprice: (max o_totalprice)
        |         from: orders
        |         by: o_orderpriority
        |         where: (> o_totalprice 100000.0)})""".stripMargin,
      Map("orders" -> t(spark, dir, "orders")))
      .select($"o_orderkey", $"o_totalprice".as("price"))
      .orderBy($"o_orderkey")

  private val r06_sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 100000.0
      |    THEN MAX(CASE WHEN o_totalprice > 100000.0 THEN o_totalprice END)
      |      OVER (PARTITION BY o_orderpriority)
      |    ELSE o_totalprice END AS price
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- r08
  // Script-surface scan: the Rayfall `(scan + seed v)` cumulative form
  // (reference ray_scan, /root/reference/core/iter.c:1212) over a
  // DETERMINISTICALLY ordered, bounded slice — scan is a driver-value
  // operation (the reference's vectors are in-process), so the input is
  // capped; the distributed cumulative twin is q10.
  def r08_rayfall_scan(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").orderBy($"o_orderkey").limit(20000)
      .select($"o_orderkey", $"o_custkey")
    rayfall.Rayfall.script(spark,
      "(set k (at o 'o_orderkey))" +
        "(set c (scan + 0 (at o 'o_custkey)))" +
        "(table [o_orderkey cum] (list k c))",
      Map("o" -> o))
      .orderBy($"o_orderkey")
  }

  private val r08_sql =
    """WITH s AS (SELECT o_orderkey, o_custkey FROM orders
      |           ORDER BY o_orderkey LIMIT 20000)
      |SELECT o_orderkey,
      |  CAST(SUM(o_custkey) OVER (ORDER BY o_orderkey
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |FROM s ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- r09
  // Script-surface vector ranking: `(rank v)` (stable ascending
  // position, core/order.c:519) and `(xrank v n)` n-tiles
  // (core/order.c:598, bucket = rank*n div len) over part prices; the
  // stable tie rule maps to ROW_NUMBER ordered by (value, position).
  def r09_rayfall_rank(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part").orderBy($"p_partkey")
      .select($"p_partkey", $"p_retailprice")
    rayfall.Rayfall.script(spark,
      "(set k (at p 'p_partkey))" +
        "(set rnk (rank (at p 'p_retailprice)))" +
        "(set tile (xrank (at p 'p_retailprice) 4))" +
        "(table [p_partkey rnk tile] (list k rnk tile))",
      Map("p" -> p))
      .orderBy($"p_partkey")
  }

  private val r09_sql =
    """WITH s AS (SELECT p_partkey, p_retailprice,
      |    ROW_NUMBER() OVER (ORDER BY p_partkey) - 1 AS pos FROM part),
      |  r AS (SELECT p_partkey,
      |    ROW_NUMBER() OVER (ORDER BY p_retailprice, pos) - 1 AS rnk,
      |    COUNT(*) OVER () AS n FROM s)
      |SELECT p_partkey, rnk, (rnk * 4) // n AS tile
      |FROM r ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- r10
  // Script storage closure, oracled end to end: set-parted writes the
  // bare-date parted layout (ONE partitionBy job + renames), get-parted
  // reads it back with the virtual date column, and the aggregate must
  // match DuckDB reading the ORIGINAL parquet. One month keeps the
  // partition count (and the driver-side renames) bounded.
  def r10_rayfall_parted(spark: SparkSession, dir: String): DataFrame = {
    // o_orderdate is TIMESTAMP in this testdata — partition on its DATE
    val slice = t(spark, dir, "orders")
      .filter($"o_orderdate" >= "1995-03-01" && $"o_orderdate" < "1995-04-01")
      .select($"o_orderdate".cast("date").as("date"),
        $"o_orderkey", $"o_totalprice")
    val root = s"/tmp/graft_rfl_parted/${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    // stage once per immutable input dir (the q19-q21/s04 rule): the
    // write path is exercised on the first run and spec-pinned in
    // ValueStoreSpec; the oracle gates the read-back every run
    val marker = new java.io.File(s"$root/.staged")
    val write =
      if (marker.exists) ""
      else s"""(set-parted "$root" 'orders t) """
    val df = rayfall.Rayfall.script(spark,
      write +
        s"""(set p (get-parted "$root" 'orders))
           |(select {n: (count o_orderkey) total: (sum o_totalprice)
           |         from: p by: date})""".stripMargin.replace("\n", " "),
      Map("t" -> slice))
    marker.createNewFile()
    df
      .select($"date", $"n",
        round($"total", 4).as("total"))
      .orderBy($"date")
  }

  private val r10_sql =
    """SELECT CAST(o_orderdate AS DATE) AS date, COUNT(o_orderkey) AS n,
      |  ROUND(SUM(o_totalprice), 4) AS total
      |FROM orders
      |WHERE o_orderdate >= DATE '1995-03-01'
      |  AND o_orderdate < DATE '1995-04-01'
      |GROUP BY 1 ORDER BY date""".stripMargin

  // ---------------------------------------------------------------- r07
  // Rayfall window-join: the reference's 6-ary form with interval
  // offsets and an aggregation dict (examples/wj.rfl) — purchases
  // aggregate clicks within ±1h; exact-i64 ns offsets exercise the
  // parser's long-literal path.
  def r07_rayfall_window_join(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"value")
    rayfall.Rayfall.query(
      "(window-join1 [user_id ts] [-3600000000000 3600000000000] " +
        "purchases clicks {n_clicks: (count value) max_click: (max value)})",
      Map("purchases" -> purchases, "clicks" -> clicks))
      .select($"event_id", $"user_id",
        coalesce($"n_clicks", lit(0L)).as("n_clicks"), $"max_click")
      .orderBy($"event_id")
  }

  private val r07_sql =
    """SELECT l.event_id, l.user_id, COUNT(r.value) AS n_clicks,
      |  MAX(r.value) AS max_click
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      |  ON l.user_id = r.user_id
      |  AND epoch_ns(r.ts) BETWEEN epoch_ns(l.ts) - 3600000000000
      |                         AND epoch_ns(l.ts) + 3600000000000
      |GROUP BY l.event_id, l.user_id
      |ORDER BY l.event_id""".stripMargin

  // ---------------------------------------------------------------- q45
  // scan-right (reference /root/reference/core/iter.c:1212 scan family):
  // running reduce from the END — suffix sums via a current-row-to-
  // unbounded-following frame (mirror of q10's scan-left).
  def q45_scan_right(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    t(spark, dir, "events")
      .select($"event_id", $"user_id",
        round(sum($"value").over(w), 4).as("suffix_value"))
      .orderBy($"event_id")
  }

  private val q45_sql =
    """SELECT event_id, user_id,
      |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 4) AS suffix_value
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q46
  // alter/modify at index positions (reference alter,
  // /root/reference/core/update.c:268: apply set/+ at vector indices) —
  // per-order positions via row_number on a totalized order (the
  // (l_orderkey, l_linenumber) pair is NOT unique; fold in quantity and
  // price to make the position deterministic).
  def q46_alter(spark: SparkSession, dir: String): DataFrame = {
    val pos = row_number().over(Window.partitionBy($"l_orderkey")
      .orderBy($"l_linenumber", $"l_quantity", $"l_extendedprice"))
    t(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        $"l_quantity".cast("long").as("qty"), $"l_extendedprice", pos.as("pos"))
      .select($"l_orderkey", $"l_linenumber",
        // alter set at [0]: overwrite; alter + at [1]: modify in place
        when($"pos" === 1, 0L)
          .when($"pos" === 2, $"qty" + 100L)
          .otherwise($"qty").as("qty"))
      .orderBy($"l_orderkey", $"l_linenumber", $"qty")
  }

  private val q46_sql =
    """WITH p AS (
      |  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber, l_quantity, l_extendedprice) AS pos
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |  CASE WHEN pos = 1 THEN 0
      |       WHEN pos = 2 THEN qty + 100
      |       ELSE qty END AS qty
      |FROM p ORDER BY l_orderkey, l_linenumber, qty""".stripMargin

  // ---------------------------------------------------------------- q47
  // map-left (reference /root/reference/core/iter.c:665: fn of each left
  // element vs the whole right argument): per row, map a fixed vector of
  // multipliers over the row's key — an array-valued column, exact i64.
  // Emitted as a joined string, not an array column: the driver's checker
  // sorts rows by every column before hashing and cannot sort ndarrays.
  def q47_map_left(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select($"o_orderkey",
        array_join(transform(array(lit(1L), lit(2L), lit(3L)),
          e => e * $"o_orderkey"), ",").as("multiples"))
      .orderBy($"o_orderkey")

  private val q47_sql =
    """SELECT o_orderkey,
      |  array_to_string(list_transform([1, 2, 3], e -> e * o_orderkey), ',')
      |    AS multiples
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q48
  // meta (reference table-schema introspection,
  // /root/reference/core/misc.c:245): schema as rows. The oracle pins the
  // exact (position, name, type) triples.
  def q48_meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tbl(t(spark, dir, "lineitem")).meta.zipWithIndex
      .map { case ((n, ty), i) => (i.toLong, n, ty) }
      .toDF("idx", "col_name", "col_type")
      .orderBy($"idx")
  }

  private val q48_sql =
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), 'l_orderkey', 'bigint'),
      |  (1, 'l_partkey', 'bigint'),
      |  (2, 'l_suppkey', 'bigint'),
      |  (3, 'l_linenumber', 'int'),
      |  (4, 'l_quantity', 'double'),
      |  (5, 'l_extendedprice', 'double'),
      |  (6, 'l_discount', 'double'),
      |  (7, 'l_tax', 'double'),
      |  (8, 'l_returnflag', 'string'),
      |  (9, 'l_linestatus', 'string'),
      |  (10, 'l_shipdate', 'timestamp_ntz')) AS m(idx, col_name, col_type)
      |ORDER BY idx""".stripMargin

  // ---------------------------------------------------------------- q49
  // binr (reference /root/reference/core/items.c:1552: FIRST index ≥ x in
  // a sorted vector — bin's mirror). Composed from the as-of join by
  // negating the probe axis: least thr ≥ price ⇔ greatest −thr ≤ −price.
  def q49_binr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val breaks = (0L to 500000L by 25000L).toDF("thr")
      .withColumn("bin_idx", ($"thr" / 25000).cast("long"))
      .withColumn("k", lit(1))
      .withColumn("negp", -$"thr".cast("double"))
    val orders = t(spark, dir, "orders")
      .select($"o_orderkey", lit(1).as("k"),
        (-$"o_totalprice").as("negp"))
    operators.AsofJoin.asofJoin(orders, breaks, keys = Seq("k"), ts = "negp")
      .select($"o_orderkey", $"bin_idx", $"thr")
      .orderBy($"o_orderkey")
  }

  private val q49_sql =
    """SELECT o.o_orderkey, b.bin_idx, b.thr
      |FROM orders o
      |ASOF LEFT JOIN (
      |  SELECT thr, thr // 25000 AS bin_idx, CAST(thr AS DOUBLE) AS price
      |  FROM (SELECT unnest(range(0, 500001, 25000)) AS thr)) b
      |  ON o.o_totalprice <= b.price
      |ORDER BY o.o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q50
  // TIME convention (reference TIME = i32 milliseconds since midnight,
  // /root/reference/core/rayforce.h:58): extract time-of-day millis from
  // the ns event timestamps and xbar-bucket to 15-minute bins.
  def q50_time_millis(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      // `div` = integer division (Column./ would be double division,
      // whose truncation can disagree with the oracle's `//` at the edges)
      .select($"event_id",
        expr("(ts % 86400000000000L) div 1000000L").as("tod_ms"))
      .withColumn("bin15m", RF.xbar(lit(900000L), $"tod_ms"))
      .orderBy($"event_id")

  private val q50_sql =
    """SELECT event_id,
      |  epoch_ns(ts) % 86400000000000 // 1000000 AS tod_ms,
      |  tod_ms - tod_ms % 900000 AS bin15m
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q51
  // Generation: rand / guid (reference /root/reference/core/compose.c:343,
  // :439) — engine-specific randomness, so rows-only: n draws below the
  // bound and n distinct uuids.
  def q51_rand_guid(spark: SparkSession, dir: String): DataFrame =
    spark.range(0, 1000).toDF("i")
      .select($"i", (rand(seed = 42) * 100).cast("long").as("draw"),
        expr("uuid()").as("guid"))
      .filter($"draw" >= 0 && $"draw" < 100)

  // ---------------------------------------------------------------- q52
  // The dense dictionary-encoded group-by kernel (operators.GroupKernel —
  // the H2O sub-second engine) under the DuckDB oracle: lineitem grouped
  // by (returnflag, linestatus) through the Rayfall select path, which
  // routes to the kernel because the table is encoded and the key
  // product is dense. Integer sums/min/max/count only — exact on both
  // engines. Encoded once per (session, dir); reps reuse the blocks.
  private val kernelTables =
    scala.collection.mutable.Map[(SparkSession, String), DataFrame]()

  def q52_kernel_groupby(spark: SparkSession, dir: String): DataFrame = {
    val li = kernelTables.synchronized {
      kernelTables.getOrElseUpdate((spark, dir), {
        val df = t(spark, dir, "lineitem")
          .select($"l_returnflag", $"l_linestatus", $"l_orderkey",
            $"l_linenumber")
        operators.GroupKernel.encode(df,
          Seq("l_returnflag", "l_linestatus"))
        df
      })
    }
    rayfall.Rayfall.query(
      "(select {s: (sum l_linenumber) lo: (min l_orderkey) " +
        "hi: (max l_orderkey) n: (map count l_orderkey) " +
        "from: t by: {l_returnflag: l_returnflag l_linestatus: l_linestatus}})",
      Map("t" -> li))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q52_sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(l_linenumber) AS BIGINT) AS s,
      |  MIN(l_orderkey) AS lo, MAX(l_orderkey) AS hi,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q53
  // Kernel under where: — the reference's canonical select ALWAYS runs
  // its filter fused with the group (core/query.c:311-404); round 8
  // compiles simple predicates to a mask over the encoded blocks so the
  // same query text keeps the dense fast path. Numeric >, string !=,
  // and a string in-list, all fused, under the DuckDB oracle.
  def q53_kernel_where(spark: SparkSession, dir: String): DataFrame = {
    val li = kernelTables.synchronized {
      kernelTables.getOrElseUpdate((spark, dir), {
        val df = t(spark, dir, "lineitem")
          .select($"l_returnflag", $"l_linestatus", $"l_orderkey",
            $"l_linenumber")
        operators.GroupKernel.encode(df,
          Seq("l_returnflag", "l_linestatus"))
        df
      })
    }
    rayfall.Rayfall.query(
      "(select {s: (sum l_linenumber) n: (map count l_orderkey) " +
        "lo: (min l_orderkey) " +
        "from: t where: (and (> l_linenumber 2) (!= l_returnflag \"N\") " +
        "(in l_linestatus [\"F\"])) " +
        "by: {l_returnflag: l_returnflag l_linestatus: l_linestatus}})",
      Map("t" -> li))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q53_sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(l_linenumber) AS BIGINT) AS s,
      |  COUNT(*) AS n, MIN(l_orderkey) AS lo
      |FROM lineitem
      |WHERE l_linenumber > 2 AND l_returnflag <> 'N'
      |  AND l_linestatus IN ('F')
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q54
  // Streaming exact-dedup of the ingest path: dropDuplicates over the
  // event feed (state-store backed — the streaming twin of Dedup.exact
  // on a journal/live table), then a distinct-key census. The batch
  // oracle is COUNT(DISTINCT): the streamed answer must equal it.
  def q54_stream_dedup(spark: SparkSession, dir: String): DataFrame = {
    val batch = t(spark, dir, "events")
    val stage = s"/tmp/graft_stream/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/events"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      Store.setSplayed(batch, stage)
    Streams.dedupCounts(spark, stage, batch,
      keyCols = Seq("user_id", "event_type"), outKey = "event_type",
      queryName = "graft_sdedup_" + math.abs(dir.hashCode))
      .orderBy($"event_type")
  }

  private val q54_sql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q55
  // Stream-static enrichment: the event feed joined per-micro-batch to a
  // broadcast customer→nation dimension, aggregated per nation. The
  // oracle is the equivalent batch star join — the streamed answer must
  // equal it exactly.
  def q55_stream_enrich(spark: SparkSession, dir: String): DataFrame = {
    val batch = t(spark, dir, "events")
    val stage = s"/tmp/graft_stream/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/events"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      Store.setSplayed(batch, stage)
    Streams.enrichedCounts(spark, stage, batch,
      dimOf = ss => Tables.load(ss, dir, "customer")
        .join(Tables.load(ss, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")),
      streamKey = "user_id", dimKey = "c_custkey", outKey = "n_name",
      valueCol = "value",
      queryName = "graft_senrich_" + math.abs(dir.hashCode))
      .select($"n_name", $"n", round($"sum_value", 4).as("sum_value"))
      .orderBy($"n_name")
  }

  private val q55_sql =
    """SELECT n_name, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
      |FROM events e
      |  JOIN customer c ON e.user_id = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ------------------------------------------------------------ registry

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pricing" -> (q01_agg_pricing _),
    "q02_filter_project" -> (q02_filter_project _),
    "q03_join_inner" -> (q03_join_inner _),
    "q04_join_left" -> (q04_join_left _),
    "q05_topk" -> (q05_topk _),
    "q06_distinct" -> (q06_distinct _),
    "q07_predicates" -> (q07_predicates _),
    "q08_euclid" -> (q08_euclid _),
    "q09_xbar_time" -> (q09_xbar_time _),
    "q10_scan_cumsum" -> (q10_scan_cumsum _),
    "q11_asof_join" -> (q11_asof_join _),
    "q12_window_join" -> (q12_window_join _),
    "q13_upsert" -> (q13_upsert _),
    "q14_except" -> (q14_except _),
    "q15_rank" -> (q15_rank _),
    "q16_strings" -> (q16_strings _),
    "q17_agg_stats" -> (q17_agg_stats _),
    "q18_semi_join" -> (q18_semi_join _),
    "t01_tokens" -> (t01_tokens _),
    "t02_quality" -> (t02_quality _),
    "t03_langid" -> (t03_langid _),
    "t04_fingerprint" -> (t04_fingerprint _),
    "t05_redact" -> (t05_redact _),
    "t06_sample_mix" -> (t06_sample_mix _),
    "t07_pack_greedy" -> (t07_pack_greedy _),
    "t08_pack_chunks" -> (t08_pack_chunks _),
    "t09_decontam" -> (t09_decontam _),
    "t10_pipeline_e2e" -> (t10_pipeline_e2e _),
    "t11_repetition" -> (t11_repetition _),
    "t12_mix_targets" -> (t12_mix_targets _),
    "t13_tfidf" -> (t13_tfidf _),
    "t14_top_ngrams" -> (t14_top_ngrams _),
    "t15_split" -> (t15_split _),
    "t16_dup_spans" -> (t16_dup_spans _),
    "t17_source_caps" -> (t17_source_caps _),
    "t18_quality_deciles" -> (t18_quality_deciles _),
    "t19_fuzzy_decontam" -> (t19_fuzzy_decontam _),
    "t20_chunk_overlap" -> (t20_chunk_overlap _),
    "q57_events_range" -> (q57_events_range _),
    "q58_cube" -> (q58_cube _),
    "q59_moving" -> (q59_moving _),
    "q60_range_frame" -> (q60_range_frame _),
    "q61_grouping_sets" -> (q61_grouping_sets _),
    "q62_pivot" -> (q62_pivot _),
    "q63_unpivot" -> (q63_unpivot _),
    "t21_gopher_rules" -> (t21_gopher_rules _),
    "t22_source_overlap" -> (t22_source_overlap _),
    "t23_temperature_mix" -> (t23_temperature_mix _),
    "t24_span_removal" -> (t24_span_removal _),
    "t25_tfidf_pruned" -> (t25_tfidf_pruned _),
    "t26_quality_model" -> (t26_quality_model _),
    "t27_stream_span_clean" -> (t27_stream_span_clean _),
    "t28_bpe_merges" -> (t28_bpe_merges _),
    "t29_bpe_tokens" -> (t29_bpe_tokens _),
    "t30_shard_shuffle" -> (t30_shard_shuffle _),
    "t31_cluster_balance" -> (t31_cluster_balance _),
    "t32_bpe_pack" -> (t32_bpe_pack _),
    "t33_lm_quality" -> (t33_lm_quality _),
    "t34_dsir_select" -> (t34_dsir_select _),
    "t35_stream_lm_quality" -> (t35_stream_lm_quality _),
    "t36_ppl_mix" -> (t36_ppl_mix _),
    "t37_bpe_shards" -> (t37_bpe_shards _),
    "t38_corpus_card" -> (t38_corpus_card _),
    "t39_kn_quality" -> (t39_kn_quality _),
    "t40_kn3_quality" -> (t40_kn3_quality _),
    "t41_stream_dsir" -> (t41_stream_dsir _),
    "t42_lm_quality_hashed" -> (t42_lm_quality_hashed _),
    "t43_bpe_fertility" -> (t43_bpe_fertility _),
    "t44_lsh_index_dedup" -> (t44_lsh_index_dedup _),
    "t45_proto_quality" -> (t45_proto_quality _),
    "t46_kcenter_coreset" -> (t46_kcenter_coreset _),
    "t47_stream_lsh_ingest" -> (t47_stream_lsh_ingest _),
    "t48_epoch_mix" -> (t48_epoch_mix _),
    "t49_unigram_viterbi" -> (t49_unigram_viterbi _),
    "t50_drift_census" -> (t50_drift_census _),
    "t51_bloom_decontam" -> (t51_bloom_decontam _),
    "t52_stream_bloom" -> (t52_stream_bloom _),
    "d01_dedup_exact" -> (d01_dedup_exact _),
    "d02_minhash" -> (d02_minhash _),
    "d03_jaccard_pairs" -> (d03_jaccard_pairs _),
    "d04_simhash" -> (d04_simhash _),
    "d05_embed_neardup" -> (d05_embed_neardup _),
    "d06_lsh_candidates" -> (d06_lsh_candidates _),
    "d07_simhash_neardup" -> (d07_simhash_neardup _),
    "d08_simhash_multiperm" -> (d08_simhash_multiperm _),
    "d09_simhash64" -> (d09_simhash64 _),
    "d10_simhash64_neardup" -> (d10_simhash64_neardup _),
    "d11_dedup_components" -> (d11_dedup_components _),
    "d12_dedup_apply" -> (d12_dedup_apply _),
    "d13_minhash_shingles" -> (d13_minhash_shingles _),
    "d14_semdedup" -> (d14_semdedup _),
    "s01_cosine_topk" -> (s01_cosine_topk _),
    "s02_ann_lsh" -> (s02_ann_lsh _),
    "q19_parted" -> (q19_parted _),
    "q20_csv" -> (q20_csv _),
    "q21_stream_tumbling" -> (q21_stream_tumbling _),
    "q22_temporal" -> (q22_temporal _),
    "q23_casts" -> (q23_casts _),
    "q24_concat_group" -> (q24_concat_group _),
    "q25_til" -> (q25_til _),
    "q26_facade_select" -> (q26_facade_select _),
    "q27_facade_update" -> (q27_facade_update _),
    "m01_media_meta" -> (m01_media_meta _),
    "m02_media_decode" -> (m02_media_decode _),
    "m03_frame_sample" -> (m03_frame_sample _),
    "m04_phash" -> (m04_phash _),
    "m05_phash_index" -> (m05_phash_index _),
    "m06_dct_hash" -> (m06_dct_hash _),
    "q28_bin" -> (q28_bin _),
    "q29_tail" -> (q29_tail _),
    "q30_union_sect" -> (q30_union_sect _),
    "q31_arrays" -> (q31_arrays _),
    "q32_zip_apply" -> (q32_zip_apply _),
    "q33_rollup" -> (q33_rollup _),
    "q34_sessionize" -> (q34_sessionize _),
    "q35_groupby_wide" -> (q35_groupby_wide _),
    "q36_join_big" -> (q36_join_big _),
    "r01_rayfall_select" -> (r01_rayfall_select _),
    "r02_rayfall_scalars" -> (r02_rayfall_scalars _),
    "q37_wordcount" -> (q37_wordcount _),
    "q38_find_group" -> (q38_find_group _),
    "q39_approx" -> (q39_approx _),
    "q40_window_join_prev" -> (q40_window_join_prev _),
    "r03_rayfall_join" -> (r03_rayfall_join _),
    "q41_asof_multikey" -> (q41_asof_multikey _),
    "q42_group_indices" -> (q42_group_indices _),
    "q43_tpch3" -> (q43_tpch3 _),
    "q44_tpch5" -> (q44_tpch5 _),
    "s03_ann_ivf" -> (s03_ann_ivf _),
    "s04_ivf_index" -> (s04_ivf_index _),
    "s05_quantize" -> (s05_quantize _),
    "s06_knn_join" -> (s06_knn_join _),
    "s07_pq_adc" -> (s07_pq_adc _),
    "s08_ivfpq" -> (s08_ivfpq _),
    "s09_sq8_search" -> (s09_sq8_search _),
    "s10_pq_knn" -> (s10_pq_knn _),
    "s11_ivf_knn_join" -> (s11_ivf_knn_join _),
    "s12_mmr_rerank" -> (s12_mmr_rerank _),
    "s13_jl_search" -> (s13_jl_search _),
    "s14_graph_ann" -> (s14_graph_ann _),
    "s15_rrf_hybrid" -> (s15_rrf_hybrid _),
    "s16_filtered_knn" -> (s16_filtered_knn _),
    "s17_mrl_search" -> (s17_mrl_search _),
    "q64_hll" -> (q64_hll _),
    "t53_stream_hll" -> (t53_stream_hll _),
    "t54_hll_windows" -> (t54_hll_windows _),
    "t55_split_leakage" -> (t55_split_leakage _),
    "t56_html_extract" -> (t56_html_extract _),
    "t57_span_removal_full" -> (t57_span_removal_full _),
    "t58_kn4_quality" -> (t58_kn4_quality _),
    "t59_cluster_state" -> (t59_cluster_state _),
    "t60_stream_quantiles" -> (t60_stream_quantiles _),
    "t61_stream_html" -> (t61_stream_html _),
    "t62_bm25" -> (t62_bm25 _),
    "t63_cms" -> (t63_cms _),
    "t64_weighted_sample" -> (t64_weighted_sample _),
    "t65_bpe_bytes" -> (t65_bpe_bytes _),
    "t66_langid_trained" -> (t66_langid_trained _),
    "t67_kn5_quality" -> (t67_kn5_quality _),
    "t68_url_canon" -> (t68_url_canon _),
    "q74_asof_tolerance" -> (q74_asof_tolerance _),
    "q65_quantile_census" -> (q65_quantile_census _),
    "q66_json_extract" -> (q66_json_extract _),
    "q67_retention" -> (q67_retention _),
    "q68_corr" -> (q68_corr _),
    "q69_rank_family" -> (q69_rank_family _),
    "q70_ema" -> (q70_ema _),
    "q71_mode" -> (q71_mode _),
    "q72_sessionize" -> (q72_sessionize _),
    "q73_funnel" -> (q73_funnel _),
    "r04_rayfall_asof" -> (r04_rayfall_asof _),
    "r05_rayfall_update" -> (r05_rayfall_update _),
    "r06_rayfall_group_update" -> (r06_rayfall_group_update _),
    "r07_rayfall_window_join" -> (r07_rayfall_window_join _),
    "r08_rayfall_scan" -> (r08_rayfall_scan _),
    "r09_rayfall_rank" -> (r09_rayfall_rank _),
    "r10_rayfall_parted" -> (r10_rayfall_parted _),
    "q45_scan_right" -> (q45_scan_right _),
    "q46_alter" -> (q46_alter _),
    "q47_map_left" -> (q47_map_left _),
    "q48_meta" -> (q48_meta _),
    "q49_binr" -> (q49_binr _),
    "q50_time_millis" -> (q50_time_millis _),
    "q51_rand_guid" -> (q51_rand_guid _),
    "q52_kernel_groupby" -> (q52_kernel_groupby _),
    "q53_kernel_where" -> (q53_kernel_where _),
    "q54_stream_dedup" -> (q54_stream_dedup _),
    "q55_stream_enrich" -> (q55_stream_enrich _),
    "q56_stream_interval_join" -> (q56_stream_interval_join _),
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_pricing" -> q01_sql,
    "q02_filter_project" -> q02_sql,
    "q03_join_inner" -> q03_sql,
    "q04_join_left" -> q04_sql,
    "q05_topk" -> q05_sql,
    "q06_distinct" -> q06_sql,
    "q07_predicates" -> q07_sql,
    "q08_euclid" -> q08_sql,
    "q09_xbar_time" -> q09_sql,
    "q10_scan_cumsum" -> q10_sql,
    "q11_asof_join" -> q11_sql,
    "q12_window_join" -> q12_sql,
    "q13_upsert" -> q13_sql,
    "q14_except" -> q14_sql,
    "q15_rank" -> q15_sql,
    "q16_strings" -> q16_sql,
    "q17_agg_stats" -> q17_sql,
    "q18_semi_join" -> q18_sql,
    "t01_tokens" -> t01_sql,
    "t02_quality" -> t02_sql,
    "t03_langid" -> t03_sql,
    "t04_fingerprint" -> t04_sql,
    "t05_redact" -> t05_sql,
    "t06_sample_mix" -> t06_sql,
    "t07_pack_greedy" -> t07_sql,
    "t08_pack_chunks" -> t08_sql,
    "t09_decontam" -> t09_sql,
    "t10_pipeline_e2e" -> t10_sql,
    "t11_repetition" -> t11_sql,
    "t12_mix_targets" -> t12_sql,
    "t13_tfidf" -> t13_sql,
    "t14_top_ngrams" -> t14_sql,
    "t15_split" -> t15_sql,
    "t16_dup_spans" -> t16_sql,
    "t17_source_caps" -> t17_sql,
    "t18_quality_deciles" -> t18_sql,
    "t19_fuzzy_decontam" -> t19_sql,
    "t20_chunk_overlap" -> t20_sql,
    "q57_events_range" -> q57_sql,
    "q58_cube" -> q58_sql,
    "q59_moving" -> q59_sql,
    "q60_range_frame" -> q60_sql,
    "q61_grouping_sets" -> q61_sql,
    "q62_pivot" -> q62_sql,
    "q63_unpivot" -> q63_sql,
    "t23_temperature_mix" -> t23_sql,
    "t21_gopher_rules" -> t21_sql,
    "t22_source_overlap" -> t22_sql,
    "t24_span_removal" -> t24_sql,
    "t25_tfidf_pruned" -> t25_sql,
    "t26_quality_model" -> t26_sql,
    // the streamed clean must equal the batch ExactSubstr exactly
    "t27_stream_span_clean" -> t24_sql,
    "t28_bpe_merges" -> t28_sql,
    "t29_bpe_tokens" -> t29_sql,
    "t30_shard_shuffle" -> t30_sql,
    "t31_cluster_balance" -> t31_sql,
    "t32_bpe_pack" -> t32_sql,
    "t33_lm_quality" -> t33_sql,
    "t34_dsir_select" -> t34_sql,
    "t35_stream_lm_quality" -> t33_sql,
    "t36_ppl_mix" -> t36_sql,
    "t37_bpe_shards" -> t37_sql,
    "t38_corpus_card" -> t38_sql,
    "t39_kn_quality" -> t39_sql,
    "t40_kn3_quality" -> t40_sql,
    "t41_stream_dsir" -> t41_sql,
    "t42_lm_quality_hashed" -> t42_sql,
    "t43_bpe_fertility" -> t43_sql,
    "t44_lsh_index_dedup" -> t44_sql,
    "t45_proto_quality" -> t45_sql,
    "t46_kcenter_coreset" -> t46_sql,
    // stream == batch by construction: the oracle IS t44's chain
    "t47_stream_lsh_ingest" -> t44_sql,
    "t48_epoch_mix" -> t48_sql,
    "t49_unigram_viterbi" -> t49_sql,
    "t50_drift_census" -> t50_sql,
    "t51_bloom_decontam" -> t51_sql,
    "t52_stream_bloom" -> t52_sql,
    "d01_dedup_exact" -> d01_sql,
    "d02_minhash" -> d02_sql,
    "d03_jaccard_pairs" -> d03_sql,
    "d04_simhash" -> d04_sql,
    "d05_embed_neardup" -> d05_sql,
    "d13_minhash_shingles" -> d13_sql,
    "d14_semdedup" -> d14_sql,
    "s01_cosine_topk" -> s01_sql,
    "q19_parted" -> q19_sql,
    "q20_csv" -> q20_sql,
    "q21_stream_tumbling" -> q21_sql,
    "q22_temporal" -> q22_sql,
    "q23_casts" -> q23_sql,
    "q24_concat_group" -> q24_sql,
    "q25_til" -> q25_sql,
    "q26_facade_select" -> q26_sql,
    "q27_facade_update" -> q27_sql,
    "m01_media_meta" -> m01_sql,
    "q28_bin" -> q28_sql,
    "q29_tail" -> q29_sql,
    "q30_union_sect" -> q30_sql,
    "q31_arrays" -> q31_sql,
    "q32_zip_apply" -> q32_sql,
    "q33_rollup" -> q33_sql,
    "q34_sessionize" -> q34_sql,
    "q35_groupby_wide" -> q35_sql,
    "q36_join_big" -> q36_sql,
    "r01_rayfall_select" -> r01_sql,
    "r02_rayfall_scalars" -> r02_sql,
    "q37_wordcount" -> q37_sql,
    "q38_find_group" -> q38_sql,
    "q40_window_join_prev" -> q40_sql,
    "r03_rayfall_join" -> r03_sql,
    "q41_asof_multikey" -> q41_sql,
    "q42_group_indices" -> q42_sql,
    "q43_tpch3" -> q43_sql,
    "q44_tpch5" -> q44_sql,
    "r04_rayfall_asof" -> r04_sql,
    "r05_rayfall_update" -> r05_sql,
    "r06_rayfall_group_update" -> r06_sql,
    "r07_rayfall_window_join" -> r07_sql,
    "r08_rayfall_scan" -> r08_sql,
    "r09_rayfall_rank" -> r09_sql,
    "r10_rayfall_parted" -> r10_sql,
    "q45_scan_right" -> q45_sql,
    "q46_alter" -> q46_sql,
    "q47_map_left" -> q47_sql,
    "q48_meta" -> q48_sql,
    "q49_binr" -> q49_sql,
    "q50_time_millis" -> q50_sql,
    "q52_kernel_groupby" -> q52_sql,
    "q53_kernel_where" -> q53_sql,
    "q54_stream_dedup" -> q54_sql,
    "q55_stream_enrich" -> q55_sql,
    "q56_stream_interval_join" -> q56_sql,
    "d06_lsh_candidates" -> d06_sql,
    "d07_simhash_neardup" -> d07_sql,
    "d08_simhash_multiperm" -> d08_sql,
    "d09_simhash64" -> d09_sql,
    "d10_simhash64_neardup" -> d10_sql,
    "d11_dedup_components" -> d11_sql,
    "d12_dedup_apply" -> d12_sql,
    "m02_media_decode" -> m02_sql,
    "m03_frame_sample" -> m03_sql,
    "m04_phash" -> m04_sql,
    "m05_phash_index" -> m05_sql,
    "m06_dct_hash" -> m06_sql,
    "s02_ann_lsh" -> s02_sql,
    "s03_ann_ivf" -> s03_sql,
    "s04_ivf_index" -> s04_sql,
    "s05_quantize" -> s05_sql,
    "s06_knn_join" -> s06_sql,
    "s07_pq_adc" -> s07_sql,
    "s08_ivfpq" -> s08_sql,
    "s09_sq8_search" -> s09_sql,
    "s10_pq_knn" -> s10_sql,
    "s11_ivf_knn_join" -> s11_sql,
    "s12_mmr_rerank" -> s12_sql,
    "s13_jl_search" -> s13_sql,
    "s14_graph_ann" -> s14_sql,
    "s15_rrf_hybrid" -> s15_sql,
    "s16_filtered_knn" -> s16_sql,
    "s17_mrl_search" -> s17_sql,
    "q64_hll" -> q64_sql,
    "t53_stream_hll" -> t53_sql,
    "t54_hll_windows" -> t54_sql,
    "t55_split_leakage" -> t55_sql,
    "t56_html_extract" -> t56_sql,
    "t57_span_removal_full" -> t57_sql,
    "t58_kn4_quality" -> t58_sql,
    "t59_cluster_state" -> t59_sql,
    "t60_stream_quantiles" -> t60_sql,
    "t61_stream_html" -> t61_sql,
    "t62_bm25" -> t62_sql,
    "t63_cms" -> t63_sql,
    "t64_weighted_sample" -> t64_sql,
    "t65_bpe_bytes" -> t65_sql,
    "t66_langid_trained" -> t66_sql,
    "t67_kn5_quality" -> t67_sql,
    "t68_url_canon" -> t68_sql,
    "q74_asof_tolerance" -> q74_sql,
    "q65_quantile_census" -> q65_sql,
    "q66_json_extract" -> q66_sql,
    "q67_retention" -> q67_sql,
    "q68_corr" -> q68_sql,
    "q69_rank_family" -> q69_sql,
    "q70_ema" -> q70_sql,
    "q71_mode" -> q71_sql,
    "q72_sessionize" -> q72_sql,
    "q73_funnel" -> q73_sql,
  )
}
