package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.RF

/** Query-registry chunk 1/5 — core relational/select surface (q01-q18, q74) and the text quality / span-removal / packing stages (t01-t27, t62-t64).
  *
  * The chunks are a LINEAR trait stack mixed into `object Queries`,
  * cut at section boundaries in ORIGINAL SOURCE ORDER: trait
  * linearization then initializes every val exactly as the one big
  * object did, so no forward val reference can change behavior. */
private[graft] trait Queries1Rel extends Queries0Shared {

  import graft.functions.Text
  import graft.operators.{Dedup, Similarity}
  import graft.sources.Store
  import graft.streaming.Streams




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

  private[graft] val q01_sql =
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

  private[graft] val q02_sql =
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

  private[graft] val q03_sql =
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

  private[graft] val q04_sql =
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

  private[graft] val q05_sql =
    """SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
      |FROM orders ORDER BY total DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q06
  // distinct (reference distinct, /root/reference/core/compose.c:839).
  def q06_distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select($"l_returnflag", $"l_linestatus").distinct()
      .orderBy($"l_returnflag", $"l_linestatus")

  private[graft] val q06_sql =
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

  private[graft] val q07_sql =
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

  private[graft] val q08_sql =
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

  private[graft] val q09_sql =
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

  private[graft] val q10_sql =
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

  // ---------------------------------------------------------------- q76
  // FORWARD as-of join (merge_asof direction='forward'): per click, the
  // NEXT purchase by the same user — time-to-conversion, the mirror of
  // q11's prevailing-quote shape. The engine composes the backward
  // as-of on negated i64 timestamps (lossless); DuckDB's ASOF accepts
  // the <= inequality directly.
  def q76_asof_forward(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val clicks = e.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    // tie-total right side: DuckDB's ASOF picks an UNSPECIFIED row
    // among equal (key, ts), so the query pre-folds duplicates to one
    // row per (user_id, ts) — the min_by/max_by rule (CLAUDE.md):
    // make ties total BEFORE the engine-dependent pick can matter
    val purchases = e.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"value").as("purchase_value"))
      .select($"user_id", $"ts", $"purchase_value",
        $"ts".as("purchase_ts"))
    operators.AsofJoin.asofJoinForward(clicks, purchases,
        Seq("user_id"), "ts")
      .select($"event_id", $"user_id", $"purchase_value",
        (expr("purchase_ts div 1000") - expr("ts div 1000")).as("lead_us"))
      .orderBy($"event_id")
  }

  private[graft] val q76_sql =
    """SELECT l.event_id, l.user_id, r.value AS purchase_value,
      |  epoch_us(r.ts) - epoch_us(l.ts) AS lead_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (
      |  SELECT user_id, ts, MAX(value) AS value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) r
      |  ON l.user_id = r.user_id AND l.ts <= r.ts
      |ORDER BY l.event_id""".stripMargin

  private[graft] val q74_sql =
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

  private[graft] val q11_sql =
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

  private[graft] val q12_sql =
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

  private[graft] val q13_sql =
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

  private[graft] val q14_sql =
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

  private[graft] val q15_sql =
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

  private[graft] val q16_sql =
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

  private[graft] val q17_sql =
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

  private[graft] val q18_sql =
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

  // ---------------------------------------------------------------- t01
  // Token counting: whitespace tokens + regex word pieces.
  def t01_tokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select($"doc_id",
        size(Text.tokens($"text")).as("n_ws_tokens"),
        size(Text.alphaTokens($"text")).as("n_alpha_tokens"))
      .orderBy($"doc_id")

  private[graft] val t01_sql =
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

  private[graft] val t02_stop = Text.stopwords.map(s => s"'$s'").mkString(", ")
  // the ONE home of the quality-formula replay (t02/t10/t89 share it —
  // the formula must not drift between oracles)
  private[graft] lazy val qualityPunctSql =
    """CASE WHEN length(text) = 0 THEN 0.0 ELSE
      |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
      |      / length(text) END""".stripMargin
  private[graft] lazy val qualityStopSql =
    s"""CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0 ELSE
       |    CAST(len(list_filter(string_split(text, ' '),
       |      w -> w IN ($t02_stop))) AS DOUBLE)
       |      / len(string_split(text, ' ')) END""".stripMargin
  private[graft] lazy val qualitySql =
    s"""0.4 * least(1.0, CAST(len(string_split(text,' ')) AS DOUBLE)/100)
       |    + 0.3 * (1.0 - $qualityPunctSql)
       |    + 0.3 * (1.0 - $qualityStopSql)""".stripMargin
  // floor(x*1e4 + 0.5)/1e4 instead of ROUND: bit-identical to the Spark
  // side (see RF.roundBin — engines disagree on .xxxx5 shortest-reprs)
  private[graft] val t02_sql =
    s"""SELECT doc_id,
       |  floor(($qualityPunctSql) * 10000 + 0.5) / 10000 AS punct_ratio,
       |  floor(($qualityStopSql) * 10000 + 0.5) / 10000 AS stop_ratio,
       |  floor(($qualitySql) * 10000 + 0.5) / 10000 AS quality
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t03
  // Language ID: marker-word voting, grouped census of predictions.
  def t03_langid(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(graft.functions.LangIdExpr.langId($"text").as("lang_pred"))
      .groupBy($"lang_pred").agg(count(lit(1)).as("n"))
      .orderBy($"lang_pred")

  private[graft] val t03_sql = {
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

  private[graft] val t04_sql =
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
  private[graft] lazy val t05_sql = {
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

  private[graft] val t06_sql =
    """WITH s AS (SELECT *,
      |    (((doc_id % 2147483648) * 2654435761) % 4294967296
      |     + (((doc_id // 2147483648) % 2147483648) * 2246822519) % 4294967296)
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

  private[graft] val t07_sql =
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

  private[graft] val t08_sql =
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

  private[graft] val t09_sql =
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

  private[graft] val t10_sql = {
    val punct = qualityPunctSql
    val stop = qualityStopSql
    val quality = qualitySql
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
       |     + (((f.doc_id // 2147483648) % 2147483648) * 2246822519) % 4294967296)
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

  private[graft] val t11_sql =
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

  private[graft] val t12_sql =
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
      |     + (((d.doc_id // 2147483648) % 2147483648) * 2246822519) % 4294967296)
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

  private[graft] val t13_sql =
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
  private[graft] val t62Terms = Seq("spark", "table", "merge")

  /** Memoized bm25 corpus stats (N, Σdl, max dl) per (session, dir,
    * source stamp) — r19: t62 and s15 each re-paid the full
    * tokenize-scan stats action per call; three scalars of an
    * immutable corpus are a model artifact (the wordFreqMemo
    * discipline), so they ride the one memo home. Scoring still scans
    * the corpus from parquet on every call. */
  private[graft] val bm25StatsMemo =
    new operators.ArtifactMemo.Memo[(Long, Long, Long)](cap = 64)
  private[graft] def bm25Stats(spark: SparkSession,
                               dir: String): (Long, Long, Long) =
    // stampPath (name+size+mtime over every part), not srcStamp (max
    // mtime): the stats must invalidate on ANY corpus rewrite or the
    // memo would serve stale scalars against a fresh scoring scan
    bm25StatsMemo(spark, s"$dir#bm25stats",
      graft.operators.ArtifactMemo.stampPath(s"$dir/documents.parquet"))(
      operators.TfIdf.corpusStats(t(spark, dir, "documents"),
        "doc_id", "text"))

  def t62_bm25(spark: SparkSession, dir: String): DataFrame =
    operators.TfIdf.bm25Search(t(spark, dir, "documents"), "doc_id", "text",
      t62Terms, k = 10, stats = Some(bm25Stats(spark, dir)))

  /** The BM25 CTE chain + final select at `k` — t62's oracle and the
    * keyword side of s15's fusion replay. */
  private[graft] def bm25Sql(k: Int): String = {
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

  private[graft] val t62_sql = bm25Sql(10)

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
      "doc_id", "text", t62Terms, k = 20,
      stats = Some(bm25Stats(spark, dir)))
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

  private[graft] val s15_sql =
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

  private[graft] val t64_sql =
    """WITH h AS (
      |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
      |    CAST((((doc_id % 2147483648) * 2654435761) % 4294967296
      |      + (((doc_id // 2147483648) % 2147483648) * 2246822519) % 4294967296)
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

  /** The t63 CMS replay parameterized on the corpus predicate — ONE
    * home for t63 (the whole corpus) and t102 (the store AFTER a batch
    * retraction: cells are batch-stamped sums, so dropping a batch ≡ a
    * sketch built without it, and the oracle just narrows the corpus). */
  private[graft] def cmsReportSql(where: String): String = {
    def bkt(j: Int) =
      operators.Cms.bucketSql(Text.tokenCodeSql("tok"), j, 16, duck = true)
    val cellsUnion = (0 until 4).map(j =>
      s"SELECT $j AS j, ${bkt(j)} AS b FROM toks").mkString("\n  UNION ALL ")
    val probeUnion = (0 until 4).map(j =>
      s"SELECT tok, $j AS j, ${bkt(j)} AS b FROM probes")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
       |  WHERE $where),
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

  private[graft] val t63_sql = cmsReportSql("TRUE")

  // ---------------------------------------------------------------- t102
  // CMS-store BATCH RETRACTION (the t101 census twin for the frequency
  // sketch): three corpus batches ingest by doc_id residue, batch 2
  // retracts — cells are batch-stamped integer SUMS, so dropping the
  // batch's cells ≡ a sketch that never ingested it. The surviving
  // estimates are probed with the surviving corpus's tokens and must
  // match the from-scratch replay over the two surviving residues
  // (true counts, CMS one-sided overcounts and all).
  def t102_cms_retract(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val store = s"/tmp/graft_t102/$key" +
      s"/s${srcStamp(dir, "documents.parquet")}"
    val marker = new java.io.File(s"$store.retracted.marker")
    if (!marker.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
      operators.Cms.buildCmsStore(docs.filter($"doc_id" % 3 === 0),
        "text", d = 4, w = 16, store)
      operators.Cms.appendToCmsStore(docs.filter($"doc_id" % 3 === 1),
        "text", store, batchId = 1L)
      operators.Cms.appendToCmsStore(docs.filter($"doc_id" % 3 === 2),
        "text", store, batchId = 2L)
      operators.Cms.retractCmsBatch(spark, store, batchId = 2L)
      require(marker.createNewFile(), s"t102: marker create failed")
    }
    val surv = docs.filter($"doc_id" % 3 =!= 2)
    val toks = surv.select(explode(split($"text", " ")).as("tok"))
    val truth = toks.groupBy($"tok").agg(count(lit(1)).as("true_cnt"))
    operators.Cms.estimatesFromStore(spark, store, truth.select($"tok"),
        "tok")
      .join(truth, "tok")
      .select($"tok", $"true_cnt", $"est",
        ($"est" - $"true_cnt").as("overcount"))
      .orderBy($"tok")
  }

  private[graft] lazy val t102_sql = cmsReportSql("doc_id % 3 <> 2")

  // ---------------------------------------------------------------- t25
  // TF-IDF with vocabulary CONTROL (the production form): hapax pruning
  // (df ≥ 2) + a top-50 most-frequent-token cap — the bounded vocab is
  // what makes the broadcast safe at crawl scale. Oracle replays the
  // identical prune + deterministic (df DESC, tok) cap.
  def t25_tfidf_pruned(spark: SparkSession, dir: String): DataFrame =
    operators.TfIdf.topKeywords(t(spark, dir, "documents"), "doc_id", "text",
      3, minDf = 2L, maxVocab = 50)
      .orderBy($"doc_id", $"rnk")

  private[graft] val t25_sql =
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

  // ---------------------------------------------------------------- t79
  // STREAMING quality classification (the t26 production twin, the
  // t35/t41/t78 pattern): the weight vector persists once
  // (QualityClassifier.saveWeights — a plain driver Array like the
  // Bloom bits, so no session-bound Dataset exists anywhere), then the
  // live feed scores per micro-batch in one narrow codegen map. The
  // accumulated output equals the batch run row-for-row — the oracle
  // IS t26's SQL. Parameter-stamped stage, replay appends nothing.
  def t79_stream_quality(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft_stream/$key/quality_v1" +
      s"_s${srcStamp(dir, "documents.parquet")}"
    if (!new java.io.File(s"$base/feed/_SUCCESS").exists())
      docs.select($"doc_id", $"text").write.mode("overwrite")
        .parquet(s"$base/feed")
    if (!new java.io.File(s"$base/weights/_SUCCESS").exists())
      operators.QualityClassifier.saveWeights(spark,
        operators.QualityClassifier.defaultWeights, s"$base/weights")
    if (!new java.io.File(s"$base/done").exists()) {
      streaming.Streams.qualityScoreStream(spark, s"$base/feed",
        docs.select($"doc_id", $"text"), "doc_id", "text",
        s"$base/weights", outDir = s"$base/out",
        checkpoint = s"$base/ckpt")
      new java.io.File(s"$base/done").createNewFile()
    }
    spark.read.parquet(s"$base/out")
      .dropDuplicates("doc_id")
      .select($"doc_id", $"pred", RF.roundBin($"score", 6).as("score"))
      .orderBy($"doc_id")
  }

  // t79's oracle IS t26's SQL (stream == batch)
  private[graft] lazy val t79_sql = t26_sql

  private[graft] val t26_sql = {
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

  private[graft] val t14_sql =
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

  private[graft] val t15_sql =
    """WITH u AS (
      |  SELECT lang, doc_id,
      |    (((doc_id % 2147483648) * 2654435761) % 4294967296
      |     + (((doc_id // 2147483648) % 2147483648) * 2246822519) % 4294967296)
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

  private[graft] val t16_sql =
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
  private[graft] def spanRemoveSql(n: Int, minDocs: Int, within: Boolean): String = {
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

  private[graft] val t24_sql = spanRemoveSql(n = 3, minDocs = 5, within = false)

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

  private[graft] val t57_sql = spanRemoveSql(n = 3, minDocs = 5, within = true)

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
}
