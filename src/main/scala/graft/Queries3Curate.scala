package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.RF

/** Query-registry chunk 3/5 — dedup / decontamination / mixing / coreset curation and similarity blocking (t17-t23, t30-t31, t44-t48, t55, t59, d01-d14, q56-q63, t20).
  *
  * The chunks are a LINEAR trait stack mixed into `object Queries`,
  * cut at section boundaries in ORIGINAL SOURCE ORDER: trait
  * linearization then initializes every val exactly as the one big
  * object did, so no forward val reference can change behavior. */
private[graft] trait Queries3Curate extends Queries2Lm {

  import graft.functions.Text
  import graft.operators.{Dedup, Similarity}
  import graft.sources.Store
  import graft.streaming.Streams

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

  private[graft] val t30_sql =
    """WITH s AS (SELECT doc_id,
      |    (((doc_id % 2147483648) * 2654435761) % 4294967296
      |     + (((doc_id // 2147483648) % 2147483648) * 2246822519) % 4294967296)
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

  private[graft] lazy val t31_sql =
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
       |         + (((id // 2147483648) % 2147483648) * 2246822519) % 4294967296)
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

  private[graft] val t17_sql =
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

  private[graft] val t18_sql = {
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

  private[graft] val t19_sql = {
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
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val stage = s"/tmp/graft_stream/$key/events"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      graft.sources.Store.setSplayed(batch, stage)
    // pair store + checkpoint keyed on the STAGE's content stamp: a
    // restaged feed (new part names the checkpoint's seen-map would
    // re-consume) lands in a fresh base and runs cold
    val base = s"/tmp/graft_stream/$key/sjoin_s${srcStamp(stage, "")}"
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
      queryName = "graft_sjoin_" + math.abs(dir.hashCode),
      outPath = s"$base/out", checkpoint = s"$base/ckpt")
      .select($"c_id", $"p_id", $"c_user".as("user_id"))
      .orderBy($"c_id", $"p_id")
  }

  private[graft] val q56_sql =
    """SELECT a.event_id AS c_id, b.event_id AS p_id, a.user_id
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND a.event_type = 'click' AND b.event_type = 'purchase'
      |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
      |ORDER BY c_id, p_id""".stripMargin

  // ---------------------------------------------------------------- q75
  // q56's BOUNDED-STATE production form end-to-end: the same funnel
  // interval join with per-side watermarks, run over a TIME-ORDERED
  // multi-file feed (stageTimeOrderedFeed) at maxFilesPerTrigger = 1 so
  // the watermark advances across micro-batches and the join state
  // EVICTS mid-run (Streams.lastStateRowsRemoved > 0, WatermarkSpec
  // pins it on this query's own run). Because chunk time-ranges are
  // disjoint ascending, no row is ever late: a click evicted after
  // batch i (watermark > c_ts + 6h) can only have matched purchases
  // with p_ts ≤ c_ts + 6h < watermark, and every later batch's p_ts is
  // ≥ the prior chunk's max ≥ watermark — so no pair is lost and the
  // streamed set equals the batch self-join EXACTLY. The oracle IS
  // q56's SQL: bounded state, same answer.
  def q75_stream_funnel_watermarked(spark: SparkSession,
                                    dir: String): DataFrame = {
    val batch = t(spark, dir, "events")
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    // 4 chunks = 4 micro-batches: enough watermark advancements to
    // evict state twice over, at ~0.6 s state-commit floor per batch
    val nChunks = 4
    // feed + pair store + checkpoint co-locate under one stamped base
    // (the q80 layout): restaging deletes all three together, so the
    // checkpoint can never outlive the feed it indexes
    val base = s"/tmp/graft_stream/$key/funnel_wm_c$nChunks" +
      s"_s${srcStamp(dir, "events.parquet")}"
    val stage = s"$base/feed"
    if (!new java.io.File(s"$stage/_SUCCESS").exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      graft.streaming.Streams.stageTimeOrderedFeed(batch, "ts",
        nChunks, stage)
    }
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
      queryName = "graft_wmjoin_" + math.abs(dir.hashCode),
      outPath = s"$base/out", checkpoint = s"$base/ckpt",
      leftWatermark = Some(("c_ts", "1 second")),
      rightWatermark = Some(("p_ts", "1 second")),
      maxFilesPerTrigger = Some(1))
      .select($"c_id", $"p_id", $"c_user".as("user_id"))
      .orderBy($"c_id", $"p_id")
  }

  // q75's oracle IS q56's SQL (bounded state == batch on an in-order feed)
  private[graft] val q75_sql = q56_sql

  // ---------------------------------------------------------------- q57
  // Time-range scan over events: the predicate lands on the ns-long ts
  // (i.e. on MicrosAsNanos of the physical µs column) and the
  // NanosFilterInference rule adds the exact µs-domain conjunct, so the
  // parquet scan row-group-prunes on min/max — the plan property
  // PlanShapeSpec pins. Jan 10-20 of the generated Jan-2024 window.
  private[graft] val q57LoNs = 1704844800L * 1000000000L // 2024-01-10T00:00Z
  private[graft] val q57HiNs = 1705708800L * 1000000000L // 2024-01-20T00:00Z
  def q57_events_range(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter($"ts" >= q57LoNs && $"ts" < q57HiNs)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"event_type")

  private[graft] val q57_sql =
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

  private[graft] val q58_sql =
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

  private[graft] val q59_sql =
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

  private[graft] val q60_sql =
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
  private[graft] val q62Types = Seq("click", "error", "purchase", "signup", "view")
  def q62_pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy($"user_id")
      .pivot("event_type", q62Types)
      .agg(dsum($"value"))
      .na.fill(0.0, q62Types)
      .orderBy($"user_id")

  private[graft] val q62_sql =
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

  private[graft] val q63_sql = {
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

  private[graft] val q61_sql =
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

  private[graft] val t20_sql =
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

  private[graft] val t21_sql =
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

  private[graft] val t22_sql = {
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

  private[graft] val t23_sql =
    """WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
      |r AS (SELECT source,
      |    sqrt(CAST((SELECT MIN(n) FROM c) AS DOUBLE) / n) AS rate
      |  FROM c),
      |s AS (
      |  SELECT d.source, d.doc_id, r.rate
      |  FROM documents d JOIN r ON d.source = r.source
      |  WHERE (((d.doc_id % 2147483648) * 2654435761) % 4294967296
      |     + (((d.doc_id // 2147483648) % 2147483648) * 2246822519) % 4294967296)
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

  private[graft] val d01_sql =
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

  private[graft] val d02_sql = {
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

  private[graft] val d13_sql = {
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

  private[graft] val d14_sql =
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

  private[graft] val d03_sql =
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

  private[graft] val d04_sql =
    s"""SELECT doc_id, ${Text.duck.simhash16Sql("text")} AS sh
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- d05
  // Embedding near-dup: cosine over label-blocked pairs (IVF-style).
  def d05_embed_neardup(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(t(spark, dir, "embeddings"),
      "vec_id", "embedding", "label", 0.3)
      .orderBy($"id_a", $"id_b")

  private[graft] val d05_sql =
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

  private[graft] val s01_sql =
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

  private[graft] val s02_sql = {
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

  private[graft] val d06_sql = {
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

  /** The t44 LSH-index-dedup replay parameterized on the INDEX-side
    * predicate — ONE home for t44/t47 (build+append = doc_id%4<3) and
    * d17 (the same index AFTER a delete: survivors only — signature
    * rows are per-row pure functions, so delete ≡ rebuild-without-X
    * and the oracle just narrows the predicate). */
  private[graft] def lshIndexDedupSql(idxPred: String): String = {
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
       |idx AS (SELECT * FROM bands WHERE $idxPred),
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

  private[graft] val t44_sql = lshIndexDedupSql("doc_id % 4 < 3")

  // ---------------------------------------------------------------- d17
  // LSH dedup index DELETE lifecycle — the takedown half of t44's
  // build/append/probe (a right-to-be-forgotten request against the
  // signature store must not mean a full rebuild): build on the first
  // half, append the third quarter, DELETE the 8th-residue-{1,2} docs
  // (spanning BOTH the built and the appended halves — a delete that
  // only touched one write path would under-test the rewrite), then
  // probe the last quarter. Signature rows are pure per-row functions,
  // so delete(X) ≡ rebuild-without-X EXACTLY — the oracle just narrows
  // the t44 index predicate to the survivors; a hash match proves the
  // delete removed exactly the requested docs' signatures and no
  // deleted id can ever pair with a probe.
  def d17_lsh_delete(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val path = s"/tmp/graft_lshdel/${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
      s"_${srcStamp(dir, "documents.parquet")}"
    val marker = new java.io.File(s"$path.deleted.marker")
    if (!marker.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      Dedup.buildLshIndex(docs.filter($"doc_id" % 4 < 2), "doc_id", "text",
        numHashes = 16, bands = 2, path)
      Dedup.appendToLshIndex(docs.filter($"doc_id" % 4 === 2), "doc_id",
        "text", path)
      Dedup.deleteFromLshIndex(spark,
        docs.filter($"doc_id" % 4 < 3 && ($"doc_id" % 8).isin(1L, 2L)),
        "doc_id", path)
      require(marker.createNewFile(), s"d17: marker create failed at $path")
    }
    val cands = Dedup.probeLshIndex(docs.filter($"doc_id" % 4 === 3),
      "doc_id", "text", path, maxBucketSize = 100)
      .select($"id_idx".as("id_a"), $"id_new".as("id_b"))
    Dedup.jaccardVerify(cands, docs, "doc_id", "text", threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  private[graft] lazy val d17_sql = lshIndexDedupSql(
    "doc_id % 4 < 3 AND doc_id % 8 NOT IN (1, 2)")

  // ---------------------------------------------------------------- d19
  // STREAMING takedown — d17's delete lifecycle arriving as a LIVE feed
  // (production takedowns are right-to-be-forgotten queues, not
  // maintenance windows): the same index build+append as d17, then the
  // same deletions applied through `Streams.takedownIngest` as TWO
  // maxFilesPerTrigger=1 micro-batches — and batch 1 RE-SHIPS batch 0's
  // ids alongside its own (cross-batch duplicate takedown requests, the
  // redelivery shape), exercising the ensure-absent skip in the
  // oracle-checked path itself. Final index state == the batch delete's
  // (stream == batch), so the oracle IS d17's SQL.
  def d19_takedown_stream(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val path = s"/tmp/graft_tdstream/${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
      s"_${srcStamp(dir, "documents.parquet")}"
    val marker = new java.io.File(s"$path.done.marker")
    if (!marker.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$path.feed"))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$path.ckpt"))
      Dedup.buildLshIndex(docs.filter($"doc_id" % 4 < 2), "doc_id", "text",
        numHashes = 16, bands = 2, path)
      Dedup.appendToLshIndex(docs.filter($"doc_id" % 4 === 2), "doc_id",
        "text", path)
      val indexed = docs.filter($"doc_id" % 4 < 3)
      graft.streaming.Streams.stageFeedChunks(Seq(
        indexed.filter($"doc_id" % 8 === 1).select($"doc_id"),
        // batch 1 re-ships batch 0's ids: already-absent → skipped
        indexed.filter(($"doc_id" % 8).isin(1L, 2L)).select($"doc_id")),
        s"$path.feed")
      graft.streaming.Streams.takedownIngest(spark, s"$path.feed",
        docs.select($"doc_id"), "doc_id", path, s"$path.ckpt")
      require(marker.createNewFile(), s"d19: marker create failed at $path")
    }
    val cands = Dedup.probeLshIndex(docs.filter($"doc_id" % 4 === 3),
      "doc_id", "text", path, maxBucketSize = 100)
      .select($"id_idx".as("id_a"), $"id_new".as("id_b"))
    Dedup.jaccardVerify(cands, docs, "doc_id", "text", threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  // stream == batch: the takedown feed lands exactly where d17's
  // maintenance-window delete does
  private[graft] lazy val d19_sql = d17_sql

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

  private[graft] val t48_sql =
    """WITH tk AS (SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
      |    (((doc_id % 2147483648) * 2654435761) % 4294967296
      |     + (((doc_id // 2147483648) % 2147483648) * 2246822519) % 4294967296)
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

  private[graft] val t45_sql =
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

  private[graft] val t46_sql = {
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

  private[graft] val d07_sql =
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

  private[graft] val d08_sql = {
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

  private[graft] val d09_sql =
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
  private[graft] def simhash64PairsSql: String = {
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

  private[graft] val d10_sql =
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

  private[graft] val t55_sql =
    s"""$simhash64PairsSql,
       |u AS (
       |  SELECT doc_id,
       |    CASE WHEN d < 0.8 THEN 'train' WHEN d < 0.9 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |    (((doc_id % 2147483648) * 2654435761) % 4294967296
       |     + (((doc_id // 2147483648) % 2147483648) * 2246822519) % 4294967296)
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

  /** The ONE simhash near-dup closure replay (sh → OR-blocked edges →
    * recursive min-label walk) shared by the t59/d11/d12/t89 oracles —
    * candidate logic must not drift between them (the qualitySql rule).
    * Emits the WITH RECURSIVE header plus the sh/edges/walk CTEs;
    * callers append their own CTEs/select after a comma. Parameterized
    * on the doc predicate — d18's retraction oracle IS the closure
    * over the SURVIVING docs (restricting sh restricts every edge
    * touching a retracted doc, exactly the retract semantics —
    * including bridge splits). */
  private[graft] def simhashClosureCtesWhere(where: String): String = {
    def chunk(c: String, k: Int) = s"($c // ${1L << (16 * k)}) % 65536"
    val on = (0 until 4)
      .map(k => s"${chunk("a.sh", k)} = ${chunk("b.sh", k)}")
      .mkString(" OR ")
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, ${Text.duck.simhash64Sql("text")} AS sh
       |  FROM documents WHERE $where),
       |edges AS (
       |  SELECT a.doc_id AS src, b.doc_id AS dst
       |  FROM sh a JOIN sh b
       |    ON ($on) AND a.doc_id <> b.doc_id
       |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
       |walk(id, comp) AS (
       |  SELECT doc_id, doc_id FROM sh
       |  UNION
       |  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id)""".stripMargin
  }

  private[graft] lazy val simhashClosureCtes: String =
    simhashClosureCtesWhere("TRUE")

  // ---------------------------------------------------------------- d18
  // Cluster-state RETRACTION — the takedown half of t59's incremental
  // labels (d12/t89 keep-lists derive from these: an untracked retract
  // would keep shipping a taken-down doc as canonical). The state
  // stores labels only and a retracted doc can BRIDGE a component, so
  // the accumulated pair set is re-supplied
  // (Dedup.retractFromClusterState — the rebalanceIvfPqIndex re-supply
  // precedent) and components re-run over the survivors: retract(X) ≡
  // rebuild-without-X EXACTLY, bridge splits included. The oracle is
  // the shared simhash closure over the surviving docs.
  def d18_cluster_retract(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val path = s"/tmp/graft_d18/${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
      s"_${srcStamp(dir, "documents.parquet")}"
    val marker = new java.io.File(s"$path.retracted.marker")
    if (!marker.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      val pairs = Dedup.simhashNearDup64(docs, "doc_id", "text",
        maxHamming = 3)
      Dedup.buildClusterState(docs, "doc_id", pairs, path)
      Dedup.retractFromClusterState(docs.filter($"doc_id" % 16 === 5),
        "doc_id", pairs, path)
      require(marker.createNewFile(), s"d18: marker create failed at $path")
    }
    Dedup.clusterSizes(spark, path).orderBy($"comp")
  }

  private[graft] lazy val d18_sql = {
    simhashClosureCtesWhere("doc_id % 16 <> 5") + s""",
       |labels AS (
       |  SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
       |SELECT comp, CAST(COUNT(*) AS BIGINT) AS n
       |FROM labels GROUP BY comp ORDER BY comp""".stripMargin
  }

  private[graft] val t59_sql = {
    simhashClosureCtes + s""",
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

  private[graft] val t56_sql =
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

  private[graft] val d11_sql = {
    simhashClosureCtes + s"""
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

  private[graft] val d12_sql = {
    simhashClosureCtes + s""",
       |comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
       |sizes AS (SELECT comp, COUNT(*) AS cluster_n FROM comps GROUP BY comp)
       |SELECT c.id AS doc_id, s.cluster_n,
       |  CAST(length(d.text) AS INTEGER) AS text_len
       |FROM comps c JOIN sizes s ON c.comp = s.comp
       |  JOIN documents d ON d.doc_id = c.id
       |WHERE c.id = c.comp ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- d15
  // Dedup-cluster SIZE DISTRIBUTION card — the governance histogram of
  // near-dup structure (how much of the corpus is duplicated, and how
  // concentrated): component sizes census'd to (cluster_n, n_clusters,
  // n_docs). Cost beyond the d11 chain is two bounded aggregations
  // (components → sizes → histogram — cells cross the shuffles, never
  // docs). Oracle = the shared simhash closure replay + the same two
  // censuses.
  def d15_cluster_size_card(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.simhashNearDup64(docs, "doc_id", "text", maxHamming = 3)
    Dedup.connectedComponents(docs, "doc_id", pairs)
      .groupBy($"comp").agg(count(lit(1)).as("cluster_n"))
      .groupBy($"cluster_n").agg(count(lit(1)).as("n_clusters"))
      .select($"cluster_n", $"n_clusters",
        ($"cluster_n" * $"n_clusters").as("n_docs"))
      .orderBy($"cluster_n")
  }

  private[graft] val d15_sql = {
    simhashClosureCtes + s""",
       |comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
       |sizes AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_n
       |  FROM comps GROUP BY comp)
       |SELECT cluster_n, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |  CAST(cluster_n * COUNT(*) AS BIGINT) AS n_docs
       |FROM sizes GROUP BY cluster_n ORDER BY cluster_n""".stripMargin
  }

  // ---------------------------------------------------------------- d16
  // Case/whitespace-NORMALIZED exact dedup card (the fuzzy-exact step
  // between d01's byte-exact and d10's near-dup: 'Shared  Banner\t' ==
  // 'shared banner' after folding — the boilerplate variant real
  // crawls carry): normalize = lower + [ \t\n]+ → single space + trim,
  // then ONE census over the normalized keys. Duplicates are PLANTED
  // row-locally (the m08 fixture rule): docs with doc_id%5 ∈ {0,1}
  // rewrite to ~97 shared banner variants differing ONLY in case and
  // whitespace, so the card is non-trivial and the folding itself is
  // what the hash certifies. Output: one governance row.
  def d16_normalized_dedup(spark: SparkSession, dir: String): DataFrame = {
    val page = when($"doc_id" % 5 === 0,
        concat(lit("  Shared "), ($"doc_id" % 97).cast("string"),
          lit(" BANNER\t")))
      .when($"doc_id" % 5 === 1,
        concat(lit("shared "), ($"doc_id" % 97).cast("string"),
          lit(" banner")))
      .otherwise($"text")
    val norm = lower(trim(regexp_replace(page, "[ \\t\\n]+", " ")))
    t(spark, dir, "documents")
      .groupBy(norm.as("nk")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_groups"),
        sum($"c").as("n_docs"),
        (sum($"c") - count(lit(1))).as("n_dup_docs"),
        sum(when($"c" > 1L, 1L).otherwise(0L)).as("dup_groups"),
        max($"c").as("max_group"))
  }

  private[graft] val d16_sql =
    """WITH p AS (
      |  SELECT CASE
      |    WHEN doc_id % 5 = 0 THEN '  Shared ' || (doc_id % 97) || ' BANNER' || chr(9)
      |    WHEN doc_id % 5 = 1 THEN 'shared ' || (doc_id % 97) || ' banner'
      |    ELSE text END AS page
      |  FROM documents),
      |g AS (
      |  SELECT lower(trim(regexp_replace(page, '[ \t\n]+', ' ', 'g'))) AS nk,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM p GROUP BY 1)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
      |  CAST(SUM(c) AS BIGINT) AS n_docs,
      |  CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_docs,
      |  CAST(COUNT(*) FILTER (WHERE c > 1) AS BIGINT) AS dup_groups,
      |  CAST(MAX(c) AS BIGINT) AS max_group
      |FROM g""".stripMargin

  // ================================================================
  // Storage, streaming, temporal, casts, generation (SURVEY §2.1/§2.8/
  // §2.10).
  // ================================================================

  // ---------------------------------------------------------------- t69
  // LINE-level boilerplate dedup (the RefinedWeb / CCNet line-dedup
  // stage, CorpusStats.lineDedup): pages are CONSTRUCTED per doc (the
  // t56/t68 precedent) with a corpus-wide cookie banner, a per-source
  // nav line, a per-lang tag line, the body, and a per-source footer —
  // at maxDf = 10 every constructed boilerplate line's document
  // frequency exceeds the cap while body lines (exact-dup groups are
  // small) survive. Output fingerprints the cleaned text.
  private def pagedDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("page", concat(
        lit("Cookie notice: accept all cookies"), lit("\n"),
        lit("Home / About / "), $"source", lit("\n"),
        lit("Language: "), $"lang", lit("\n"),
        $"text", lit("\n"),
        lit("Copyright 2026 "), $"source"))

  def t69_line_dedup(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.lineDedup(pagedDocs(spark, dir), "doc_id",
        "page", maxDf = 10)
      .select($"doc_id", $"n_lines", $"n_kept", md5($"clean").as("clean_fp"))
      .orderBy($"doc_id")

  // ---------------------------------------------------------------- t71
  // STREAMING line cleaning — t69 on a live feed: the frequent-line
  // set is fit ONCE on the accumulated corpus (bounded driver pull),
  // then each staged micro-batch cleans against it statelessly, so
  // the accumulated output equals the batch run row-for-row and the
  // oracle IS t69's SQL. Readers dedupe on doc_id (at-least-once
  // append, the t27 convention).
  def t71_stream_line_clean(spark: SparkSession, dir: String): DataFrame = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft_stream/$key/linededup_v1" +
      s"_s${srcStamp(dir, "documents.parquet")}"
    val paged = pagedDocs(spark, dir).select($"doc_id", $"page")
    if (!new java.io.File(s"$base/feed/_SUCCESS").exists())
      paged.write.mode("overwrite").parquet(s"$base/feed")
    if (!new java.io.File(s"$base/done").exists()) {
      val freq = operators.CorpusStats.collectFrequentLines(paged,
        "doc_id", "page", maxDf = 10)
      streaming.Streams.lineCleanStream(spark, s"$base/feed", paged,
        "doc_id", "page", freq, outDir = s"$base/out",
        checkpoint = s"$base/ckpt")
      new java.io.File(s"$base/done").createNewFile()
    }
    spark.read.parquet(s"$base/out")
      .dropDuplicates("doc_id")
      .select($"doc_id", $"n_lines", $"n_kept", md5($"clean").as("clean_fp"))
      .orderBy($"doc_id")
  }

  // t71's oracle IS t69's SQL (stream == batch)
  private[graft] lazy val t71_sql = t69_sql

  // ---------------------------------------------------------------- t73
  // PARAGRAPH-scope boilerplate dedup (RefinedWeb dedups lines AND
  // paragraphs): the t69 census machinery with sep = "\n\n", so a
  // MULTI-LINE boilerplate block (the two-line cookie banner, the
  // two-line footer) drops as a UNIT — line-dedup would need every
  // line of the block to individually cross the df cap. Pages are
  // constructed per doc (the t69 precedent) from blank-line-separated
  // paragraphs: a corpus-wide banner, a per-source nav, the body, a
  // per-source footer; at maxDf = 10 the constructed blocks exceed
  // the cap while bodies survive.
  private def paraDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("page", concat(
        lit("Cookie notice\nWe use cookies to improve your experience"),
        lit("\n\n"),
        lit("Nav: Home / About / "), $"source", lit("\n\n"),
        $"text", lit("\n\n"),
        lit("Follow us on social media\nCopyright 2026 "), $"source"))

  def t73_paragraph_dedup(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.paragraphDedup(paraDocs(spark, dir), "doc_id",
        "page", maxDf = 10)
      .select($"doc_id", $"n_lines".as("n_paras"),
        $"n_kept", md5($"clean").as("clean_fp"))
      .orderBy($"doc_id")

  // ---------------------------------------------------------------- t75
  // STREAMING paragraph cleaning — t73 on a live feed (the t71
  // pattern): the frequent-paragraph set is fit ONCE on the
  // accumulated corpus (bounded driver pull at block scope), then each
  // staged micro-batch cleans against it statelessly; accumulated
  // output == the batch run row-for-row, so the oracle IS t73's SQL.
  def t75_stream_paragraph_clean(spark: SparkSession,
                                 dir: String): DataFrame = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft_stream/$key/paradedup_v1" +
      s"_s${srcStamp(dir, "documents.parquet")}"
    val paged = paraDocs(spark, dir).select($"doc_id", $"page")
    if (!new java.io.File(s"$base/feed/_SUCCESS").exists())
      paged.write.mode("overwrite").parquet(s"$base/feed")
    if (!new java.io.File(s"$base/done").exists()) {
      val freq = operators.CorpusStats.collectFrequentLines(paged,
        "doc_id", "page", maxDf = 10, sep = "\n\n")
      streaming.Streams.paragraphCleanStream(spark, s"$base/feed", paged,
        "doc_id", "page", freq, outDir = s"$base/out",
        checkpoint = s"$base/ckpt")
      new java.io.File(s"$base/done").createNewFile()
    }
    spark.read.parquet(s"$base/out")
      .dropDuplicates("doc_id")
      .select($"doc_id", $"n_lines".as("n_paras"),
        $"n_kept", md5($"clean").as("clean_fp"))
      .orderBy($"doc_id")
  }

  // t75's oracle IS t73's SQL (stream == batch)
  private[graft] lazy val t75_sql = t73_sql

  // ---------------------------------------------------------------- t81
  // CONTENT-DEFINED CHUNKING dedup census (rsync/LBFS, Muthitacharoen
  // et al. 2001): chunk boundaries fall where a 16-code-point rolling
  // polynomial hash hits the 2^5 mask, so boundaries track CONTENT —
  // shifted duplicate text (same article behind a changed preamble)
  // re-aligns on identical boundaries and shares chunk fingerprints,
  // the signal fixed shingles and line/paragraph scopes miss. ONE
  // codegen pass + one fingerprint census shuffle; the oracle replays
  // the hash as a per-position closed-form sum (position-local — the
  // reason basic CDC, not FastCDC with its sequential min/max state,
  // is the replayable choice).
  def t81_cdc_dedup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select($"doc_id",
        explode(graft.functions.CdcChunks.chunks($"text", 16, 5))
          .as("chunk"))
      .select($"doc_id", md5($"chunk").as("fp"))
      .groupBy($"fp")
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter($"n_docs" >= 2L)
      .orderBy($"fp")

  private[graft] lazy val t81_sql = {
    val (w, div) = (16, 32)
    val pows = {
      var x = 1L
      (0 until w).map { _ => val r = x; x = x * 257L % 2147483647L; r }
    }
    val terms = (0 until w)
      .map(j => s"CAST(unicode(cs[i - $j]) AS BIGINT) * ${pows(j)}")
      .mkString(" +\n      |      ")
    s"""WITH cs AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, '') AS cs
       |  FROM documents WHERE text <> ''),
       |h AS (
       |  SELECT doc_id, i,
       |    ($terms) % 2147483647 AS hv
       |  FROM cs, UNNEST(range($w, len(cs) + 1)) AS u(i)),
       |bnd AS (
       |  SELECT DISTINCT doc_id, i FROM (
       |    SELECT doc_id, i FROM h WHERE hv % $div = 0
       |    UNION ALL
       |    SELECT doc_id, len(cs) AS i FROM cs)),
       |cpos AS (
       |  SELECT doc_id,
       |    COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s,
       |    i AS e
       |  FROM bnd),
       |ch AS (
       |  SELECT c.doc_id, md5(array_to_string(v.cs[c.s+1:c.e], '')) AS fp
       |  FROM cpos c JOIN cs v USING (doc_id) WHERE c.e > c.s)
       |SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_occ
       |FROM ch GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
       |ORDER BY fp""".stripMargin
  }

  // ---------------------------------------------------------------- t77
  // Unicode NFC normalization card — the preprocessing stage before
  // any dedup/census/tokenizer table: decomposed and precomposed
  // spellings of the SAME text hash apart everywhere downstream until
  // canonical composition unifies them. Pages plant all three cases
  // (decomposed e+U+0301 → composes, precomposed é → already NFC,
  // plain ASCII → short-circuits); the card reports per-doc code-point
  // counts before/after, a changed flag, and the normalized-text
  // fingerprint — NFC is standard-pinned, so java.text.Normalizer and
  // DuckDB's nfc_normalize agree byte-for-byte.
  def t77_nfc_normalize(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NfcNormalize.nfc
    val page = concat($"text",
      when($"doc_id" % 3 === 0,
          lit(" cafe\u0301 menu")) // decomposed e + combining acute
        .when($"doc_id" % 3 === 1,
          lit(" caf\u00e9 menu"))  // precomposed
        .otherwise(lit(" plain menu")))
    t(spark, dir, "documents")
      .select($"doc_id", page.as("page"))
      .select($"doc_id",
        length($"page").cast("long").as("chars_before"),
        length(nfc($"page")).cast("long").as("chars_after"),
        ($"page" =!= nfc($"page")).cast("int").as("changed"),
        md5(nfc($"page")).as("norm_fp"))
      .orderBy($"doc_id")
  }

  private[graft] val t77_sql =
    """WITH p AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769) || ' menu'
      |         WHEN doc_id % 3 = 1 THEN ' caf' || chr(233) || ' menu'
      |         ELSE ' plain menu' END AS page
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(page) AS BIGINT) AS chars_before,
      |  CAST(length(nfc_normalize(page)) AS BIGINT) AS chars_after,
      |  CAST(page <> nfc_normalize(page) AS INT) AS changed,
      |  md5(nfc_normalize(page)) AS norm_fp
      |FROM p ORDER BY doc_id""".stripMargin

  private[graft] lazy val t73_sql =
    """WITH pages AS MATERIALIZED (
      |  SELECT doc_id,
      |    'Cookie notice' || chr(10) ||
      |    'We use cookies to improve your experience' ||
      |    chr(10) || chr(10) ||
      |    'Nav: Home / About / ' || source || chr(10) || chr(10) ||
      |    text || chr(10) || chr(10) ||
      |    'Follow us on social media' || chr(10) ||
      |    'Copyright 2026 ' || source AS page
      |  FROM documents),
      |ls AS MATERIALIZED (
      |  SELECT doc_id, i AS pos, lns[i] AS para FROM (
      |    SELECT doc_id, string_split(page, chr(10) || chr(10)) AS lns
      |    FROM pages),
      |    UNNEST(range(1, len(lns) + 1)) AS t(i)),
      |freq AS MATERIALIZED (
      |  SELECT para FROM (
      |    SELECT para, COUNT(*) AS df FROM (
      |      SELECT DISTINCT doc_id, para FROM ls) GROUP BY 1)
      |  WHERE df > 10),
      |kept AS (
      |  SELECT ls.* FROM ls ANTI JOIN freq USING (para)),
      |re AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |         md5(string_agg(para, chr(10) || chr(10) ORDER BY pos)) AS fp
      |  FROM kept GROUP BY doc_id)
      |SELECT p.doc_id,
      |  CAST(len(string_split(p.page, chr(10) || chr(10))) AS BIGINT)
      |    AS n_paras,
      |  COALESCE(r.n_kept, 0) AS n_kept,
      |  COALESCE(r.fp, md5('')) AS clean_fp
      |FROM pages p LEFT JOIN re r USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  private[graft] lazy val t69_sql =
    """WITH pages AS MATERIALIZED (
      |  SELECT doc_id,
      |    'Cookie notice: accept all cookies' || chr(10) ||
      |    'Home / About / ' || source || chr(10) ||
      |    'Language: ' || lang || chr(10) ||
      |    text || chr(10) ||
      |    'Copyright 2026 ' || source AS page
      |  FROM documents),
      |ls AS MATERIALIZED (
      |  SELECT doc_id, i AS pos, lns[i] AS line FROM (
      |    SELECT doc_id, string_split(page, chr(10)) AS lns FROM pages),
      |    UNNEST(range(1, len(lns) + 1)) AS t(i)),
      |freq AS MATERIALIZED (
      |  SELECT line FROM (
      |    SELECT line, COUNT(*) AS df FROM (
      |      SELECT DISTINCT doc_id, line FROM ls) GROUP BY 1)
      |  WHERE df > 10),
      |kept AS (
      |  SELECT ls.* FROM ls ANTI JOIN freq USING (line)),
      |re AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |         md5(string_agg(line, chr(10) ORDER BY pos)) AS fp
      |  FROM kept GROUP BY doc_id)
      |SELECT p.doc_id,
      |  CAST(len(string_split(p.page, chr(10))) AS BIGINT) AS n_lines,
      |  COALESCE(r.n_kept, 0) AS n_kept,
      |  COALESCE(r.fp, md5('')) AS clean_fp
      |FROM pages p LEFT JOIN re r USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  // ---------------------------------------------------------------- t83
  // Readability card (Flesch–Kincaid in EXACT integers — see
  // CorpusStats.readability). The raw corpus has no sentence
  // punctuation, so pages are constructed (the t73/t77 pattern): a
  // doc_id-varying truncation of the body plus a planted sentence
  // tail, so word counts, sentence counts, and the band cuts all vary.
  // The FK grade travels as the exact rational (fk_num, fk_den) — no
  // float ever computes, bands are cross-multiplied comparisons.
  def t83_readability(spark: SparkSession, dir: String): DataFrame = {
    val page = concat(
      $"text".substr(lit(1), (lit(80L) + ($"doc_id" % 7) * 40L).cast("int")),
      when($"doc_id" % 3 === 0, lit(". Short tail. Yes!"))
        .when($"doc_id" % 3 === 1, lit("? Maybe so... later perhaps."))
        .otherwise(lit(" and so on.")))
    operators.CorpusStats.readability(
      t(spark, dir, "documents").select($"doc_id", page.as("page")),
      "doc_id", "page")
      .orderBy($"doc_id")
  }

  private[graft] lazy val t83_sql =
    """WITH p AS (
      |  SELECT doc_id,
      |    substr(text, 1, CAST(80 + (doc_id % 7) * 40 AS INT)) ||
      |    CASE WHEN doc_id % 3 = 0 THEN '. Short tail. Yes!'
      |         WHEN doc_id % 3 = 1 THEN '? Maybe so... later perhaps.'
      |         ELSE ' and so on.' END AS page
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(page, '[^ ]+')) AS BIGINT) AS w,
      |    GREATEST(
      |      CAST(len(regexp_extract_all(page, '[.!?]+')) AS BIGINT),
      |      1) AS s,
      |    CAST(len(regexp_extract_all(lower(page), '[aeiouy]+'))
      |      AS BIGINT) AS vg,
      |    CAST(len(regexp_extract_all(lower(page),
      |      '[^ ]*[aeiouy][^ ]*')) AS BIGINT) AS vt
      |  FROM p),
      |f AS (
      |  SELECT doc_id, w AS n_words, s AS n_sents, vg + w - vt AS n_syll,
      |         GREATEST(w, 1) AS w1, s
      |  FROM c)
      |SELECT doc_id, n_words, n_sents, n_syll,
      |  39 * w1 * w1 + 1180 * n_syll * s - 1559 * s * w1 AS fk_num,
      |  100 * s * w1 AS fk_den,
      |  CASE WHEN 39 * w1 * w1 + 1180 * n_syll * s - 1559 * s * w1
      |            < 8 * (100 * s * w1) THEN 'easy'
      |       WHEN 39 * w1 * w1 + 1180 * n_syll * s - 1559 * s * w1
      |            < 13 * (100 * s * w1) THEN 'medium'
      |       ELSE 'hard' END AS band
      |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t84
  // Encoding-anomaly (mojibake) census — see
  // CorpusStats.encodingAnomalies. The corpus is clean, so artifacts
  // are planted per doc_id class: a UTF-8-as-Latin-1 digraph (U+00C3 +
  // continuation-range U+00A9), a U+FFFD replacement char, a raw C1
  // control (U+0085 NEL), and a clean tail. Patterns and fixtures are
  // spelled as \uXXXX / \x{hhhh} escapes only (the NFC transit trap);
  // DuckDB builds the same code points via chr().
  def t84_encoding_anomalies(spark: SparkSession, dir: String): DataFrame = {
    val page = concat($"text",
      when($"doc_id" % 4 === 0, lit(" caf\u00c3\u00a9 latte"))
        .when($"doc_id" % 4 === 1, lit(" bad\ufffdchar"))
        .when($"doc_id" % 4 === 2, lit(" ctl\u0085line"))
        .otherwise(lit(" clean text")))
    operators.CorpusStats.encodingAnomalies(
      t(spark, dir, "documents").select($"doc_id", page.as("page")),
      "doc_id", "page")
      .orderBy($"doc_id")
  }

  private[graft] lazy val t84_sql =
    """WITH p AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN doc_id % 4 = 0
      |           THEN ' caf' || chr(195) || chr(169) || ' latte'
      |         WHEN doc_id % 4 = 1 THEN ' bad' || chr(65533) || 'char'
      |         WHEN doc_id % 4 = 2 THEN ' ctl' || chr(133) || 'line'
      |         ELSE ' clean text' END AS page
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(page, '\x{FFFD}')) AS BIGINT)
      |      AS n_fffd,
      |    CAST(len(regexp_extract_all(page, '[\x{0080}-\x{009F}]'))
      |      AS BIGINT) AS n_c1,
      |    CAST(len(regexp_extract_all(page,
      |      '\x{00C3}[\x{0080}-\x{00BF}]')) AS BIGINT) AS n_moji
      |  FROM p)
      |SELECT doc_id, n_fffd, n_c1, n_moji,
      |  CAST(n_fffd + n_c1 + n_moji > 0 AS INT) AS flagged
      |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t89
  // Quality-canonical dedup: per near-dup cluster keep the BEST copy by
  // quality score (tie → lowest doc_id), not the arbitrary min-id d12
  // ships — the real pipeline rule (of N crawl copies, keep the
  // cleanest). Composes the d11 component chain with the t02 quality
  // formula (ONE shared SQL home, qualitySql) and a per-cluster argmax
  // window. qualityScore is roundBin(…,4) on BOTH sides, so the
  // ordering doubles are bit-identical.
  def t89_canonical_dedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.simhashNearDup64(docs, "doc_id", "text",
      maxHamming = 3)
    val comps = Dedup.connectedComponents(docs, "doc_id", pairs)
    val scored = docs.select($"doc_id",
      graft.functions.QualityExpr.qualityScore($"text").as("q"))
    val sizes = comps.groupBy($"comp").agg(count(lit(1)).as("cluster_n"))
    val w = Window.partitionBy($"comp").orderBy($"q".desc, $"doc_id".asc)
    comps.join(scored, $"id" === $"doc_id")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .join(sizes, "comp")
      .select($"comp", $"doc_id".as("keep_id"), $"q", $"cluster_n")
      .orderBy($"comp")
  }

  private[graft] lazy val t89_sql = {
    simhashClosureCtes + s""",
       |cmp AS (SELECT id AS doc_id, MIN(comp) AS comp
       |        FROM walk GROUP BY id),
       |qs AS (SELECT doc_id,
       |  floor(($qualitySql) * 10000 + 0.5) / 10000 AS q
       |  FROM documents),
       |sz AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_n
       |       FROM cmp GROUP BY comp),
       |rnk AS (
       |  SELECT c.comp, c.doc_id, q.q,
       |    ROW_NUMBER() OVER (PARTITION BY c.comp
       |      ORDER BY q.q DESC, c.doc_id) AS rk
       |  FROM cmp c JOIN qs q USING (doc_id))
       |SELECT r.comp, r.doc_id AS keep_id, r.q, s.cluster_n
       |FROM rnk r JOIN sz s USING (comp)
       |WHERE r.rk = 1 ORDER BY r.comp""".stripMargin
  }

  // ---------------------------------------------------------------- t88
  // Vocabulary-growth card (Heaps' law): cumulative distinct types vs
  // token mass over doc_id-ordered prefixes — see
  // CorpusStats.vocabGrowth. The cumsum window runs over the BUCKET
  // census (bounded), never corpus rows; DuckDB's window SUM returns
  // HUGEINT → CAST AS BIGINT (the documented rule).
  def t88_vocab_growth(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.vocabGrowth(
      t(spark, dir, "documents"), "doc_id", "text", bucketSize = 64L)
      .orderBy($"bucket")

  private[graft] lazy val t88_sql =
    """WITH tk AS (
      |  SELECT bucket, word FROM (
      |    SELECT doc_id // 64 AS bucket,
      |           unnest(string_split(text, ' ')) AS word
      |    FROM documents)
      |  WHERE word <> ''),
      |pb AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
      |  FROM tk GROUP BY bucket),
      |fb AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_vocab FROM (
      |    SELECT word, MIN(bucket) AS bucket FROM tk GROUP BY word)
      |  GROUP BY bucket)
      |SELECT p.bucket, p.n_tokens,
      |  CAST(SUM(p.n_tokens) OVER (ORDER BY p.bucket) AS BIGINT)
      |    AS tokens_cum,
      |  COALESCE(f.new_vocab, 0) AS new_vocab,
      |  CAST(SUM(COALESCE(f.new_vocab, 0)) OVER (ORDER BY p.bucket)
      |    AS BIGINT) AS vocab_cum
      |FROM pb p LEFT JOIN fb f USING (bucket)
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- t85
  // Leave-one-out n-gram novelty (see CorpusStats.ngramNovelty): the
  // per-document fraction of distinct word 3-gram hashes shared with
  // no other document — the memorization/diversity card. Docs too
  // short for any 3-gram report zeros via the left join; mostly_novel
  // is the cross-multiplied ≥ 80% gate (no float ratio).
  def t85_ngram_novelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    docs.select($"doc_id")
      .join(operators.CorpusStats.ngramNovelty(docs, "doc_id", "text", 3),
        Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"n_novel", lit(0L)).as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        ($"n_grams" > 0L && $"n_novel" * 5 >= $"n_grams" * 4)
          .cast("int").as("mostly_novel"))
      .orderBy($"doc_id")
  }

  private[graft] lazy val t85_sql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, w,
       |         unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
       |  FROM toks),
       |grams AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, ${Text.duck.ngramHashSql("w", "i", 3)} AS g
       |  FROM pos),
       |census AS (
       |  SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
       |per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |         CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_novel
       |  FROM grams JOIN census USING (g) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(p.n_grams, 0) AS n_grams,
       |  COALESCE(p.n_novel, 0) AS n_novel,
       |  CAST(COALESCE(p.n_grams, 0) > 0
       |       AND COALESCE(p.n_novel, 0) * 5 >= COALESCE(p.n_grams, 0) * 4
       |    AS INT) AS mostly_novel
       |FROM documents d LEFT JOIN per p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- t90
  // Character-entropy quality card (gibberish / degenerate-repetition
  // gate) — see CorpusStats.charEntropy. Entropy travels as the exact
  // rational (ent_num, 64·n) in 1/64-bit integer surprisal (the ONE
  // s64 spelling), so band cuts at 4.0 / 4.5 bits are cross-multiplied
  // integer comparisons and the card replays bit-for-bit. Tails are
  // planted per doc_id class (a low-entropy 'z' run, a high-entropy
  // symbol string, clean) so all three bands occur (88/309/103 at
  // sf0.01, measured before fixing the cuts — the s18 τ rule).
  def t90_char_entropy(spark: SparkSession, dir: String): DataFrame = {
    val page = concat($"text",
      when($"doc_id" % 3 === 0, lit(" " + "z" * 60))
        .when($"doc_id" % 3 === 1, lit(" qWx7!Kp2#vB9@mZ4$yT6&uH8*eJ1%rN3"))
        .otherwise(lit("")))
    operators.CorpusStats.charEntropy(
      t(spark, dir, "documents").select($"doc_id", page.as("page")),
      "doc_id", "page", lowBits64 = 256L, highBits64 = 288L)
      .orderBy($"doc_id")
  }

  private[graft] lazy val t90_sql =
    s"""WITH p AS MATERIALIZED (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' ' || repeat('z', 60)
       |         WHEN doc_id % 3 = 1 THEN ' qWx7!Kp2#vB9@mZ4$$yT6&uH8*eJ1%rN3'
       |         ELSE '' END AS page
       |  FROM documents),
       |cs AS MATERIALIZED (
       |  SELECT doc_id, substr(page, CAST(i AS INT), 1) AS ch
       |  FROM p, UNNEST(range(1, length(page) + 1)) AS t(i)),
       |cen AS MATERIALIZED (
       |  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM cs GROUP BY doc_id, ch),
       |e AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
       |         CAST(SUM(c * ${duckS64("c")}) AS BIGINT) AS se
       |  FROM cen GROUP BY doc_id)
       |SELECT p.doc_id, COALESCE(e.n, 0) AS n_cp,
       |  COALESCE(e.n * ${duckS64("e.n")} - e.se, 0) AS ent_num,
       |  64 * GREATEST(COALESCE(e.n, 0), 1) AS ent_den,
       |  CASE WHEN COALESCE(e.n * ${duckS64("e.n")} - e.se, 0) * 64
       |            < 256 * (64 * GREATEST(COALESCE(e.n, 0), 1)) THEN 'low'
       |       WHEN COALESCE(e.n * ${duckS64("e.n")} - e.se, 0) * 64
       |            > 288 * (64 * GREATEST(COALESCE(e.n, 0), 1)) THEN 'high'
       |       ELSE 'mid' END AS band
       |FROM p LEFT JOIN e USING (doc_id) ORDER BY p.doc_id""".stripMargin

  // ---------------------------------------------------------------- t91
  // LZW compression-ratio proxy (the Gopher "compresses too well" gate,
  // engine-exact — zlib output is not replayable, this greedy parse
  // is). The oracle replays the IDENTICAL walk as a recursive CTE with
  // the growing dictionary as a LIST column (the t72 segmentation-state
  // precedent; ≤ 2n iterations per doc bounds the recursion, hence the
  // 160-char page slice — the r08 bounded-slice rule; the planted
  // 'na'×30 tail is what the gate is built to catch). Flag at
  // phrases/n < 2/3, cross-multiplied.
  def t91_lzw_ratio(spark: SparkSession, dir: String): DataFrame = {
    val page = concat($"text".substr(lit(1), lit(160)),
      when($"doc_id" % 3 === 0, lit(" " + "na" * 30))
        .when($"doc_id" % 3 === 1, lit(" qWx7!Kp2#vB9@mZ4$yT6&uH8*eJ1%"))
        .otherwise(lit("")))
    operators.CorpusStats.compressionRatio(
      t(spark, dir, "documents").select($"doc_id", page.as("page")),
      "doc_id", "page", flagNum = 2L, flagDen = 3L)
      .orderBy($"doc_id")
  }

  private[graft] lazy val t91_sql =
    """WITH RECURSIVE p AS MATERIALIZED (
      |  SELECT doc_id, substr(text, 1, 160) ||
      |    CASE WHEN doc_id % 3 = 0 THEN ' ' || repeat('na', 30)
      |         WHEN doc_id % 3 = 1 THEN ' qWx7!Kp2#vB9@mZ4$yT6&uH8*eJ1%'
      |         ELSE '' END AS page
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, page, CAST(length(page) AS BIGINT) AS n,
      |         CAST(1 AS BIGINT) AS st_pos, CAST(0 AS BIGINT) AS wlen,
      |         CAST(0 AS BIGINT) AS phrases, CAST([] AS VARCHAR[]) AS dict
      |  FROM p
      |  UNION ALL
      |  SELECT doc_id, page, n,
      |    CASE WHEN ext THEN st_pos ELSE st_pos + wlen END,
      |    CASE WHEN ext THEN wlen + 1 ELSE CAST(0 AS BIGINT) END,
      |    CASE WHEN ext THEN phrases ELSE phrases + 1 END,
      |    CASE WHEN NOT ext AND st_pos + wlen <= n
      |         THEN list_append(dict,
      |                substr(page, CAST(st_pos AS INT), CAST(wlen + 1 AS INT)))
      |         ELSE dict END
      |  FROM (
      |    SELECT *, (st_pos + wlen <= n AND (wlen = 0 OR
      |        list_contains(dict,
      |          substr(page, CAST(st_pos AS INT), CAST(wlen + 1 AS INT))))) AS ext
      |    FROM st WHERE st_pos <= n) s)
      |SELECT s.doc_id, s.n AS n_cp, s.phrases AS n_phrases,
      |  CAST(s.phrases * 3 < s.n * 2 AS INT) AS flagged
      |FROM st s WHERE s.st_pos > s.n
      |ORDER BY s.doc_id""".stripMargin

  // ---------------------------------------------------------------- t92
  // TextRank keyword extraction — integer PageRank over the word
  // co-occurrence graph (operators/TextRank). Every step is bounded
  // integer arithmetic (pre-scaled edge ratios, floor divisions), so
  // five power-iteration rounds replay bit-for-bit as materialized
  // CTEs (the Lloyd-iteration precedent).
  def t92_textrank(spark: SparkSession, dir: String): DataFrame =
    operators.TextRank.keywords(t(spark, dir, "documents"),
      "text", minDf = 2L, maxNodes = 64, iters = 5, k = 10)
      .orderBy($"rk")

  /** One integer-PageRank round in DuckDB over CTEs nodes/r/tt:
    * p<k>(v) = T + Σ_{a→v} ((p(a)·85 // 100) · r // 2^20). */
  private def trIterSql(prev: String, k: Int): String =
    s"""p$k AS MATERIALIZED (
       |  SELECT nd.word, t.t + COALESCE(CAST(SUM(c.contrib) AS BIGINT), 0) AS p
       |  FROM nodes nd CROSS JOIN tt t
       |  LEFT JOIN (SELECT r.eb, ((pp.p * 85) // 100) * r.r // 1048576 AS contrib
       |             FROM r JOIN $prev pp ON pp.word = r.ea) c ON c.eb = nd.word
       |  GROUP BY nd.word, t.t)""".stripMargin

  private[graft] lazy val t92_sql =
    s"""WITH tok AS MATERIALIZED (
       |  SELECT doc_id, i AS pos, w[CAST(i AS INT)] AS word
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |       UNNEST(range(1, len(w) + 1)) AS t(i)
       |  WHERE w[CAST(i AS INT)] <> ''),
       |cen AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
       |        FROM tok GROUP BY word),
       |nodes AS MATERIALIZED (
       |  SELECT word FROM (
       |    SELECT word, ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rk
       |    FROM cen WHERE cnt >= 2)
       |  WHERE rk <= 64),
       |adj AS (
       |  SELECT a.word AS ea, b.word AS eb
       |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  WHERE a.word <> b.word),
       |ed AS MATERIALIZED (
       |  SELECT s.ea, s.eb, CAST(COUNT(*) AS BIGINT) AS w FROM (
       |    SELECT ea, eb FROM adj UNION ALL SELECT eb AS ea, ea AS eb FROM adj) s
       |  JOIN nodes na ON s.ea = na.word
       |  JOIN nodes nb ON s.eb = nb.word
       |  GROUP BY s.ea, s.eb),
       |wout AS (SELECT ea, CAST(SUM(w) AS BIGINT) AS wo FROM ed GROUP BY ea),
       |r AS MATERIALIZED (
       |  SELECT e.ea, e.eb, (e.w * 1048576) // w2.wo AS r
       |  FROM ed e JOIN wout w2 USING (ea)),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |tt AS (SELECT (15 * 1099511627776) // (100 * n) AS t FROM nn),
       |p0 AS (SELECT word, 1099511627776 // n AS p FROM nodes, nn),
       |${trIterSql("p0", 1)},
       |${trIterSql("p1", 2)},
       |${trIterSql("p2", 3)},
       |${trIterSql("p3", 4)},
       |${trIterSql("p4", 5)}
       |SELECT word, p AS pr,
       |  CAST(ROW_NUMBER() OVER (ORDER BY p DESC, word) AS BIGINT) AS rk
       |FROM p5 QUALIFY rk <= 10 ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------- t93
  // Blocklist census (C4/RefinedWeb banned-wordlist gate) — ONE
  // Aho–Corasick codegen pass counting ALL occurrences (overlapping
  // included) of every phrase; see CorpusStats.blocklistCensus. The
  // phrase list exercises failure links (scan/can share a suffix,
  // banana/ana overlap — 'ana' matches twice inside 'banana'); the
  // oracle is the defining per-position substring census. flagMin = 13
  // ≈ the measured median hit count, so the flag splits the corpus
  // (quantiles 5/8/12/16/20 at sf0.01 — never gate on a vacuous cut).
  private[graft] val blockPhrases = Seq("scan", "can", "ana",
    "fast merge", "table", "slow", "spark", "banana")

  private def blockPages(spark: SparkSession, dir: String): DataFrame = {
    val page = concat($"text",
      when($"doc_id" % 4 === 0, lit(" banana scans fast merge queue"))
        .when($"doc_id" % 4 === 1, lit(" no bad words here at all"))
        .when($"doc_id" % 4 === 2, lit(" slow table slow table slow"))
        .otherwise(lit("")))
    t(spark, dir, "documents").select($"doc_id", page.as("page"))
  }

  def t93_blocklist(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.blocklistCensus(blockPages(spark, dir),
      "doc_id", "page", blockPhrases, flagMin = 13L)
      .orderBy($"doc_id")

  // ---------------------------------------------------------------- t94
  // STREAMING blocklist census — t93 on a live feed (the t71 staged-
  // feed pattern): the phrase list is pipeline config (a plain driver
  // value), each micro-batch runs the identical stateless one-pass
  // Aho–Corasick census, so the accumulated output equals the batch
  // run row-for-row and the oracle IS t93's SQL. Readers dedupe on
  // doc_id (at-least-once append, the t27 convention).
  def t94_stream_blocklist(spark: SparkSession, dir: String): DataFrame = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft_stream/$key/blocklist_v1" +
      s"_s${srcStamp(dir, "documents.parquet")}"
    val paged = blockPages(spark, dir)
    if (!new java.io.File(s"$base/feed/_SUCCESS").exists())
      paged.write.mode("overwrite").parquet(s"$base/feed")
    if (!new java.io.File(s"$base/done").exists()) {
      streaming.Streams.blocklistStream(spark, s"$base/feed", paged,
        "doc_id", "page", blockPhrases, flagMin = 13L,
        outDir = s"$base/out", checkpoint = s"$base/ckpt")
      new java.io.File(s"$base/done").createNewFile()
    }
    spark.read.parquet(s"$base/out")
      .dropDuplicates("doc_id")
      .select($"doc_id", $"n_hits", $"n_phr", $"top_phrase", $"flagged")
      .orderBy($"doc_id")
  }

  // t94's oracle IS t93's SQL (stream == batch)
  private[graft] lazy val t94_sql = t93_sql

  // ---------------------------------------------------------------- t95
  // Per-source KL-divergence drift card — see CorpusStats.sourceKl.
  // Two sources get planted token drift (repeated slice-specific
  // words); at the 0.1-bit cut exactly those flag (measured 0.16/0.22
  // bits vs ~0.02 background at sf0.01 before fixing the cut — the
  // s18 τ rule). s64's interpolation error can push near-zero
  // divergences slightly negative (src8/src19 at sf0.01) — the card
  // carries the exact rational, so the oracle replays it bit-for-bit.
  def t95_source_kl(spark: SparkSession, dir: String): DataFrame = {
    val page = concat($"text",
      when($"source" === "src0", lit(" alpha beta alpha alpha"))
        .when($"source" === "src1", lit(" gamma gamma delta"))
        .otherwise(lit("")))
    operators.CorpusStats.sourceKl(
      t(spark, dir, "documents").select($"source".as("src"), page.as("page")),
      "src", "page", driftNum = 1L, driftDen = 10L)
      .orderBy($"src")
  }

  private[graft] lazy val t95_sql =
    s"""WITH p AS (
       |  SELECT source, text ||
       |    CASE WHEN source = 'src0' THEN ' alpha beta alpha alpha'
       |         WHEN source = 'src1' THEN ' gamma gamma delta'
       |         ELSE '' END AS page
       |  FROM documents),
       |tok AS MATERIALIZED (
       |  SELECT src, w FROM (
       |    SELECT source AS src, UNNEST(string_split(page, ' ')) AS w FROM p)
       |  WHERE w <> ''),
       |cen AS MATERIALIZED (
       |  SELECT src, w, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tok GROUP BY src, w),
       |dd AS (SELECT w, CAST(SUM(c) AS BIGINT) AS d FROM cen GROUP BY w),
       |ns AS (SELECT src, CAST(SUM(c) AS BIGINT) AS n_tokens
       |       FROM cen GROUP BY src),
       |m AS (SELECT CAST(SUM(c) AS BIGINT) AS m FROM cen),
       |kl AS (
       |  SELECT cen.src, ns.n_tokens,
       |    CAST(SUM(cen.c * (${duckS64("cen.c * m.m")}
       |      - ${duckS64("dd.d * ns.n_tokens")})) AS BIGINT) AS kl_num,
       |    64 * ns.n_tokens AS kl_den
       |  FROM cen JOIN dd USING (w) JOIN ns ON cen.src = ns.src CROSS JOIN m
       |  GROUP BY cen.src, ns.n_tokens)
       |SELECT src, n_tokens, kl_num, kl_den,
       |  CAST(kl_num * 10 > 1 * kl_den AS INT) AS drifted
       |FROM kl ORDER BY src""".stripMargin

  // ---------------------------------------------------------------- t100
  // Per-source token-mass concentration card (corpus-balance
  // governance: is a source's mass carried by a few huge documents?):
  // exact-integer Gini over per-doc token counts + top-doc share —
  // see CorpusStats.concentrationCard for the 2·Σ(rank·x) − (n+1)·Σx
  // fold (ONE window + one aggregation; Σ(rank·x) in DECIMAL(38,0),
  // only the two reported ratios divide, 6-dp roundBin both engines).
  def t100_source_gini(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.concentrationCard(
        t(spark, dir, "documents"), "source", "doc_id", "text")
      .orderBy($"src")

  private[graft] val t100_sql =
    """WITH wc AS (
      |  SELECT source AS src, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wc
      |  FROM documents),
      |r AS (
      |  SELECT src, wc,
      |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY wc, doc_id) AS rk
      |  FROM wc),
      |a AS (
      |  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(wc) AS BIGINT) AS total_tokens,
      |    SUM(CAST(rk AS HUGEINT) * wc) AS srx,
      |    CAST(MAX(wc) AS BIGINT) AS max_wc
      |  FROM r GROUP BY src)
      |SELECT src, n_docs, total_tokens,
      |  floor(CAST(2 * srx - (n_docs + 1) * CAST(total_tokens AS HUGEINT)
      |      AS DOUBLE)
      |    / CAST(n_docs AS DOUBLE) / CAST(total_tokens AS DOUBLE)
      |    * 1000000 + 0.5) / 1000000 AS gini,
      |  floor(CAST(max_wc AS DOUBLE) / CAST(total_tokens AS DOUBLE)
      |    * 1000000 + 0.5) / 1000000 AS top1_share
      |FROM a ORDER BY src""".stripMargin

  // ---------------------------------------------------------------- t103
  // Word burstiness card (Church & Gale 1995 — "adaptation": once a
  // word appears in a document it repeats far above its corpus rate;
  // the classic term-distribution observable TF-IDF and the LM family
  // both lean on): per (lang, word), cf = total occurrences, df =
  // distinct documents, banded by the EXACT integer ratio cf/df with
  // cross-multiplied cuts — band 0 cf = df (never repeats in-doc),
  // band 1 cf ≤ 2·df (mild), band 2 cf > 2·df (bursty) — then the
  // per-(lang, band) census. Pure counting end to end (the word
  // census is the one shuffle; census cells cross the second, never
  // rows); band occupancy MEASURED non-vacuous before the oracle was
  // written (all three bands populated across langs). Empty-string
  // words dropped BOTH sides (Spark split keeps trailing empties at
  // limit −1, DuckDB string_split keeps them — the t69 rule applied
  // symmetrically).
  /** The t103 chain over any (lang, doc_id, text) frame — factored for
    * the golden spec. */
  private[graft] def burstinessOf(docs: DataFrame): DataFrame =
    docs
      .select($"lang", $"doc_id",
        explode(split($"text", " ", -1)).as("w"))
      .filter($"w" =!= "")
      .groupBy($"lang", $"w")
      .agg(count(lit(1)).as("cf"), count_distinct($"doc_id").as("df"))
      .withColumn("band", when($"cf" === $"df", 0L)
        .when($"cf" <= $"df" * 2, 1L).otherwise(2L))
      .groupBy($"lang", $"band")
      .agg(count(lit(1)).as("n_terms"), sum($"cf").as("total_cf"),
        max($"cf").as("max_cf"))

  def t103_burstiness(spark: SparkSession, dir: String): DataFrame =
    burstinessOf(t(spark, dir, "documents")).orderBy($"lang", $"band")

  private[graft] val t103_sql =
    """WITH w AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |c AS (SELECT lang, w, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
      |      FROM w WHERE w <> '' GROUP BY lang, w),
      |b AS (SELECT lang,
      |    CASE WHEN cf = df THEN 0 WHEN cf <= df * 2 THEN 1 ELSE 2 END
      |      AS band, cf FROM c)
      |SELECT lang, band, CAST(COUNT(*) AS BIGINT) AS n_terms,
      |  CAST(SUM(cf) AS BIGINT) AS total_cf,
      |  CAST(MAX(cf) AS BIGINT) AS max_cf
      |FROM b GROUP BY lang, band ORDER BY lang, band""".stripMargin

  // ---------------------------------------------------------------- t98
  // GATE STACK — the composed keep/drop card real pipelines ship
  // (RefinedWeb's stacked filters): character entropy ≥ 3.906 bits
  // (250/64 — raw-corpus p2 is 3.83, p10 3.99, measured first),
  // blocklist hits < 13 (the measured median), language-ID margin ≥
  // 1/64 bit per vocab gram (the t96 kernel), and the t02 quality
  // score ≥ 0.72 — each gate an already-verified operator, all four
  // evaluated in ONE narrow codegen pass over the corpus (entropy,
  // AC scan, langid kernel and quality stats are all row-local
  // expressions; the only model artifact is the folded NB kernel).
  // Per-doc reason flags + keep = the conjunction, so a drop is
  // attributable. Oracle = the four SQL chains conjoined (entropy
  // census, position census, langNbFitSql scoring over ALL docs,
  // qualitySql), LEFT-JOINed from documents (the empty-page rule).
  def t98_gate_stack(spark: SparkSession, dir: String): DataFrame = {
    val m = langNbMemo(spark, dir, srcStamp(dir, "documents.parquet"))
    val k = m.foldKernel.getOrElse(throw new IllegalStateException(
      "t98 needs the folded kernel — the corpus model exceeds the fold gate"))
    operators.CorpusStats.gateStack(t(spark, dir, "documents"),
        "doc_id", "text", k, blockPhrases, entMin64 = 250L,
        blockMax = 13L, langMinPerGram64 = 1L, qMin = 0.72)
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- t99
  // STREAMING gate stack — t98 on a live ingest feed (how a production
  // pipeline actually applies the stacked filters): the langid kernel
  // is a fitted driver artifact (the t51 bloom-bits shape — no
  // session-bound Dataset, no q55 dance) and every other gate is a
  // row-local expression, so each staged micro-batch runs the
  // identical ONE-pass stack statelessly; the accumulated output
  // equals the batch run row-for-row and the oracle IS t98's SQL.
  def t99_stream_gate_stack(spark: SparkSession, dir: String): DataFrame = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft_stream/$key/gatestack_v1" +
      s"_s${srcStamp(dir, "documents.parquet")}"
    val docs = t(spark, dir, "documents").select($"doc_id", $"text")
    if (!new java.io.File(s"$base/feed/_SUCCESS").exists())
      docs.write.mode("overwrite").parquet(s"$base/feed")
    if (!new java.io.File(s"$base/done").exists()) {
      val m = langNbMemo(spark, dir, srcStamp(dir, "documents.parquet"))
      val k = m.foldKernel.getOrElse(throw new IllegalStateException(
        "t99 needs the folded kernel"))
      streaming.Streams.gateStackStream(spark, s"$base/feed", docs,
        "doc_id", "text", k, blockPhrases, entMin64 = 250L,
        blockMax = 13L, langMinPerGram64 = 1L, qMin = 0.72,
        outDir = s"$base/out", checkpoint = s"$base/ckpt")
      new java.io.File(s"$base/done").createNewFile()
    }
    spark.read.parquet(s"$base/out")
      .dropDuplicates("doc_id")
      .select($"doc_id", $"ent_ok", $"block_ok", $"lang_ok", $"q_ok",
        $"keep")
      .orderBy($"doc_id")
  }

  // t99's oracle IS t98's SQL (stream == batch)
  private[graft] lazy val t99_sql = t98_sql

  private[graft] lazy val t98_sql =
    langNbFitSql + s""",
       |ega AS MATERIALIZED (
       |  SELECT doc_id, gram FROM (
       |    SELECT doc_id, substr(text, CAST(i AS INTEGER), 3) AS gram
       |    FROM documents,
       |      UNNEST(range(1, greatest(length(text) - 2, 0) + 1)) AS u(i))
       |  JOIN vocab USING (gram)),
       |nva AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM ega GROUP BY 1),
       |hitsa AS MATERIALIZED (
       |  SELECT doc_id, lang, CAST(SUM(w64) AS BIGINT) AS sw
       |  FROM ega JOIN model USING (gram) GROUP BY 1, 2),
       |sca AS (
       |  SELECT nva.doc_id, nva.n, b.lang,
       |         COALESCE(h.sw, 0) - nva.n * b.b64 AS score64
       |  FROM nva CROSS JOIN base b
       |  LEFT JOIN hitsa h ON h.doc_id = nva.doc_id AND h.lang = b.lang),
       |mg AS (
       |  SELECT doc_id, MAX(n) AS n,
       |    MAX(CASE WHEN rk = 1 THEN score64 END)
       |      - MAX(CASE WHEN rk = 2 THEN score64 END) AS margin64
       |  FROM (SELECT doc_id, n, lang, score64,
       |          ROW_NUMBER() OVER (PARTITION BY doc_id
       |            ORDER BY score64 DESC, lang) AS rk FROM sca)
       |  WHERE rk <= 2 GROUP BY doc_id),
       |cs8 AS MATERIALIZED (
       |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch
       |  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)),
       |cen8 AS MATERIALIZED (
       |  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM cs8 GROUP BY doc_id, ch),
       |e8 AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
       |         CAST(SUM(c * ${duckS64("c")}) AS BIGINT) AS se
       |  FROM cen8 GROUP BY doc_id),
       |ph8 AS (SELECT * FROM (VALUES (0, 'scan'), (1, 'can'), (2, 'ana'),
       |        (3, 'fast merge'), (4, 'table'), (5, 'slow'), (6, 'spark'),
       |        (7, 'banana')) AS t(idx, phr)),
       |bl8 AS (
       |  SELECT d.doc_id,
       |    CAST(SUM(CASE WHEN substr(d.text, CAST(t.i AS INT), len(f.phr))
       |                       = f.phr THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       |  FROM documents d CROSS JOIN ph8 f,
       |    UNNEST(range(1, length(d.text) + 1)) AS t(i)
       |  GROUP BY d.doc_id),
       |qx AS (
       |  SELECT doc_id, floor(($qualitySql) * 10000 + 0.5) / 10000 AS q
       |  FROM documents),
       |g AS (
       |  SELECT d.doc_id,
       |    CAST(COALESCE(e8.n * ${duckS64("e8.n")} - e8.se, 0) * 64
       |         >= 250 * (64 * GREATEST(COALESCE(e8.n, 0), 1)) AS INT)
       |      AS ent_ok,
       |    CAST(COALESCE(bl8.n_hits, 0) < 13 AS INT) AS block_ok,
       |    CAST(mg.doc_id IS NOT NULL AND mg.margin64 >= mg.n AS INT)
       |      AS lang_ok,
       |    CAST(qx.q >= 0.72 AS INT) AS q_ok
       |  FROM documents d
       |  LEFT JOIN e8 USING (doc_id)
       |  LEFT JOIN bl8 USING (doc_id)
       |  LEFT JOIN mg USING (doc_id)
       |  LEFT JOIN qx USING (doc_id))
       |SELECT doc_id, ent_ok, block_ok, lang_ok, q_ok,
       |  ent_ok * block_ok * lang_ok * q_ok AS keep
       |FROM g ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t97
  // Zipf rank-frequency octave card — see CorpusStats.zipfCard. The
  // per-octave slope is s64(f(2^{o−1})) − s64(f(2^o)) in 1/64 bits:
  // the rank axis steps exactly one binary order per octave, so the
  // difference IS the local Zipf exponent ·64 with no division and no
  // float. rank 1's slope is NULL (no previous octave) — both engines
  // emit it as such.
  def t97_zipf_card(spark: SparkSession, dir: String): DataFrame =
    operators.CorpusStats.zipfCard(t(spark, dir, "documents"),
      "doc_id", "text", maxRank = 64)
      .orderBy($"rank")

  private[graft] lazy val t97_sql =
    s"""WITH tok AS (
       |  SELECT w FROM (
       |    SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> ''),
       |cen AS MATERIALIZED (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM tok GROUP BY w),
       |rk AS (
       |  SELECT word, cnt,
       |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS BIGINT)
       |      AS rank
       |  FROM (SELECT * FROM cen ORDER BY cnt DESC, word LIMIT 64)),
       |oc AS (
       |  SELECT rank, word, cnt, ${duckS64("cnt")} AS s64f
       |  FROM rk WHERE (rank & (rank - 1)) = 0)
       |SELECT rank, word, cnt,
       |  LAG(s64f) OVER (ORDER BY rank) - s64f AS slope64
       |FROM oc ORDER BY rank""".stripMargin

  private[graft] lazy val t93_sql =
    """WITH p AS MATERIALIZED (
      |  SELECT doc_id, text ||
      |    CASE WHEN doc_id % 4 = 0 THEN ' banana scans fast merge queue'
      |         WHEN doc_id % 4 = 1 THEN ' no bad words here at all'
      |         WHEN doc_id % 4 = 2 THEN ' slow table slow table slow'
      |         ELSE '' END AS page
      |  FROM documents),
      |ph AS (SELECT * FROM (VALUES (0, 'scan'), (1, 'can'), (2, 'ana'),
      |        (3, 'fast merge'), (4, 'table'), (5, 'slow'), (6, 'spark'),
      |        (7, 'banana')) AS t(idx, phr)),
      |hits AS MATERIALIZED (
      |  SELECT d.doc_id, f.idx, f.phr,
      |    CAST(SUM(CASE WHEN substr(d.page, CAST(t.i AS INT), len(f.phr))
      |                       = f.phr THEN 1 ELSE 0 END) AS BIGINT) AS cnt
      |  FROM p d CROSS JOIN ph f, UNNEST(range(1, length(d.page) + 1)) AS t(i)
      |  GROUP BY d.doc_id, f.idx, f.phr),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_hits,
      |    CAST(SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_phr
      |  FROM hits GROUP BY doc_id),
      |top AS (
      |  SELECT doc_id, phr FROM (
      |    SELECT doc_id, phr, ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY cnt DESC, idx) AS rk
      |    FROM hits) WHERE rk = 1)
      |SELECT p.doc_id, COALESCE(a.n_hits, 0) AS n_hits,
      |  COALESCE(a.n_phr, 0) AS n_phr,
      |  CASE WHEN a.n_hits > 0 THEN t.phr ELSE NULL END AS top_phrase,
      |  CAST(COALESCE(a.n_hits, 0) >= 13 AS INT) AS flagged
      |FROM p LEFT JOIN agg a USING (doc_id) LEFT JOIN top t USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

}
