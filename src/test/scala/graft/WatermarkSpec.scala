package graft

import org.apache.spark.sql.functions._

/** Watermarks + late data — a Structured Streaming capability the
  * reference lacks entirely (its insert-loop has no late-data notion):
  * rows older than the watermark are dropped, closed windows emit
  * exactly once in append mode. */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("late rows behind the watermark are dropped; windows emit once") {
    val dir = "/tmp/graft_test_watermark"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def write(tsSecs: Long*): Unit =
      tsSecs.map(s => Tuple1(new java.sql.Timestamp(s * 1000)))
        .toDF("ts").write.mode("append").parquet(dir)

    write(5L, 8L) // window [0,10): 2 events
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))))
      .parquet(dir)
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "10 seconds"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("wm_test").start()
    try {
      q.processAllAvailable()
      // batch 2 advances the watermark past the first window's end
      write(35L)
      q.processAllAvailable()
      // batch 3: a LATE row for the closed [0,10) window + an advancer
      write(2L, 45L)
      q.processAllAvailable()
      val rows = spark.table("wm_test")
        .select(unix_timestamp($"window.start").as("w"), $"n")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // [0,10) emitted exactly once with n=2 — the late ts=2 row did NOT
      // reopen or re-emit it
      assert(rows.get(0L).contains(2L), s"got $rows")
      assert(spark.table("wm_test")
        .filter(unix_timestamp($"window.start") === 0L).count() == 1)
    } finally q.stop()
  }

  private val kTsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType)))

  test("dedupWithinWatermark: late duplicates drop, fingerprint state " +
      "ages out instead of growing with the feed") {
    val dir = "/tmp/graft_test_wm_dedup"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def write(rows: (Long, Long)*): Unit =
      rows.map { case (k, s) => (k, new java.sql.Timestamp(s * 1000)) }
        .toDF("k", "ts").write.mode("append").parquet(dir)

    write((1L, 5L), (2L, 6L), (1L, 7L)) // in-batch dup of k=1
    val dd = streaming.Streams.dedupWithinWatermark(
      spark.readStream.schema(kTsSchema).parquet(dir),
      "ts", "10 seconds", Seq("k"))
    val q = dd.writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup").start()
    try {
      q.processAllAvailable()
      write((3L, 100L)) // advances the watermark to 90 s
      q.processAllAvailable()
      // a LATE duplicate (behind the watermark) + a fresh key
      write((1L, 5L), (4L, 101L))
      q.processAllAvailable()
      val ks = spark.table("wm_dedup").groupBy($"k").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ks == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
        s"each key exactly once, late dup dropped; got $ks")
      val progs = q.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(progs.map(_.stateOperators.map(
        _.numRowsDroppedByWatermark).sum).sum > 0,
        "the late duplicate must be counted as dropped-by-watermark")
      // state plateau: keys 1/2 (ts 5-7 s, far behind the 90 s watermark)
      // were evicted — the store holds only the in-horizon fingerprints
      val lastState = progs.last.stateOperators.map(_.numRowsTotal).sum
      assert(lastState <= 2, s"expected aged-out state, got $lastState rows")
    } finally q.stop()
  }

  test("session_window: gap-merged sessions emit once when the watermark " +
      "passes their end, with exact bounds and counts") {
    val dir = "/tmp/graft_test_wm_sess"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def write(rows: (Long, Long)*): Unit =
      rows.map { case (k, s) => (k, new java.sql.Timestamp(s * 1000)) }
        .toDF("k", "ts").write.mode("append").parquet(dir)

    // u1: one 3-event session (10-14) + a later singleton (100);
    // u2: one 2-event session (20-21); 10 s gap
    write((1L, 10L), (1L, 12L), (1L, 14L), (2L, 20L), (2L, 21L), (1L, 100L))
    val agg = streaming.Streams.sessionWindowAgg(
      spark.readStream.schema(kTsSchema).parquet(dir),
      "ts", "k", gap = "10 seconds", delay = "5 seconds")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_sess").start()
    try {
      q.processAllAvailable()
      write((3L, 300L)) // watermark → 295 s: closes every session above
      q.processAllAvailable()
      val got = spark.table("wm_sess")
        .select($"k", unix_timestamp($"session_window.start").as("s"),
          unix_timestamp($"session_window.end").as("e"), $"n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      // session end = last event + gap; each session exactly once
      assert(got == Set((1L, 10L, 24L, 3L), (1L, 100L, 110L, 1L),
        (2L, 20L, 31L, 2L)), s"got $got")
    } finally q.stop()
  }

  test("watermarked interval join: pairs emit, unmatched-row state is " +
      "evicted once both watermarks pass it") {
    val dir = "/tmp/graft_test_wm_ijoin"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def write(rows: (Long, Long)*): Unit =
      rows.map { case (k, s) => (k, new java.sql.Timestamp(s * 1000)) }
        .toDF("k", "ts").write.mode("append").parquet(dir)

    write((1L, 10L), (-1L, 15L)) // a(1)@10 pairs with b(1)@15
    def side(neg: Boolean)(df: org.apache.spark.sql.DataFrame) = {
      val s = if (neg) df.filter($"k" < 0L).select((-$"k").as("rk"),
        $"ts".as("rts")) else df.filter($"k" > 0L)
        .select($"k".as("lk"), $"ts".as("lts"))
      s.withWatermark(if (neg) "rts" else "lts", "10 seconds")
    }
    val l = side(neg = false)(spark.readStream.schema(kTsSchema).parquet(dir))
    val r = side(neg = true)(spark.readStream.schema(kTsSchema).parquet(dir))
    val joined = l.join(r, expr(
      "lk = rk AND rts BETWEEN lts AND lts + INTERVAL 10 SECONDS"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("wm_ijoin").start()
    try {
      q.processAllAvailable()
      write((2L, 200L), (-2L, 205L)) // pair 2; watermarks jump to ~190 s
      q.processAllAvailable()
      write((3L, 300L), (-3L, 305L)) // pair 3; eviction of ancient state
      q.processAllAvailable()
      val pairs = spark.table("wm_ijoin").select($"lk").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(pairs == Seq(1L, 2L, 3L), s"got $pairs")
      val progs = q.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(progs.map(_.stateOperators.map(_.numRowsRemoved).sum).sum > 0,
        "join state behind both watermarks must be removed")
      val lastState = progs.last.stateOperators.map(_.numRowsTotal).sum
      assert(lastState < 6,
        s"state must not retain every row ever fed, got $lastState")
    } finally q.stop()
  }

  test("q75 watermarked funnel: the query's own COLD run evicts join " +
      "state (bounded-state production form), matches the unwatermarked " +
      "q56 pair set exactly on the in-order feed, and a warm re-run is a " +
      "planned restart that reads the durable pair store") {
    val dir = "/root/testdata/sf0.001"
    // force a COLD run (fresh feed + checkpoint): eviction happens while
    // the multi-batch feed drains; a warm restart runs no micro-batch
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      s"/tmp/graft_stream/$key/funnel_wm_c4_s${
        Queries.srcStamp(dir, "events.parquet")}"))
    val wm = Queries.q75_stream_funnel_watermarked(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val qn = "graft_wmjoin_" + math.abs(dir.hashCode)
    val removed = streaming.Streams.lastStateRowsRemoved.getOrElse(qn, 0L)
    assert(removed > 0,
      s"the multi-batch watermarked run must evict state, removed=$removed")
    val batch = Queries.q56_stream_interval_join(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(wm == batch, s"watermarked (${wm.size}) != batch (${batch.size})")
    // warm re-run: no new feed files → checkpointed planned restart,
    // the durable store returns the identical pair set exactly once
    val warm = Queries.q75_stream_funnel_watermarked(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(warm == wm, "warm re-run must read the same pairs from the store")
  }

  test("q80 watermarked OHLC bars: the query's own COLD run evicts " +
      "closed-bar state, the emitted bars equal the batch q78 " +
      "exactly on the in-order feed, and a warm re-run reads the " +
      "durable store without replaying the feed") {
    val dir = "/root/testdata/sf0.001"
    // force a COLD run (fresh checkpoint): eviction happens while the
    // multi-batch feed drains; a warm restart's only batch is the
    // punctuation tick, which evicts nothing
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      s"/tmp/graft_stream/$key/ohlc_c4_s${
        Queries.srcStamp(dir, "events.parquet")}"))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val stream = snap(Queries.q80_stream_ohlc(spark, dir))
    val qn = "graft_ohlc_" + math.abs(dir.hashCode)
    val removed = streaming.Streams.lastStateRowsRemoved.getOrElse(qn, 0L)
    assert(removed > 0,
      s"the multi-batch watermarked run must evict bar state, " +
        s"removed=$removed")
    assert(stream == snap(Queries.q78_ohlc(spark, dir)),
      s"streamed bars (${stream.size}) != batch bars")
    // warm re-run: checkpointed planned restart — the durable store
    // returns the same bars exactly once (no duplicate emission)
    assert(snap(Queries.q80_stream_ohlc(spark, dir)) == stream,
      "warm re-run must read the same bars from the durable store")
  }

  test("q79 streaming TWAP equals the batch q77 on the in-order feed, " +
      "and a drained re-run is a planned-restart no-op") {
    val dir = "/root/testdata/sf0.001"
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    val stream = snap(Queries.q79_stream_twap(spark, dir))
    assert(stream == snap(Queries.q77_twap(spark, dir)),
      s"streamed TWAP (${stream.size} users) != batch")
    // second call re-runs the stream against the same checkpoint:
    // completed batches skip, the state fold is untouched
    assert(snap(Queries.q79_stream_twap(spark, dir)) == stream,
      "drained replay must not change the state fold")
  }

  test("q81 streaming EMA is bit-equal to the batch q70 on the " +
      "in-order feed, and a drained re-run is a planned-restart no-op") {
    val dir = "/root/testdata/sf0.001"
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    val stream = snap(Queries.q81_stream_ema(spark, dir))
    assert(stream == snap(Queries.q70_ema(spark, dir)),
      s"streamed EMA (${stream.size} rows) != batch")
    assert(snap(Queries.q81_stream_ema(spark, dir)) == stream,
      "drained replay must not change the emitted fold")
  }

  test("q83 streaming CUSUM equals the batch q82 on the in-order feed " +
      "(the stored_S + kRef phantom seed), and a drained re-run is a " +
      "planned-restart no-op") {
    val dir = "/root/testdata/sf0.001"
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    val stream = snap(Queries.q83_stream_cusum(spark, dir))
    assert(stream == snap(Queries.q82_cusum(spark, dir)),
      s"streamed CUSUM (${stream.size} rows) != batch")
    assert(snap(Queries.q83_stream_cusum(spark, dir)) == stream,
      "drained replay must not change the emitted fold")
  }

  test("q85 streaming drawdown equals the batch q84 on the in-order " +
      "feed (mergeable key-max state), and a drained re-run is a no-op") {
    val dir = "/root/testdata/sf0.001"
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val stream = snap(Queries.q85_stream_drawdown(spark, dir))
    assert(stream == snap(Queries.q84_drawdown(spark, dir)),
      s"streamed drawdown (${stream.size} users) != batch")
    assert(snap(Queries.q85_stream_drawdown(spark, dir)) == stream,
      "drained replay must not change the state fold")
  }

  test("q90 streaming VWAP equals the batch q89 on the feed (mergeable " +
      "partial sums — no phantom, no swap), a drained re-run is a " +
      "no-op, and a redelivered batch REPLACES its own partials") {
    val dir = "/root/testdata/sf0.001"
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val stream = snap(Queries.q90_stream_vwap(spark, dir))
    assert(stream == snap(Queries.q89_vwap(spark, dir)),
      s"streamed VWAP (${stream.size} hours) != batch")
    assert(snap(Queries.q90_stream_vwap(spark, dir)) == stream,
      "drained replay must not change the card")
    // crash-window redelivery: re-running one micro-batch's ingest
    // against the same store must land in its own __batch partition
    // (dynamic overwrite), leaving the folded card unchanged
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val base = s"/tmp/graft_stream/$key/vwap_c4" +
      s"_s${Queries.srcStamp(dir, "events.parquet")}"
    val redelivered = spark.read.parquet(s"$base/feed/chunk_001.parquet")
    // replay chunk 1 exactly as the stream's foreachBatch would for
    // bid = 1 (same prep, same stamp)
    val prep = redelivered
      .select(expr("ts div 1000 div 3600000000").as("hr"),
        expr("CAST(round(value * 100) AS BIGINT)").as("pc"),
        get_json_object($"props", "$.k").cast("long").as("vol"))
      .filter($"vol".isNotNull && $"vol" > 0)
      .groupBy($"hr")
      .agg(count(lit(1)).as("n"), sum($"vol").as("sum_v"),
        sum(($"pc" * $"vol").cast("decimal(38,0)")).cast("long")
          .as("sum_pv"))
      .withColumn("__batch", lit(1L))
    prep.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch").parquet(s"$base/store")
    assert(snap(streaming.Streams.readVwapStore(spark, s"$base/store")
        .orderBy($"hr")) == stream,
      "a redelivered batch must replace its own partials exactly")
  }

  test("q91 streaming gap quantiles equals the batch q86 on the in-order " +
      "feed (phantom bridge + mergeable census cells), and a drained " +
      "re-run is a no-op") {
    val dir = "/root/testdata/sf0.001"
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val stream = snap(Queries.q91_stream_gap_quantiles(spark, dir))
    assert(stream == snap(Queries.q86_gap_quantiles(spark, dir)),
      s"streamed gap census (${stream.size} types) != batch")
    assert(snap(Queries.q91_stream_gap_quantiles(spark, dir)) == stream,
      "drained replay must not change the card")
  }

  test("q92 streaming Bollinger equals the batch q88 on the in-order " +
      "feed (bounded-lookback carry-in + mergeable counters), and a " +
      "drained re-run is a no-op") {
    val dir = "/root/testdata/sf0.001"
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val stream = snap(Queries.q92_stream_bollinger(spark, dir))
    assert(stream == snap(Queries.q88_bollinger(spark, dir)),
      s"streamed Bollinger (${stream.size} users) != batch")
    assert(snap(Queries.q92_stream_bollinger(spark, dir)) == stream,
      "drained replay must not change the census")
  }

  test("mergeBollingerState: a breach whose window STRADDLES the batch " +
      "boundary flags exactly once (19 carried rows + 1 batch row), " +
      "phantoms are never re-counted, and a boundary-splicing row " +
      "fails fast") {
    val base = s"/tmp/graft_boll_spec/${System.nanoTime()}"
    val sp = s"$base/state"
    new java.io.File(base).mkdirs()
    def b(rows: (Long, Long, Long, Long)*) =
      rows.toSeq.toDF("k", "t", "i", "x")
    // batch 0: 20 flat rows (1000 cents) — row 20's window is flat
    // (dev 0, no flag); n_events 20, tail = last 19
    streaming.Streams.mergeBollingerState(
      b((1 to 20).map(j => (1L, j * 1000L, j.toLong, 1000L)): _*),
      0L, sp)
    def state() = spark.read.parquet(sp)
      .select($"k", $"n_up", $"n_dn", $"n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(state() == Seq((1L, 0L, 0L, 20L)), state().toString)
    assert(spark.read.parquet(sp).select(size($"tail")).head().getInt(0)
      == 19, "tail must carry the last 19 rows")
    // batch 1: ONE deviant row — its window = 19 carried flat rows +
    // itself, the hand-checked 361(x-v)^2 > 76(x-v)^2 up-breach; the
    // carried rows' own windows must NOT re-count
    streaming.Streams.mergeBollingerState(
      b((1L, 21000L, 21L, 1100L)), 1L, sp)
    assert(state() == Seq((1L, 1L, 0L, 21L)), state().toString)
    // boundary splice: t equal to the stored max with smaller eid
    // would change already-counted windows -> abort, state untouched
    val e = intercept[IllegalArgumentException] {
      streaming.Streams.mergeBollingerState(
        b((1L, 21000L, 20L, 999L)), 2L, sp)
    }
    assert(e.getMessage.contains("strictly after"), e.getMessage)
    assert(state() == Seq((1L, 1L, 0L, 21L)),
      "a failed merge touched the state")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("mergeGapState: the bridge gap is priced by the phantom exactly " +
      "once, redelivered batches are no-ops, out-of-order and id-reuse " +
      "fail fast BEFORE any census write") {
    val base = s"/tmp/graft_gap_spec/${System.nanoTime()}"
    val (cp, sp) = (s"$base/census", s"$base/state")
    new java.io.File(base).mkdirs()
    def b(rows: (Long, Long, Long, String)*) =
      rows.toSeq.toDF("user_id", "tus", "eid", "etype")
    // batch 0: user 1 at t=1000 (click) then t=3000 (view): one
    // in-batch gap 2000 attributed to click; view stays open
    streaming.Streams.mergeGapState(
      b((1L, 1000L, 1L, "click"), (1L, 3000L, 2L, "view")), 0L, cp, sp)
    def cells() = spark.read.parquet(s"$cp/cells").distinct()
      .select($"event_type", $"__v", $"__n", $"__batch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(cells() == Seq(("click", 2000L, 1L, 0L)), cells().toString)
    // batch 1: user 1 at t=7000 — the BRIDGE gap 4000 must emit under
    // the stored view's type, exactly once
    streaming.Streams.mergeGapState(
      b((1L, 7000L, 3L, "buy")), 1L, cp, sp)
    assert(cells() == Seq(("click", 2000L, 1L, 0L),
      ("view", 4000L, 1L, 1L)), cells().toString)
    // redelivered batch 1 (crash between census append and checkpoint
    // commit): exactly-once — the fold is unchanged
    streaming.Streams.mergeGapState(
      b((1L, 7000L, 3L, "buy")), 1L, cp, sp)
    assert(cells() == Seq(("click", 2000L, 1L, 0L),
      ("view", 4000L, 1L, 1L)), "redelivery changed the census")
    // out-of-order: t=5000 precedes the stored last (7000) -> abort,
    // census untouched
    val e1 = intercept[IllegalArgumentException] {
      streaming.Streams.mergeGapState(
        b((1L, 5000L, 9L, "x")), 2L, cp, sp)
    }
    assert(e1.getMessage.contains("out-of-order"), e1.getMessage)
    // id reuse across batches -> abort
    val e2 = intercept[IllegalArgumentException] {
      streaming.Streams.mergeGapState(
        b((1L, 9000L, 3L, "x")), 2L, cp, sp)
    }
    assert(e2.getMessage.contains("recurred"), e2.getMessage)
    assert(cells() == Seq(("click", 2000L, 1L, 0L),
      ("view", 4000L, 1L, 1L)), "a failed merge touched the census")
    // same-µs boundary tie: eid 4 at the stored last µs (7000) sorts
    // AFTER the phantom? No — eid 4 > 3, so phantom(7000,3) leads to
    // (7000,4): bridge gap 0 under the stored buy; then eid 4 opens
    streaming.Streams.mergeGapState(
      b((1L, 7000L, 4L, "tie")), 2L, cp, sp)
    assert(cells().contains(("buy", 0L, 1L, 2L)), cells().toString)
    // lineage mismatch: a batch id BELOW the committed stamp is NOT a
    // crash replay (only the exact last batch can be) — a reset
    // checkpoint restarting at 0 must abort loudly, never silently
    // skip unfolded events (round-18 self-review)
    val e3 = intercept[IllegalArgumentException] {
      streaming.Streams.mergeGapState(
        b((1L, 99000L, 50L, "x")), 0L, cp, sp)
    }
    assert(e3.getMessage.contains("lineage"), e3.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("drawdownIngest merge: the stored-peak phantom seeds the running " +
      "peak, the phantom never steals a zero-drawdown argmax tie, and " +
      "key-max merging keeps the FIRST max-attaining event") {
    val base = s"/tmp/graft_dd_spec/${System.nanoTime()}"
    val statePath = s"$base/state"
    new java.io.File(base).mkdirs()
    def b(rows: (Long, Long, Long, Long)*) =
      rows.toSeq.toDF("k", "t", "i", "vq")
    // batch 1: peak 1000, dd 600 at eid 2
    streaming.Streams.mergeDrawdownState(
      b((1L, 10L, 1L, 1000L), (1L, 20L, 2L, 400L)), 0L, statePath)
    // batch 2: vq 1000 == stored peak → dd 0; the PHANTOM also has
    // dd 0 but must not become the argmax for a fresh user... and the
    // 600 record must survive the merge (key-max)
    streaming.Streams.mergeDrawdownState(
      b((1L, 30L, 3L, 1000L), (1L, 40L, 4L, 700L)), 1L, statePath)
    val st = spark.read.parquet(statePath).collect().head
    assert(st.getAs[Long]("n") == 4L && st.getAs[Long]("peak_c") == 1000L)
    val bk = st.getAs[Long]("best_key")
    assert((bk >> 31) == 600L && ((1L << 31) - 1 - (bk & ((1L << 31) - 1)))
      == 2L, s"best_key $bk")
    // fresh user whose true max_dd is 0: the argmax must be its FIRST
    // event, not a phantom
    streaming.Streams.mergeDrawdownState(
      b((2L, 10L, 9L, 500L), (2L, 20L, 10L, 600L)), 2L, statePath)
    val u2 = spark.read.parquet(statePath).collect()
      .find(_.getAs[Long]("k") == 2L).get
    val bk2 = u2.getAs[Long]("best_key")
    assert((bk2 >> 31) == 0L &&
      ((1L << 31) - 1 - (bk2 & ((1L << 31) - 1))) == 9L, s"u2 key $bk2")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("emaIngest state merge: the phantom carry-in SEEDS the chain " +
      "(Ema's first-row rule), and any at-or-before row fail-fasts — " +
      "EMA has no same-µs tolerance") {
    val base = s"/tmp/graft_ema_spec/${System.nanoTime()}"
    val (statePath, resultPath) = (s"$base/state", s"$base/result")
    new java.io.File(base).mkdirs()
    def b(rows: (Long, Long, Long, Double)*) =
      rows.toSeq.toDF("k", "t", "i", "v")
    streaming.Streams.mergeEmaState(
      b((1L, 10L, 100L, 4.0), (1L, 20L, 101L, 8.0)), 0L, 1, 2,
      statePath, resultPath)
    // state now (k=1, t=20, i=101, ema=(8+4)/2=6); next batch chains
    streaming.Streams.mergeEmaState(
      b((1L, 30L, 102L, 2.0)), 1L, 1, 2, statePath, resultPath)
    val got = spark.read.parquet(resultPath)
      .orderBy($"k", $"i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 100L, 4.0), (1L, 101L, 6.0), (1L, 102L, 4.0)),
      got.toString) // (2 + 6)/2 = 4 — seeded by the stored EMA
    // same-t row with a lower id re-orders the chain → fail fast
    val e = intercept[IllegalArgumentException] {
      streaming.Streams.mergeEmaState(
        b((1L, 30L, 99L, 1.0)), 2L, 1, 2, statePath, resultPath)
    }
    assert(e.getMessage.contains("out-of-order"), e.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("twapIngest state merge: the phantom carry-in prices the " +
      "cross-batch bridge (incl. the same-µs boundary tie), untouched " +
      "users keep their state, and an out-of-order feed fail-fasts") {
    val statePath = s"/tmp/graft_twap_spec/${System.nanoTime()}/state"
    new java.io.File(statePath).getParentFile.mkdirs()
    def b(rows: (Long, Long, Long, Long)*) =
      rows.toSeq.toDF("user_id", "tus", "vq", "eid")
    // batch 1: user 1 one event; user 2 two events (interval 5µs @ vq 40)
    streaming.Streams.mergeTwapState(
      b((1L, 1000L, 100L, 10L), (2L, 500L, 40L, 1L), (2L, 505L, 70L, 2L)),
      0L, statePath)
    // batch 2 (user 1 only): starts at the SAME µs as the stored last
    // event with a LOWER event_id — it sorts BEFORE the phantom, so its
    // own dt is 0 and the bridge to t=2000 prices at the STORED event's
    // vq, exactly as the batch window would order them
    streaming.Streams.mergeTwapState(
      b((1L, 1000L, 200L, 5L), (1L, 2000L, 300L, 20L)), 1L, statePath)
    val st = spark.read.parquet(statePath).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val u1 = st(1L)
    // true order: (1000,5,200) → (1000,10,100) → (2000,20,300)
    // num = 0·200 + 1000·100 = 100000; n=3; first=1000; last=(2000,20,300)
    assert(u1.getAs[Long]("n") == 3L)
    assert(u1.getAs[Long]("first_tus") == 1000L)
    assert(u1.getAs[Long]("last_tus") == 2000L &&
      u1.getAs[Long]("last_eid") == 20L && u1.getAs[Long]("last_vq") == 300L)
    assert(u1.getAs[java.math.BigDecimal]("num").longValueExact == 100000L)
    // user 2 had no batch-2 rows: state identical (carry-only merge)
    val u2 = st(2L)
    assert(u2.getAs[Long]("n") == 2L &&
      u2.getAs[Long]("first_tus") == 500L &&
      u2.getAs[Long]("last_tus") == 505L &&
      u2.getAs[java.math.BigDecimal]("num").longValueExact == 5L * 40L)
    // out-of-order: a row strictly before user 1's stored last event
    val e = intercept[Exception] {
      streaming.Streams.mergeTwapState(b((1L, 1500L, 50L, 30L)), 2L,
        statePath)
    }
    assert(e.getMessage != null && e.getMessage.contains("out-of-order")
      || Option(e.getCause).exists(_.getMessage.contains("out-of-order")),
      s"wanted the out-of-order fail-fast, got $e")
    // id reuse across batches = duplicate delivery the summary state
    // would re-count (round-17 review) — user 1's stored last eid is 20
    val er = intercept[IllegalArgumentException] {
      streaming.Streams.mergeTwapState(b((1L, 3000L, 50L, 20L)), 3L,
        statePath)
    }
    assert(er.getMessage.contains("recurred"), er.getMessage)
  }

  test("scan-ingest merges are EXACTLY-ONCE through both crash windows: " +
      "a batch replayed after the state swap is a no-op (batch-stamp " +
      "skip, not a guard trip), and one replayed after the result write " +
      "but before the swap overwrites its own result partition — final " +
      "state and results bit-equal to the uninterrupted run") {
    val base = s"/tmp/graft_xonce_spec/${System.nanoTime()}"
    val (statePath, resultPath) = (s"$base/state", s"$base/result")
    new java.io.File(base).mkdirs()
    def b(rows: (Long, Long, Long, Double)*) =
      rows.toSeq.toDF("k", "t", "i", "v")
    def snapState() = spark.read.parquet(statePath)
      .collect().map(_.toString).sorted.toSeq
    def snapResult() = spark.read.parquet(resultPath)
      .select($"k", $"i", $"ema").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    streaming.Streams.mergeEmaState(
      b((1L, 10L, 100L, 4.0)), 0L, 1, 2, statePath, resultPath)
    // crash window A: state swapped, checkpoint commit lost → the SAME
    // batch id redelivers. Pre-stamp this tripped the id-reuse guard
    // (manual recovery); now it must be a silent no-op.
    val (s1, r1) = (snapState(), snapResult())
    streaming.Streams.mergeEmaState(
      b((1L, 10L, 100L, 4.0)), 0L, 1, 2, statePath, resultPath)
    assert(snapState() == s1 && snapResult() == r1,
      "replay after swap must be a no-op")
    // crash window B: batch 1's RESULT was written but the crash hit
    // before the state swap — simulate by merging batch 1, then
    // restoring the pre-merge state (results stay on disk), then
    // redelivering batch 1
    val saved = new java.io.File(s"$base/state_saved")
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(statePath), saved)
    streaming.Streams.mergeEmaState(
      b((1L, 20L, 101L, 8.0)), 1L, 1, 2, statePath, resultPath)
    val (s2, r2) = (snapState(), snapResult())
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(statePath))
    org.apache.commons.io.FileUtils.copyDirectory(
      saved, new java.io.File(statePath))
    streaming.Streams.mergeEmaState(
      b((1L, 20L, 101L, 8.0)), 1L, 1, 2, statePath, resultPath)
    assert(snapState() == s2, "self-healed state must equal the " +
      "uninterrupted run's")
    assert(snapResult() == r2, "the replayed batch must OVERWRITE its " +
      "result partition, not append duplicates")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("scan-ingest merges fail fast on duplicate (k, i) rows WITHIN " +
      "one micro-batch (they'd slip past the cross-batch guards and " +
      "silently diverge the fold)") {
    val base = s"/tmp/graft_bdup_spec/${System.nanoTime()}"
    new java.io.File(base).mkdirs()
    val e = intercept[IllegalArgumentException] {
      streaming.Streams.mergeEmaState(
        Seq((1L, 10L, 100L, 4.0), (1L, 10L, 100L, 9.0))
          .toDF("k", "t", "i", "v"),
        0L, 1, 2, s"$base/state", s"$base/result")
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    val et = intercept[IllegalArgumentException] {
      streaming.Streams.mergeTwapState(
        Seq((1L, 10L, 5L, 100L), (1L, 20L, 7L, 100L))
          .toDF("user_id", "tus", "vq", "eid"),
        0L, s"$base/tstate")
    }
    assert(et.getMessage.contains("duplicate"), et.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("state writes fan out past stateMaxFileRows and read back " +
      "identically (no single-task write at large key cardinality)") {
    val base = s"/tmp/graft_mfile_spec/${System.nanoTime()}"
    val statePath = s"$base/state"
    new java.io.File(base).mkdirs()
    val old = streaming.Streams.stateMaxFileRows
    try {
      streaming.Streams.stateMaxFileRows = 2L
      def b(ks: Range, t: Long, i0: Long) =
        ks.map(k => (k.toLong, t, i0 + k, 1.0 * k)).toDF("k", "t", "i", "v")
      streaming.Streams.mergeEmaState(b(1 to 7, 10L, 100L), 0L, 1, 2,
        statePath, s"$base/result")
      // merge 2 sizes off merge 1's 7 rows → ceil-ish fan-out > 1 file
      streaming.Streams.mergeEmaState(b(1 to 7, 20L, 200L), 1L, 1, 2,
        statePath, s"$base/result")
      val parts = new java.io.File(statePath).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(parts > 1, s"expected multi-file state, got $parts part(s)")
      val st = spark.read.parquet(statePath)
        .select($"k", $"last_t", $"last_i", $"last_ema").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sorted.toSeq
      assert(st == (1 to 7).map(k =>
        (k.toLong, 20L, 200L + k, (1.0 * k + 1.0 * k) / 2)).toSeq, st)
    } finally streaming.Streams.stateMaxFileRows = old
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("scan-ingest state read fail-fasts on a TORN swap (.old/.tmp " +
      "siblings without a live root) instead of silently refolding " +
      "from empty") {
    val base = s"/tmp/graft_torn_spec/${System.nanoTime()}"
    val statePath = s"$base/state"
    new java.io.File(s"$statePath.old").mkdirs() // crash artifact
    val e = intercept[IllegalArgumentException] {
      streaming.Streams.mergeTwapState(
        Seq((1L, 1L, 1L, 1L)).toDF("user_id", "tus", "vq", "eid"),
        0L, statePath)
    }
    assert(e.getMessage.contains("torn state swap"), e.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("durable-store readers fail fast when a SECOND OWNER holds the " +
      "store lock (concurrent checkpoint access is unsupported — abort, " +
      "never corrupt)") {
    val base = s"/tmp/graft_lock_spec/${System.nanoTime()}"
    val outPath = s"$base/store"
    new java.io.File(base).mkdirs()
    val ch = java.nio.channels.FileChannel.open(
      new java.io.File(s"$base/ckpt.lock").toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = ch.lock() // the planted second owner
    try {
      val e = intercept[IllegalArgumentException] {
        streaming.Streams.tumblingCounts(spark, s"$base/feed",
          Seq((1L, 1L)).toDF("k", "v"), "ts", "k", "v", 60, "lock_spec",
          outPath, s"$base/ckpt")
      }
      assert(e.getMessage.contains("owned by another live"), e.getMessage)
    } finally { lock.release(); ch.close() }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("durable-store readers fail fast on a checkpoint DELETED out " +
      "from under a kept store (batch ids would reset to 0) — the " +
      "mirror of the lost-store guard") {
    val base = s"/tmp/graft_mirror_spec/${System.nanoTime()}"
    val outPath = s"$base/store"
    // a store that clearly fired before, with no checkpoint at all
    new java.io.File(s"$outPath/__batch=3").mkdirs()
    val e = intercept[IllegalArgumentException] {
      streaming.Streams.tumblingCounts(spark, s"$base/feed",
        Seq((1L, 1L)).toDF("k", "v"), "ts", "k", "v", 60, "mirror_spec",
        outPath, s"$base/ckpt")
    }
    assert(e.getMessage.contains("no offsets WAL"), e.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
