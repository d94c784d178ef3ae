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

  test("q75 watermarked funnel: the query's own run evicts join state " +
      "(bounded-state production form) AND matches the unwatermarked " +
      "q56 pair set exactly on the in-order feed") {
    val dir = "/root/testdata/sf0.001"
    val wm = Queries.q75_stream_funnel_watermarked(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val qn = "graft_wmjoin_" + math.abs(dir.hashCode)
    val removed = streaming.Streams.lastStateRowsRemoved.getOrElse(qn, 0L)
    assert(removed > 0,
      s"the multi-batch watermarked run must evict state, removed=$removed")
    val batch = Queries.q56_stream_interval_join(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(wm == batch, s"watermarked (${wm.size}) != batch (${batch.size})")
  }
}
