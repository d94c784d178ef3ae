package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Stateful streaming: per-user sessionization with flatMapGroupsWithState
  * on a controlled fixture with known session structure. */
class StatefulStreamSpec extends SparkSpec {
  import spark.implicits._

  test("sessionizeStream emits closed sessions, keeps open ones in state") {
    val gapUs = 1000000L // 1s
    // user 1: two sessions (0-2, 10); user 2: one session
    val fixture = Seq(
      (1L, 0L), (1L, 500000L), (1L, 900000L), // session A: 3 events
      (1L, 10000000L),                        // session B (open at end)
      (2L, 0L), (2L, 100000L)                 // session C (open at end)
    ).toDF("user_id", "ts_us")
    val dir = "/tmp/graft_test_stream_sess"
    fixture.write.mode("overwrite").parquet(dir)

    val got = Streams.sessionizeStream(spark, dir, fixture, gapUs,
      "sess_test", identity)
    // only session A closed (a later event arrived after the gap)
    val rows = got.orderBy($"user_id", $"start_us").collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 1L)
    assert(rows(0).getLong(1) == 0L && rows(0).getLong(2) == 900000L)
    assert(rows(0).getInt(3) == 3)
  }

  test("dedupCounts: streamed dropDuplicates census equals the batch " +
      "COUNT(DISTINCT) on planted duplicates") {
    val fixture = Seq(
      (1L, "click"), (1L, "click"), (1L, "click"), // dup key ×3
      (2L, "click"), (1L, "view"), (2L, "view"),
      (2L, "view"), (3L, "view")
    ).toDF("user_id", "event_type")
    val base = s"/tmp/graft_test_stream_dedup/${System.nanoTime()}"
    val dir = s"$base/feed"
    fixture.write.mode("overwrite").parquet(dir)
    def run() = Streams.dedupCounts(spark, dir, fixture,
      keyCols = Seq("user_id", "event_type"), outKey = "event_type",
      queryName = "sdedup_test",
      outPath = s"$base/out", checkpoint = s"$base/ckpt")
      .orderBy($"event_type").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(run().toSeq == Seq(("click", 2L), ("view", 3L)))
    // warm re-run: planned restart reads the durable complete store
    assert(run().toSeq == Seq(("click", 2L), ("view", 3L)))
  }
}
