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
}
