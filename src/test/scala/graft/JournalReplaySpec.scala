package graft

import org.apache.spark.sql.functions._

/** Journal semantics (reference hopen/write append + read replay,
  * `/root/reference/core/io.c:144-366`, `examples/journal.rfl`): the
  * streaming file source treats a directory as an append journal —
  * new files picked up per micro-batch, aggregates updated. */
class JournalReplaySpec extends SparkSpec {
  import spark.implicits._

  test("appended journal files are replayed incrementally") {
    val dir = "/tmp/graft_test_journal"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val batch1 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    batch1.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batch1.schema).parquet(dir)
      .groupBy($"k").agg(sum($"v").as("s"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("journal_test").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("journal_test").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after1 == Map("a" -> 1L, "b" -> 2L))

      // append a second journal segment (no overwrite)
      Seq(("a", 10L), ("c", 5L)).toDF("k", "v")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val after2 = spark.table("journal_test").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after2 == Map("a" -> 11L, "b" -> 2L, "c" -> 5L))
    } finally q.stop()
  }
}
