package graft

import org.apache.spark.sql.functions._
import graft.sources.Store

/** Storage round-trips (splayed/parted → Parquet) and streaming parity. */
class StorageStreamSpec extends SparkSpec {
  import spark.implicits._

  test("parted write/read: partition filter prunes at plan level") {
    val li = Tables.load(spark, sf, "lineitem")
      .withColumn("ship_month", date_format($"l_shipdate", "yyyy-MM"))
    val path = "/tmp/graft_test_parted"
    Store.setParted(li, path, "ship_month")
    val filtered = Store.getParted(spark, path).filter($"ship_month" === "1995-03")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert(plan.contains("ship_month"), plan.take(500))
    // pruned scan reads strictly fewer rows than the full table
    val full = Store.getParted(spark, path).count()
    assert(filtered.count() < full && filtered.count() > 0)
  }

  test("salted parted write fans a hot partition into parallel files") {
    val li = Tables.load(spark, sf, "lineitem")
      .withColumn("flag", $"l_returnflag") // 3 hot partitions
    val path = "/tmp/graft_test_parted_salted"
    Store.setParted(li, path, "flag", filesPerPartition = 4)
    val perPart = Store.getParted(spark, path)
      .select(input_file_name().as("f"), $"flag")
      .groupBy($"flag").agg(countDistinct($"f").as("nf")).collect()
      .map(r => r.getLong(1))
    assert(perPart.forall(n => n > 1 && n <= 4), perPart.toSeq.toString)
    // content identical to the unsalted write
    assert(Store.getParted(spark, path).count() == li.count())
  }

  test("lshIngest: drained replay appends nothing; duplicate appends " +
      "leave the probe candidate set unchanged (exactly-once pairs)") {
    import graft.operators.Dedup
    val base = java.nio.file.Files.createTempDirectory("lshing").toString
    val docs = Tables.load(spark, sf, "documents")
    Store.setSplayed(docs, s"$base/feed")
    val idx = s"$base/index"
    Dedup.buildLshIndex(docs.filter($"doc_id" % 4 < 2), "doc_id", "text",
      16, 2, idx)
    def ingest(): Unit = streaming.Streams.lshIngest(spark, s"$base/feed",
      docs, "doc_id", "text", idx, s"$base/ckpt",
      where = Some("doc_id % 4 = 2"))
    ingest()
    val rows1 = spark.read.parquet(s"$idx/buckets").count()
    ingest() // drained replay: checkpoint skips the seen files
    assert(spark.read.parquet(s"$idx/buckets").count() == rows1,
      "drained replay must append nothing")
    def pairs() = Dedup.probeLshIndex(docs.filter($"doc_id" % 4 === 3),
      "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairs()
    // an at-least-once REPLAYED batch = duplicate signature rows; the
    // candidate set must not change
    Dedup.appendToLshIndex(docs.filter($"doc_id" % 4 === 2), "doc_id",
      "text", idx)
    assert(spark.read.parquet(s"$idx/buckets").count() > rows1)
    assert(pairs() == p1, "duplicate append changed the candidate set")
  }

  test("compactParquet: many small appended files rewrite into few, " +
      "the hive partition layout survives, probe results are " +
      "identical, and the unpartitioned store compacts too") {
    import graft.operators.Dedup
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val docs = Tables.load(spark, sf, "documents")
    val idx = s"$base/index"
    Dedup.buildLshIndex(docs.filter($"doc_id" % 8 === 0), "doc_id", "text",
      16, 2, idx)
    // 6 incremental appends → small-files accumulation
    (1 to 6).foreach(i =>
      Dedup.appendToLshIndex(docs.filter($"doc_id" % 8 === i), "doc_id",
        "text", idx))
    def pairs() = Dedup.probeLshIndex(docs.filter($"doc_id" % 8 === 7),
        "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def rows() = spark.read.parquet(s"$idx/buckets")
      .collect().map(_.toString).sorted.toSeq
    val (p1, r1) = (pairs(), rows())
    val (before, after) = Store.compactParquet(spark, s"$idx/buckets",
      partitionCols = Seq("band"))
    assert(after < before, s"no compaction: $before -> $after")
    assert(after <= 2, s"one file per band partition expected, got $after")
    // partition layout survives (band= dirs still prune)
    assert(new java.io.File(s"$idx/buckets/band=0").isDirectory)
    assert(rows() == r1, "row set changed")
    assert(pairs() == p1, "probe changed after compaction")
    // partitionCols OMITTED: the layout is inferred from the band=
    // directory structure instead of silently flattening it
    Dedup.appendToLshIndex(docs.filter($"doc_id" % 8 === 6), "doc_id",
      "text", idx)
    val (p2r, r2x) = (pairs(), rows())
    Store.compactParquet(spark, s"$idx/buckets")
    assert(new java.io.File(s"$idx/buckets/band=0").isDirectory,
      "inferred layout must survive a no-args compaction")
    assert(rows() == r2x && pairs() == p2r)
    // unpartitioned dataset
    val flat = s"$base/flat"
    (0 to 4).foreach(i => docs.filter($"doc_id" % 5 === i)
      .select($"doc_id", $"lang").repartition(3)
      .write.mode("append").parquet(flat))
    val fr1 = spark.read.parquet(flat).collect().map(_.toString).sorted.toSeq
    val (fb, fa) = Store.compactParquet(spark, flat)
    assert(fa < fb && fa == 1, s"$fb -> $fa")
    assert(spark.read.parquet(flat).collect()
      .map(_.toString).sorted.toSeq == fr1)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("streaming semantic decontamination equals the batch report " +
      "bit-for-bit and a drained replay appends nothing") {
    import graft.operators.Decontam
    val base = java.nio.file.Files.createTempDirectory("semdec").toString
    val emb = Tables.load(spark, sf, "embeddings")
    val corpus = emb.filter($"vec_id" % 83 =!= 0)
      .select($"vec_id", $"embedding")
    val benchDf = emb.filter($"vec_id" % 83 === 0)
    corpus.write.parquet(s"$base/feed")
    val bench = Decontam.collectSemBench(benchDf, "vec_id", "embedding")
    def run() = streaming.Streams.semDecontamStream(spark, s"$base/feed",
      corpus, "vec_id", "embedding", bench, tau = 0.35,
      s"$base/out", s"$base/ckpt")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    val streamed = rows(run())
    val batch = rows(Decontam.semReport(corpus, "vec_id", "embedding",
      benchDf, "vec_id", "embedding", tau = 0.35))
    assert(streamed == batch, "stream must equal batch")
    assert(run().count() == batch.length.toLong,
      "drained replay must append nothing")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("csv round-trip preserves typed columns exactly") {
    val nation = Tables.load(spark, sf, "nation")
    val path = "/tmp/graft_test_csv"
    Store.writeCsv(nation, path)
    val back = Store.readCsv(spark, path, nation.schema)
    assert(back.schema == nation.schema)
    assert(back.count() == nation.count())
    assert(back.except(nation).isEmpty && nation.except(back).isEmpty)
  }

  test("streaming tumbling agg equals batch aggregation") {
    val got = Queries.q21_stream_tumbling(spark, sf)
    val batch = Queries.q09_xbar_time(spark, sf) // same hour buckets, no type split
    // streaming result re-aggregated over hour must equal batch xbar query
    val streamHours = got.groupBy($"hour_epoch")
      .agg(sum($"n").as("n"), round(sum($"sum_value"), 2).as("sv"))
      .orderBy($"hour_epoch")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batchHours = batch.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamHours.toSeq == batchHours.toSeq)
  }

  test("streaming span removal equals the batch ExactSubstr, and a " +
      "checkpointed replay over the drained feed appends nothing") {
    val docs = Tables.load(spark, sf, "documents")
    val base = s"/tmp/graft_spanstream_spec/${System.nanoTime()}"
    val (feed, outDir, ckpt) = (s"$base/feed", s"$base/out", s"$base/ckpt")
    docs.write.parquet(feed)
    def run() = streaming.Streams.spanRemoveStream(spark, feed, docs,
      "doc_id", "text", n = 3,
      freqOf = ss => operators.CorpusStats.frequentGrams(
        Tables.load(ss, sf, "documents"), "doc_id", "text", 3, 5),
      outDir = outDir, checkpoint = ckpt)
    val streamed = run().orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(4), r.getLong(3)))
    val batch = operators.CorpusStats
      .dupSpanRemove(docs, "doc_id", "text", n = 3, minDocs = 5)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(4), r.getLong(3)))
    assert(streamed.toSeq == batch.toSeq)
    // drained replay: completed batch ids skip, nothing re-appends
    assert(run().count() == batch.length.toLong)
    // an EMPTY feed yields the empty cleaned corpus with the right
    // schema instead of failing on the unwritten output dir
    val emptyBase = s"$base/empty"
    new java.io.File(s"$emptyBase/feed").mkdirs()
    val empty = streaming.Streams.spanRemoveStream(spark,
      s"$emptyBase/feed", docs, "doc_id", "text", n = 3,
      freqOf = ss => operators.CorpusStats.frequentGrams(
        Tables.load(ss, sf, "documents"), "doc_id", "text", 3, 5),
      outDir = s"$emptyBase/out", checkpoint = s"$emptyBase/ckpt")
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("id", "ntok", "nspans",
      "tok_removed", "clean_text", "chars_removed"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("streaming LM quality equals batch scoring from the persisted " +
      "model; drained replay appends nothing; empty feed yields the " +
      "empty scored schema") {
    val docs = Tables.load(spark, sf, "documents")
    val base = s"/tmp/graft_lmstream_spec/${System.nanoTime()}"
    val (feed, model) = (s"$base/feed", s"$base/model")
    docs.write.parquet(feed)
    val lm = operators.NgramLm.fit(docs.filter($"lang" === "en"), "text")
    operators.NgramLm.saveModel(lm, model)
    def run(out: String, ckpt: String) =
      streaming.Streams.lmQualityStream(spark, feed, docs,
        "doc_id", "text", model, 24L, 5L, out, ckpt)
    val streamed = run(s"$base/out", s"$base/ckpt")
      .orderBy($"doc_id").collect().toSeq
    val batch = operators.NgramLm.score(docs, "doc_id", "text", lm, 24L, 5L)
      .orderBy($"doc_id").collect().toSeq
    assert(streamed == batch)
    assert(run(s"$base/out", s"$base/ckpt").count() == batch.length.toLong)
    val emptyBase = s"$base/empty"
    new java.io.File(s"$emptyBase/feed").mkdirs()
    val empty = streaming.Streams.lmQualityStream(spark,
      s"$emptyBase/feed", docs, "doc_id", "text", model, 24L, 5L,
      s"$emptyBase/out", s"$emptyBase/ckpt")
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq ==
      Seq("doc_id", "n_tok", "n_big", "s64", "bpt", "keep"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("streaming bloom decontamination equals the batch probe against " +
      "the persisted artifact; where routes the feed slice; drained " +
      "replay appends nothing; empty feed yields the report schema") {
    val docs = Tables.load(spark, sf, "documents")
    val base = s"/tmp/graft_bloomstream_spec/${System.nanoTime()}"
    val feed = s"$base/feed"
    docs.write.parquet(feed)
    val (n, k, mBits) = (3, 3, 1 << 16)
    val bf = operators.Decontam.buildBloomFilter(
      docs.filter($"doc_id" % 7 === 0), "text", n, k, mBits, s"$base/f")
    def run() = streaming.Streams.bloomDecontamStream(spark, feed, docs,
      "doc_id", "text", s"$base/f", s"$base/out", s"$base/ckpt",
      where = Some("doc_id % 7 <> 0"))
    val streamed = run().orderBy($"doc_id").collect().toSeq
    val batch = operators.Decontam.bloomReport(docs.filter($"doc_id" % 7 =!= 0),
        "doc_id", "text", n, k, mBits, bf.bits)
      .orderBy($"doc_id").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty, "fixture must flag something")
    assert(run().count() == batch.length.toLong) // checkpointed replay
    val emptyBase = s"$base/empty"
    new java.io.File(s"$emptyBase/feed").mkdirs()
    val empty = streaming.Streams.bloomDecontamStream(spark,
      s"$emptyBase/feed", docs, "doc_id", "text", s"$base/f",
      s"$emptyBase/out", s"$emptyBase/ckpt")
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("doc_id", "n_bloom"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("streaming HLL ingest: census from the store equals the batch " +
      "census; a replayed/duplicate append changes NOTHING (max-merge " +
      "idempotence); append to a missing store fails fast") {
    val li = Tables.load(spark, sf, "lineitem")
    val base = s"/tmp/graft_hllstream_spec/${System.nanoTime()}"
    val feed = s"$base/feed"
    li.write.parquet(feed)
    val store = s"$base/store"
    operators.Hll.buildHllStore(li.limit(0),
      Seq("l_returnflag"), "l_orderkey", logM = 8, store)
    streaming.Streams.hllIngest(spark, feed, li, store, s"$base/ckpt")
    def censusNow() = operators.Hll.censusFromStore(spark, store)
      .orderBy($"l_returnflag").collect().toSeq
    val streamed = censusNow()
    val batch = operators.Hll.census(li, Seq("l_returnflag"),
      "l_orderkey", logM = 8).orderBy($"l_returnflag").collect().toSeq
    assert(streamed == batch)
    // checkpointed replay appends nothing...
    streaming.Streams.hllIngest(spark, feed, li, store, s"$base/ckpt")
    assert(censusNow() == batch)
    // ...and even a FORCED duplicate append changes nothing (MAX)
    operators.Hll.appendToHllStore(li, store)
    assert(censusNow() == batch)
    val miss = intercept[IllegalArgumentException] {
      operators.Hll.appendToHllStore(li, s"$base/nowhere")
    }
    assert(miss.getMessage.contains("buildHllStore"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("quantile-census store: cuts from the store equal the batch " +
      "census; an incremental batch append updates them exactly; a " +
      "REPLAYED batch id is a read-time no-op; missing store fails fast") {
    import graft.operators.Quantiles
    val li = Tables.load(spark, sf, "lineitem")
    val a = li.filter($"l_orderkey" % 3 =!= 0L)
    val b = li.filter($"l_orderkey" % 3 === 0L)
    val base = s"/tmp/graft_qcensus_spec/${System.nanoTime()}"
    val store = s"$base/store"
    val ps = Seq(50, 90, 99)
    def cuts() = Quantiles.quantilesFromStore(spark, store, ps)
      .orderBy($"l_returnflag").collect()
      .map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap
    def batchCuts(df: org.apache.spark.sql.DataFrame) =
      Quantiles.quantileCensus(df, Seq("l_returnflag"), "l_quantity", ps)
        .orderBy($"l_returnflag").collect()
        .map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap
    Quantiles.buildCensusStore(a, Seq("l_returnflag"), "l_quantity", store)
    assert(cuts() == batchCuts(a))
    Quantiles.appendToCensusStore(b, store, batchId = 7L)
    assert(cuts() == batchCuts(li), "merged store != full-corpus census")
    // replayed batch id: byte-identical cells collapse at read
    Quantiles.appendToCensusStore(b, store, batchId = 7L)
    assert(cuts() == batchCuts(li))
    // streaming ingest into a fresh store == batch over the same rows
    val feed = s"$base/feed"
    b.write.parquet(feed)
    val store2 = s"$base/store2"
    Quantiles.buildCensusStore(b.limit(0), Seq("l_returnflag"),
      "l_quantity", store2)
    streaming.Streams.censusIngest(spark, feed, b, store2, s"$base/ckpt")
    val s2 = Quantiles.quantilesFromStore(spark, store2, ps)
      .orderBy($"l_returnflag").collect()
      .map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap
    assert(s2 == batchCuts(b))
    // checkpointed replay: no change
    streaming.Streams.censusIngest(spark, feed, b, store2, s"$base/ckpt")
    assert(Quantiles.quantilesFromStore(spark, store2, ps)
      .orderBy($"l_returnflag").collect()
      .map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap == s2)
    val miss = intercept[IllegalArgumentException] {
      Quantiles.appendToCensusStore(li, s"$base/nowhere", 1L)
    }
    assert(miss.getMessage.contains("buildCensusStore"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("parameter-stamped streaming stages: a changed keep gate lands " +
      "in a FRESH stage dir with correct output — stale state never " +
      "pollutes, no manual cleanup") {
    // the t35 stamping wires every model/gate param + the source stamp
    // into the stage base, so any change self-invalidates
    val bA = Queries.lmStreamBase(sf, 1 << 16, 24L, 5L)
    assert(bA == Queries.lmStreamBase(sf, 1 << 16, 24L, 5L))
    assert(bA != Queries.lmStreamBase(sf, 1 << 16, 2L, 1L))
    assert(bA != Queries.lmStreamBase(sf, 1 << 15, 24L, 5L))
    // and behaviorally: run the stream at gate A, then at gate B in
    // its stamped dir — B's output must match BATCH at gate B (stale
    // A-state would leak A's keeps if the stages were shared)
    val docs = Tables.load(spark, sf, "documents")
    val base = s"/tmp/graft_lmstamp_spec/${System.nanoTime()}"
    val feed = s"$base/feed"
    docs.write.parquet(feed)
    val lm = operators.NgramLm.fit(docs.filter($"lang" === "en"), "text")
    def run(keepNum: Long, keepDen: Long) = {
      // the stamped layout: everything under one per-param dir
      val pbase = s"$base/lm_quality_v65536_k$keepNum-$keepDen"
      operators.NgramLm.saveModel(lm, s"$pbase/model")
      streaming.Streams.lmQualityStream(spark, feed, docs,
        "doc_id", "text", s"$pbase/model", keepNum, keepDen,
        s"$pbase/out", s"$pbase/ckpt")
        .orderBy($"doc_id").collect().toSeq
    }
    def batch(keepNum: Long, keepDen: Long) =
      operators.NgramLm.score(docs, "doc_id", "text", lm,
        keepNum, keepDen).orderBy($"doc_id").collect().toSeq
    val a = run(24L, 5L)
    val b = run(2L, 1L)
    assert(a == batch(24L, 5L))
    assert(b == batch(2L, 1L))
    assert(a != b, "gates must differ for the isolation check to bite")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
