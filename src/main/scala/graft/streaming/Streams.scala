package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming parity (SURVEY.md §2.10). The reference "streams" by
  * repeatedly `insert`ing into live tables from timers/IPC callbacks and
  * journaling appends for replay (`/root/reference/core/update.c:414`,
  * `core/chrono.c:361`, `examples/journal.rfl`). Structured Streaming
  * covers that surface: file/rate sources are the insert feed, tumbling
  * `window()` aggregation is `xbar`+`by:`, checkpoints are the journal,
  * and watermarks handle late data (a capability the reference lacks).
  */
object Streams {

  /** Micro-batch ingest of a parquet directory as a stream (the
    * insert-driven live table), tumbling-window aggregated, materialized
    * to an in-memory table. Synchronous: processes everything available,
    * then returns the aggregate as a DataFrame.
    *
    * tsCol must be a TimestampType column; windows are `windowSec` wide.
    */
  def tumblingCounts(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                     tsCol: String, keyCol: String, valueCol: String,
                     windowSec: Int, queryName: String,
                     outPath: String, checkpoint: String,
                     prep: DataFrame => DataFrame = identity,
                     statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "tumblingCounts") {
    requireCkptMatchesStore(outPath, checkpoint, "tumblingCounts")
    // Run the stateful query in a cloned session with few shuffle
    // partitions: streaming state-store partitions = shuffle partitions,
    // and each one pays per-micro-batch snapshot/commit IO. The windowed
    // key space is tiny relative to the batch engine's partitioning
    // needs — size this to the stateful-key cardinality, not the batch
    // shuffle width. Measured floor at sf0.1 (TimeStream probe, warm):
    // width 8 ≈ 1.06 s, 4 ≈ 0.92, 2 ≈ 0.84, 1 ≈ 0.83 — the input scan
    // keeps its own parallelism either way (map-side partial agg does
    // the row work; only the 3600-key final merge + state commit runs at
    // this width), so past ~4 the commit overhead is the whole spread.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val stream = prep(ss.readStream.schema(schemaFrom.schema).parquet(srcDir))
    def aggOf(df: DataFrame) = df
      .groupBy(window(col(tsCol), s"$windowSec seconds"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
    val q = aggOf(stream).writeStream
      .outputMode("complete")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (out: DataFrame, bid: Long) =>
        writeCompleteBatch(out, bid, outPath)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    requireStoreMatchesCkpt(outPath, checkpoint, "tumblingCounts")
    // materialize INSIDE the lock: the returned frame must not lazily
    // re-read a partition a next owner may prune (bounded: the store is
    // the final aggregate, sized by key cardinality)
    readLatestBatch(spark, outPath).map(_.localCheckpoint()).getOrElse {
      aggOf(prep(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        schemaFrom.schema)))
    }
  }

  /** Streaming exact-dedup of the ingest path: `dropDuplicates` on the
    * key columns (state-store backed — the streaming twin of
    * `Dedup.exact`, deduping a journal/live feed as it arrives), then a
    * per-`outKey` census of the distinct keys. Unbounded state by
    * design here (the harness replays a bounded journal); a production
    * feed would add `withWatermark` so old fingerprints age out. */
  def dedupCounts(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                  keyCols: Seq[String], outKey: String, queryName: String,
                  outPath: String, checkpoint: String,
                  prep: DataFrame => DataFrame = identity,
                  statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "dedupCounts") {
    requireCkptMatchesStore(outPath, checkpoint, "dedupCounts")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val stream = prep(ss.readStream.schema(schemaFrom.schema).parquet(srcDir))
    def aggOf(df: DataFrame) = df
      .select(keyCols.map(col): _*)
      .dropDuplicates(keyCols)
      .groupBy(col(outKey))
      .agg(count(lit(1)).as("n_distinct"))
    val q = aggOf(stream).writeStream
      .outputMode("complete")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (out: DataFrame, bid: Long) =>
        writeCompleteBatch(out, bid, outPath)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    requireStoreMatchesCkpt(outPath, checkpoint, "dedupCounts")
    // materialize INSIDE the lock: the returned frame must not lazily
    // re-read a partition a next owner may prune (bounded: the store is
    // the final aggregate, sized by key cardinality)
    readLatestBatch(spark, outPath).map(_.localCheckpoint()).getOrElse {
      aggOf(prep(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        schemaFrom.schema)))
    }
  }

  /** Stream-static enrichment (the reference pattern: an insert-driven
    * live table joined against an in-memory dimension on every
    * callback): the streaming feed joins a BROADCAST static dimension —
    * Spark re-plans the broadcast hash join per micro-batch, no state
    * store is involved in the join itself — then aggregates. `dimOf`
    * builds the dimension against the cloned session (Datasets are
    * session-bound; a parent-session frame can't cross over). */
  def enrichedCounts(spark: SparkSession, srcDir: String,
                     schemaFrom: DataFrame, dimOf: SparkSession => DataFrame,
                     streamKey: String, dimKey: String, outKey: String,
                     valueCol: String, queryName: String,
                     outPath: String, checkpoint: String,
                     statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "enrichedCounts") {
    requireCkptMatchesStore(outPath, checkpoint, "enrichedCounts")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val stream = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val dim = broadcast(dimOf(ss))
    val agg = stream
      .join(dim, col(streamKey) === col(dimKey))
      .groupBy(col(outKey))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (out: DataFrame, bid: Long) =>
        writeCompleteBatch(out, bid, outPath)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    requireStoreMatchesCkpt(outPath, checkpoint, "enrichedCounts")
    // materialize INSIDE the lock: the returned frame must not lazily
    // re-read a partition a next owner may prune (bounded: the store is
    // the final aggregate, sized by key cardinality)
    readLatestBatch(spark, outPath).map(_.localCheckpoint()).getOrElse {
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          schemaFrom.schema)
        .join(broadcast(dimOf(spark)), col(streamKey) === col(dimKey))
        .groupBy(col(outKey))
        .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
    }
  }

  /** Continuous ANN-index maintenance: a streaming embeddings feed
    * appends to a persisted IVFADC index per micro-batch. foreachBatch
    * encodes each batch against the STORED model — no refit, the same
    * append rule as `Pq.appendToIvfPqIndex` — so each micro-batch
    * touches only its vectors' cell partitions. This closes the index
    * lifecycle at 100 TB: the batch build runs periodically, the
    * stream keeps the index current in between, searches see new
    * vectors at micro-batch latency. No state store is involved (the
    * index on disk IS the state). Delivery is AT-LEAST-ONCE: foreachBatch
    * re-executes an uncommitted micro-batch after a crash, and a plain
    * parquet append is not idempotent — a failure between the append and
    * the checkpoint commit can duplicate that one batch's rows (same
    * codes under the same ids; dedupe on id at read, or use a
    * transactional table format, if duplicates matter). A PLANNED
    * restart over a drained feed appends nothing — the checkpoint skips
    * completed batch ids (the spec pins that case). Synchronous like
    * every form here: drains what's available, then returns. */
  def ivfPqIngest(spark: SparkSession, srcDir: String,
                  schemaFrom: DataFrame, idCol: String, vecCol: String,
                  indexPath: String, checkpoint: String,
                  statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "ivfPqIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val stream = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Pq.appendToIvfPqIndex(batch, idCol, vecCol, indexPath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming ExactSubstr: clean a live document feed per micro-batch
    * against a STATIC frequent-gram set (the production split —
    * `CorpusStats.frequentGrams` runs over the reference corpus
    * periodically, the stream excises spans from today's feed against
    * the broadcast set at micro-batch latency). Stateless per batch (a
    * document's gram positions never leave its micro-batch), so no
    * state store is involved: foreachBatch appends cleaned rows to
    * `outDir` — the disk is the state, like `ivfPqIngest`, with the
    * same at-least-once caveat and checkpointed batch-skip on replay
    * (a drained restart appends nothing). Returns the cleaned corpus
    * read back from `outDir`. */
  def spanRemoveStream(spark: SparkSession, srcDir: String,
                       schemaFrom: DataFrame, idCol: String,
                       textCol: String, n: Int,
                       freqOf: SparkSession => DataFrame,
                       outDir: String, checkpoint: String,
                       minSpanTokens: Int = 0,
                       statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "spanRemoveStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    // Datasets are session-bound (the q55 lesson): the freq set is
    // built INSIDE the cloned streaming session
    val freqSs = freqOf(ss)
    val stream = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.CorpusStats
          .dupSpanRemoveWithFreq(batch, idCol, textCol, n, freqSs,
            minSpanTokens)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    // an empty feed runs zero batches and writes nothing: return the
    // empty cleaned corpus with the right schema instead of failing on
    // a missing outDir
    if (new org.apache.hadoop.fs.Path(outDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(outDir)))
      spark.read.parquet(outDir)
    else graft.operators.CorpusStats.dupSpanRemoveWithFreq(
      schemaFrom.limit(0), idCol, textCol, n,
      freqOf(spark).limit(0), minSpanTokens)
  }

  /** Streaming perplexity filter (the t33 production twin): score a
    * live document feed per micro-batch against a PERSISTED bigram LM
    * (`NgramLm.saveModel` over the reference corpus — the model refits
    * periodically, the stream gates today's feed at micro-batch
    * latency). Stateless per batch like [[spanRemoveStream]]: the
    * model loads INSIDE the cloned streaming session (Datasets are
    * session-bound — the q55 lesson), scored rows append to `outDir`
    * (disk-as-state, at-least-once, checkpointed batch-skip on
    * replay). Returns the scored feed read back from `outDir`. */
  def lmQualityStream(spark: SparkSession, srcDir: String,
                      schemaFrom: DataFrame, idCol: String,
                      textCol: String, modelPath: String,
                      keepNum: Long, keepDen: Long,
                      outDir: String, checkpoint: String,
                      statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "lmQualityStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val lmSs = graft.operators.NgramLm.loadModel(ss, modelPath)
    val stream = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.NgramLm
          .score(batch, idCol, textCol, lmSs, keepNum, keepDen)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (new org.apache.hadoop.fs.Path(outDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(outDir)))
      spark.read.parquet(outDir)
    else graft.operators.NgramLm.score(schemaFrom.limit(0), idCol,
      textCol, graft.operators.NgramLm.loadModel(spark, modelPath),
      keepNum, keepDen)
  }

  /** Streaming DSIR scoring (the t34 production twin, the
    * [[lmQualityStream]] pattern verbatim): score a live document feed
    * per micro-batch against a PERSISTED hashed-n-gram importance
    * model (`Dsir.saveModel` — fit once on target+raw, the stream
    * weighs today's feed at micro-batch latency; global top-k stays a
    * BATCH operation over the accumulated scores, which is why the
    * stream emits every doc's weight). Stateless per batch, model
    * loads inside the cloned session, disk-as-state, at-least-once,
    * checkpointed batch-skip on replay. */
  def dsirStream(spark: SparkSession, srcDir: String,
                 schemaFrom: DataFrame, idCol: String, textCol: String,
                 modelPath: String, outDir: String, checkpoint: String,
                 statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "dsirStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val mSs = graft.operators.Dsir.loadModel(ss, modelPath)
    val stream = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Dsir.scoreAll(batch, idCol, textCol, mSs)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (new org.apache.hadoop.fs.Path(outDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(outDir)))
      spark.read.parquet(outDir)
    else graft.operators.Dsir.scoreAll(schemaFrom.limit(0), idCol,
      textCol, graft.operators.Dsir.loadModel(spark, modelPath))
  }

  /** Streaming language ID (the t66 production twin, the t35/t41
    * pattern): each micro-batch of the document feed is classified
    * against the PERSISTED LangNb model — fit once on the labeled
    * reference corpus, identify language on the live crawl. The model
    * folds into the serving kernel ONCE (a driver-side object, not a
    * session-bound Dataset — so unlike the LM/DSIR streams there is
    * no cross-session Dataset hand-off at all) and every batch is one
    * narrow codegen pass. Stateless per batch, disk-as-state, drained
    * replay appends nothing. */
  def langIdStream(spark: SparkSession, srcDir: String,
                   schemaFrom: DataFrame, idCol: String, textCol: String,
                   modelPath: String, outDir: String, checkpoint: String,
                   statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "langIdStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val m = graft.operators.LangNb.loadModel(ss, modelPath)
    val stream = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.LangNb.predict(batch, idCol, textCol, m)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (outDirExists(spark, outDir)) spark.read.parquet(outDir)
    else graft.operators.LangNb.predict(schemaFrom.limit(0), idCol,
      textCol, graft.operators.LangNb.loadModel(spark, modelPath))
  }

  /** An empty feed leaves outDir unwritten (foreachBatch never runs) —
    * the t35/t41 streams return a schema-correct EMPTY result instead
    * of throwing path-not-found; the shared existence check. */
  private def outDirExists(spark: SparkSession, outDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Streaming quality classification (the t26 production twin): each
    * micro-batch scores against the PERSISTED weight vector — a plain
    * driver-side Array[Double] like the Bloom bits, so no session-bound
    * Dataset exists anywhere; every batch is one narrow codegen map.
    * Stateless per batch, disk-as-state, drained replay appends
    * nothing. */
  def qualityScoreStream(spark: SparkSession, srcDir: String,
                         schemaFrom: DataFrame, idCol: String,
                         textCol: String, weightsPath: String,
                         outDir: String, checkpoint: String,
                         statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "qualityScoreStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val w = graft.operators.QualityClassifier.loadWeights(ss, weightsPath)
    val stream = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.QualityClassifier
          .score(batch, idCol, textCol, w)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (outDirExists(spark, outDir)) spark.read.parquet(outDir)
    else graft.operators.QualityClassifier.score(schemaFrom.limit(0),
      idCol, textCol,
      graft.operators.QualityClassifier.loadWeights(spark, weightsPath))
  }

  /** Streaming tokenize-and-count (the tokenizer-lifecycle stream:
    * train BPE once, persist the merge table, meter token mass on the
    * live feed — the accounting every ingestion pipeline runs before
    * packing): per micro-batch, the batch's OWN distinct-word table
    * encodes through the stored merges (`Bpe.wordTokens` is a
    * distributed map with the bounded rank table in the closure — no
    * driver pull, no session-bound Dataset), then the per-doc totals
    * append. Stateless per batch, disk-as-state, replay no-op. */
  def tokenizeCountStream(spark: SparkSession, srcDir: String,
                          schemaFrom: DataFrame, idCol: String,
                          textCol: String, modelPath: String,
                          outDir: String, checkpoint: String,
                          statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "tokenizeCountStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val merges = graft.operators.Bpe.loadModel(ss, modelPath)
    val stream = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wf = graft.operators.Bpe.wordFreq(batch, textCol)
        graft.operators.Bpe
          .docTokenCounts(batch, idCol, textCol, wf, merges)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (outDirExists(spark, outDir)) spark.read.parquet(outDir)
    else {
      val merges0 = graft.operators.Bpe.loadModel(spark, modelPath)
      graft.operators.Bpe.docTokenCounts(schemaFrom.limit(0), idCol,
        textCol, graft.operators.Bpe.wordFreq(schemaFrom.limit(0),
          textCol), merges0)
    }
  }

  /** Streaming WordPiece token-mass metering — the [[tokenizeCountStream]]
    * analog for the likelihood tokenizer: fit once, persist the model
    * (`WordPiece.saveModel` — the vocab IS the serving artifact), then
    * meter each micro-batch through the GREEDY encoder: the batch's
    * own distinct-word table encodes in a distributed closure map (no
    * driver pull). The vocab is a plain driver Set — not session-bound,
    * so no q55 clone dance (the t51 Bloom rule). Stateless;
    * disk-as-state, drained replay is a no-op. */
  def wordpieceMeterStream(spark: SparkSession, srcDir: String,
                           schemaFrom: DataFrame, idCol: String,
                           textCol: String, modelPath: String,
                           outDir: String, checkpoint: String,
                           statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "wordpieceMeterStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val vocab = graft.operators.WordPiece.loadModel(ss, modelPath)._2
    val stream = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wf = graft.operators.Bpe.wordFreq(batch, textCol)
        graft.operators.WordPiece
          .docTokenCounts(batch, idCol, textCol, wf, vocab)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (outDirExists(spark, outDir)) spark.read.parquet(outDir)
    else
      graft.operators.WordPiece.docTokenCounts(schemaFrom.limit(0),
        idCol, textCol,
        graft.operators.Bpe.wordFreq(schemaFrom.limit(0), textCol),
        vocab)
  }

  /** Streaming SEMANTIC decontamination (the s18 production twin): the
    * bounded benchmark embedding set pulls to the driver once
    * (`Decontam.collectSemBench`, gated) and rebuilds as a DataFrame
    * INSIDE each batch session (the q55 rule — Datasets are
    * session-bound), so every micro-batch of the embedding feed
    * reports its best benchmark match + τ flag statelessly. */
  def semDecontamStream(spark: SparkSession, srcDir: String,
                        schemaFrom: DataFrame, idCol: String,
                        vecCol: String,
                        bench: Array[(Long, Seq[Double])], tau: Double,
                        outDir: String, checkpoint: String,
                        statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "semDecontamStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val stream = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bss = batch.sparkSession
        import bss.implicits._
        graft.operators.Decontam.semReport(batch, idCol, vecCol,
            bench.toSeq.toDF("bench_id", "bv"), "bench_id", "bv", tau)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (outDirExists(spark, outDir)) spark.read.parquet(outDir)
    else {
      import spark.implicits._
      graft.operators.Decontam.semReport(
        schemaFrom.limit(0).select(col(idCol), col(vecCol)), idCol,
        vecCol, bench.toSeq.toDF("bench_id", "bv"), "bench_id", "bv",
        tau)
    }
  }

  /** Streaming Bloom decontamination (the t51 production twin): probe
    * a live document feed per micro-batch against the PERSISTED Bloom
    * artifact (`Decontam.buildBloomFilter` over the benchmark registry
    * — eval suites append as they publish, the stream gates today's
    * crawl at micro-batch latency). Unlike the LM/DSIR models the
    * artifact is a plain driver-side long[] (no session-bound Dataset),
    * so the probe stays the zero-shuffle codegen scan inside every
    * micro-batch. Stateless per batch, disk-as-state, at-least-once,
    * checkpointed batch-skip on replay; `where` optionally routes a
    * slice of a shared feed. */
  def bloomDecontamStream(spark: SparkSession, srcDir: String,
                          schemaFrom: DataFrame, idCol: String,
                          textCol: String, filterPath: String,
                          outDir: String, checkpoint: String,
                          where: Option[String] = None,
                          statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "bloomDecontamStream") {
    val bf = graft.operators.Decontam.loadBloomFilter(spark, filterPath)
    def probe(df: DataFrame) = graft.operators.Decontam.bloomReport(
      df, idCol, textCol, bf.n, bf.k, bf.mBits, bf.bits)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val stream = where.fold(src)(src.filter)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        probe(batch).write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (new org.apache.hadoop.fs.Path(outDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(outDir)))
      spark.read.parquet(outDir)
    else probe(schemaFrom.limit(0))
  }

  /** Streaming ingest into the PERSISTED HLL register store: each
    * micro-batch's ≤ m-rows-per-slice registers append via
    * `Hll.appendToHllStore`; the census max-merges at read time. The
    * at-least-once story is the strongest of the ingest family: MAX is
    * idempotent, so a replayed batch changes NOTHING — not just
    * nothing observable (t44's distinct-at-probe), literally the same
    * registers. `where` optionally routes a slice of a shared feed. */
  def hllIngest(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                storePath: String, checkpoint: String,
                where: Option[String] = None,
                statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "hllIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val stream = where.fold(src)(src.filter)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Hll.appendToHllStore(batch, storePath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming ingest into the PERSISTED count-min store: each
    * micro-batch's d×w cells append under the checkpointed batch id
    * (`Cms.appendToCmsStore`) — the t60 batch-stamp rule makes
    * at-least-once delivery exactly-once at read. */
  def cmsIngest(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                textCol: String, storePath: String, checkpoint: String,
                statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "cmsIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        graft.operators.Cms.appendToCmsStore(batch, textCol, storePath,
          batchId = bid + 1) // build uses batch 0
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming ingest into the PERSISTED graph-ANN index: each
    * micro-batch's vectors beam-search their neighbors over the stored
    * graph and append bidirectional edges
    * (`GraphAnn.appendToGraphIndex`). At-least-once appends are
    * exactly-once at read: search loads edges DISTINCT and nodes
    * deduped by id (replayed batches re-write byte-identical rows). */
  def graphAnnIngest(spark: SparkSession, srcDir: String,
                     schemaFrom: DataFrame, idCol: String, vecCol: String,
                     indexPath: String, checkpoint: String,
                     statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "graphAnnIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.GraphAnn.appendToGraphIndex(batch, idCol, vecCol,
          indexPath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming raw-HTML → clean-text extraction (the t56 operator on a
    * live crawl feed): each micro-batch runs the SAME codegen chain
    * (`Html.cleanHtml` — per-row, stateless, so stream ≡ batch exactly)
    * and appends the cleaned rows. At-least-once appends can duplicate
    * rows on a crash between write and commit; readers dedupe on the
    * id column (the t27 convention for stateless row maps). */
  def htmlCleanStream(spark: SparkSession, srcDir: String,
                      schemaFrom: DataFrame, htmlCol: String,
                      outDir: String, checkpoint: String,
                      statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "htmlCleanStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Html.cleanHtml(batch, htmlCol, textOut = "text_out")
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(outDir)
  }

  /** STREAMING line-level boilerplate cleaning (t71 — t69's twin, the
    * htmlCleanStream shape): each micro-batch cleans against a
    * frequent-line set FIT ONCE on the accumulated corpus and passed
    * as plain driver data (bounded by
    * `CorpusStats.collectFrequentLines`'s gate) — the set DataFrame is
    * rebuilt INSIDE each batch's session (Datasets are session-bound,
    * the q55 rule). Stateless map ⇒ accumulated output == the batch
    * run row-for-row; readers dedupe on the id (at-least-once append,
    * the t27 convention). */
  def lineCleanStream(spark: SparkSession, srcDir: String,
                      schemaFrom: DataFrame, idCol: String,
                      textCol: String, frequent: Seq[String],
                      outDir: String, checkpoint: String,
                      statePartitions: Int = 2,
                      sep: String = "\n"): DataFrame =
      withStoreLock(checkpoint, "lineCleanStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bss = batch.sparkSession
        import bss.implicits._
        graft.operators.CorpusStats.lineDedupWithFreq(batch, idCol,
            textCol, frequent.toDF("line"), sep)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (outDirExists(spark, outDir)) spark.read.parquet(outDir)
    else {
      import spark.implicits._
      graft.operators.CorpusStats.lineDedupWithFreq(
        schemaFrom.limit(0), idCol, textCol, frequent.toDF("line"), sep)
    }
  }

  /** [[lineCleanStream]] at PARAGRAPH scope (the t73 streaming twin):
    * the same stateless per-batch anti-probe with sep = "\n\n", so
    * multi-line boilerplate blocks drop as units on the live feed. */
  def paragraphCleanStream(spark: SparkSession, srcDir: String,
                           schemaFrom: DataFrame, idCol: String,
                           textCol: String, frequent: Seq[String],
                           outDir: String, checkpoint: String,
                           statePartitions: Int = 2): DataFrame =
    lineCleanStream(spark, srcDir, schemaFrom, idCol, textCol, frequent,
      outDir, checkpoint, statePartitions, sep = "\n\n")

  /** STREAMING gate stack — the t98 composed keep/drop card on a live
    * ingest feed: the language-ID kernel is a fitted DRIVER artifact
    * (the bloom-bits shape — no session-bound Dataset hand-off) and
    * every other gate is a row-local expression, so the whole stack is
    * stateless per batch and the accumulated output equals the batch
    * run row-for-row (oracle IS t98's SQL). A never-fired feed returns
    * the schema-correct EMPTY result. */
  def gateStackStream(spark: SparkSession, srcDir: String,
                      schemaFrom: DataFrame, idCol: String,
                      textCol: String,
                      kernel: graft.functions.LangNbKernel,
                      phrases: Seq[String], entMin64: Long,
                      blockMax: Long, langMinPerGram64: Long,
                      qMin: Double, outDir: String, checkpoint: String,
                      statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "gateStackStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.CorpusStats.gateStack(batch, idCol, textCol,
            kernel, phrases, entMin64, blockMax, langMinPerGram64, qMin)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (outDirExists(spark, outDir)) spark.read.parquet(outDir)
    else graft.operators.CorpusStats.gateStack(
      schemaFrom.limit(0), idCol, textCol, kernel, phrases,
      entMin64, blockMax, langMinPerGram64, qMin)
  }

  /** STREAMING blocklist census — the t93 gate on a live feed. The
    * phrase list is pipeline CONFIG (a plain driver value, like the
    * Bloom bit array — no session-bound Dataset hand-off, so no q55
    * clone dance), and the census is stateless per batch: each staged
    * micro-batch runs the identical one-pass Aho–Corasick scan, so the
    * accumulated output equals the batch run row-for-row and the
    * oracle IS t93's SQL. Readers dedupe on the id (at-least-once
    * append, the t27 convention). A never-fired feed returns the
    * schema-correct EMPTY result (the dsirStream guard). */
  def blocklistStream(spark: SparkSession, srcDir: String,
                      schemaFrom: DataFrame, idCol: String,
                      textCol: String, phrases: Seq[String],
                      flagMin: Long, outDir: String, checkpoint: String,
                      statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "blocklistStream") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.CorpusStats.blocklistCensus(batch, idCol,
            textCol, phrases, flagMin)
          .write.mode("append").parquet(outDir)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    if (outDirExists(spark, outDir)) spark.read.parquet(outDir)
    else graft.operators.CorpusStats.blocklistCensus(
      schemaFrom.limit(0), idCol, textCol, phrases, flagMin)
  }

  /** Streaming ingest into the PERSISTED quantile-census store: each
    * micro-batch's (slice, value, count) cells append under the
    * checkpointed BATCH ID (`Quantiles.appendToCensusStore`) — a
    * replayed batch re-writes byte-identical cells, which the store's
    * distinct-at-read collapses, so at-least-once delivery reads
    * exactly-once (exact counts can't use the HLL max-merge; the batch
    * stamp is what stands in for it). */
  def censusIngest(spark: SparkSession, srcDir: String,
                   schemaFrom: DataFrame, storePath: String,
                   checkpoint: String, where: Option[String] = None,
                   statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "censusIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val stream = where.fold(src)(src.filter)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // build uses batch 0 → stream ids offset by 1
        graft.operators.Quantiles.appendToCensusStore(batch, storePath,
          batchId = bid + 1)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming ingest into the PERSISTED perceptual-hash signature
    * index: each micro-batch's media decode + 62-bit aHash
    * (`Multimodal.perceptualHash`) appends via `Dedup.appendToSigIndex`
    * — media bytes hash once, on arrival; the index holds 8-byte
    * signatures, never pixels. At-least-once appends are exactly-once
    * at the probe (distinct pairs, the t44 rule). */
  def phashIngest(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                  idCol: String, dataCol: String, indexPath: String,
                  checkpoint: String, where: Option[String] = None,
                  statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "phashIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val stream = where.fold(src)(src.filter)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // binary→binary cast is a no-op; string feeds (doc twins) coerce
        val media = batch.select(col(idCol),
          col(dataCol).cast("binary").as(dataCol))
        graft.operators.Dedup.appendToSigIndex(
          graft.operators.Multimodal.perceptualHash(media, idCol, dataCol)
            .select(col("media_id").as("id"), col("phash").as("sh")),
          kind = "phash62", indexPath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming ingest into a persisted binary-code index (the
    * lshIngest shape): each embedding micro-batch appends through the
    * anti-join, so an at-least-once replay is a byte-level no-op. */
  def binaryIngest(spark: SparkSession, srcDir: String,
                   schemaFrom: DataFrame, idCol: String, vecCol: String,
                   indexPath: String, checkpoint: String,
                   statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "binaryIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity.appendToBinaryIndex(batch, idCol,
          vecCol, indexPath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming ingest into the PERSISTED LSH dedup index: each
    * micro-batch's banded signatures append via
    * `Dedup.appendToLshIndex` — the live half of the snapshot-dedup
    * lifecycle (a crawl feed hashes once, on arrival; probes against
    * the index never re-read old text). Disk-as-state like
    * `ivfPqIngest`, with a BETTER at-least-once story: a replayed
    * batch appends duplicate signature ROWS, but `probeLshIndex`
    * returns DISTINCT pairs, so the candidate set is exactly-once even
    * when the append is not. `where` optionally routes a slice of a
    * shared feed (SQL predicate over the feed's columns). */
  def lshIngest(spark: SparkSession, srcDir: String, schemaFrom: DataFrame,
                idCol: String, textCol: String, indexPath: String,
                checkpoint: String, where: Option[String] = None,
                statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "lshIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema).parquet(srcDir)
    val stream = where.fold(src)(src.filter)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Dedup.appendToLshIndex(batch, idCol, textCol,
          indexPath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming TAKEDOWN feed applied to a persisted LSH dedup index —
    * the live half of the delete lifecycle (production takedowns
    * arrive as a FEED — right-to-be-forgotten queues, DMCA sweeps —
    * not as maintenance windows): each micro-batch's ids are deleted
    * from the index through the same anti-join + rename-swap path the
    * batch API uses. Semantics are ENSURE-ABSENT (what a takedown
    * means): ids already absent are SKIPPED — so an at-least-once
    * replayed batch is a natural no-op, and the same id may appear in
    * any number of feed batches — where the batch API
    * (`Dedup.deleteFromLshIndex`) keeps its strict unknown-id
    * fail-fast (a maintenance window wants to know about a typo'd
    * takedown list; a feed consumer must never deadlock on
    * redelivery). The present/absent split is observable from the
    * store itself (one semi-join per batch, MATERIALIZED before the
    * delete swaps the root out from under its scan); an all-absent
    * batch pays no root rewrite at all. */
  def takedownIngest(spark: SparkSession, srcDir: String,
                     schemaFrom: DataFrame, idCol: String,
                     indexPath: String, checkpoint: String,
                     statePartitions: Int = 2): Unit =
    takedownIngestOn(spark, srcDir, schemaFrom, idCol, checkpoint,
      statePartitions, s"$indexPath/buckets",
      (bs, present) => graft.operators.Dedup.deleteFromLshIndex(
        bs, present, "id", indexPath))

  /** [[takedownIngest]] for the persisted media-SIGNATURE index (m05)
    * — the same ensure-absent feed semantics over
    * `Dedup.deleteFromSigIndex`. */
  def takedownIngestSig(spark: SparkSession, srcDir: String,
                        schemaFrom: DataFrame, idCol: String,
                        indexPath: String, checkpoint: String,
                        statePartitions: Int = 2): Unit =
    takedownIngestOn(spark, srcDir, schemaFrom, idCol, checkpoint,
      statePartitions, s"$indexPath/chunks",
      (bs, present) => graft.operators.Dedup.deleteFromSigIndex(
        bs, present, "id", indexPath))

  /** [[takedownIngest]] for the persisted binary-code vector index
    * (s22) — the same ensure-absent feed semantics over
    * `Similarity.deleteFromBinaryIndex`. */
  def takedownIngestBinary(spark: SparkSession, srcDir: String,
                           schemaFrom: DataFrame, idCol: String,
                           indexPath: String, checkpoint: String,
                           statePartitions: Int = 2): Unit =
    takedownIngestOn(spark, srcDir, schemaFrom, idCol, checkpoint,
      statePartitions, s"$indexPath/codes",
      (bs, present) => graft.operators.Similarity.deleteFromBinaryIndex(
        bs, present, "id", indexPath))

  /** The shared ensure-absent core: split each batch's ids against the
    * store's id table (materialized BEFORE the delete swaps the
    * scanned root), delete only the present subset through the strict
    * batch API. */
  private def takedownIngestOn(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, idCol: String, checkpoint: String,
      statePartitions: Int, storedIdsPath: String,
      delete: (SparkSession, DataFrame) => Unit): Unit =
      withStoreLock(checkpoint, "takedownIngestOn") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bs = batch.sparkSession
        val ids = batch.select(col(idCol).as("id")).distinct()
        val present = ids.join(
            bs.read.parquet(storedIdsPath).select(col("id")),
            Seq("id"), "left_semi")
          .localCheckpoint() // eager: the delete swaps the scanned root
        if (present.limit(1).count() > 0L) delete(bs, present)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Stage an ordered multi-batch feed from explicit chunk frames:
    * chunk i lands as `chunk_00i.parquet` with ascending mtimes, so a
    * `maxFilesPerTrigger=1` reader sees one chunk per micro-batch in
    * order (the stageTimeOrderedFeed device, generalized to
    * caller-split chunks — takedown feeds split by REQUEST batch, not
    * by event time). Staging device for tests/queries; production
    * feeds are already journals. */
  def stageFeedChunks(dfs: Seq[DataFrame], dir: String): Unit = {
    require(dfs.nonEmpty, "stageFeedChunks: no chunks")
    val fdir = new java.io.File(dir)
    fdir.mkdirs()
    val base = System.currentTimeMillis() - (dfs.size + 1) * 60000L
    dfs.zipWithIndex.foreach { case (df, i) =>
      val tmp = new java.io.File(fdir, s"_tmp_$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"stageFeedChunks: no part file in $tmp"))
      val dst = new java.io.File(fdir, f"chunk_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(base + i * 60000L)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
    new java.io.File(fdir, "_SUCCESS").createNewFile()
  }

  /** PRODUCTION form of the q54 streaming dedup: `withWatermark` +
    * `dropDuplicatesWithinWatermark`, so the fingerprint state for keys
    * older than the watermark ages out instead of growing with the whole
    * feed's key cardinality — the difference between O(distinct keys
    * ever) and O(distinct keys per watermark window) state at 100 TB of
    * journal. Late rows (event time behind the watermark) are dropped at
    * the operator (observable as `numRowsDroppedByWatermark` in
    * `StreamingQueryProgress`); a duplicate arriving AFTER its first
    * occurrence aged out would re-emit — the documented trade of the
    * bounded-state form, which is why the deterministic q54 oracle keeps
    * the unbounded variant. `tsCol` must survive in `stream`'s columns.
    */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String, delay: String,
                           keyCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-STREAM inner join with an event-time interval condition —
    * a capability the reference's live-table callbacks cannot express
    * (correlating two live feeds requires cross-feed state; Structured
    * Streaming holds both sides' unmatched rows in the state store and
    * emits pairs as they meet). Both sides come from the same staged
    * feed here (two filtered views — the self-join shape of
    * click→conversion funnels); `joinExpr` carries the key equality and
    * the time bounds. Inner join needs no watermark for correctness on
    * a bounded replay (the q56 oracle path — both defaults None); a
    * production feed passes `(eventTimeCol, delay)` per side so the
    * join's unmatched-row stores age out — with both watermarks and a
    * time-bound condition Spark derives each side's state eviction
    * horizon (`numRowsRemoved` in progress), keeping state proportional
    * to the interval width, not the feed length.
    *
    * CHECKPOINTED with a durable pair store (r18 optimization — the
    * q80 durable-bars convention extended to the join family): inner
    * stream-stream join pairs emit exactly once in the micro-batch
    * where the match completes, so each batch's pairs land under their
    * `__batch` partition via dynamic overwrite ([[writeResultBatch]] —
    * a crash-redelivered batch replaces its own partition) and the
    * read-side union over batches IS the full pair set. A warm
    * invocation is a planned restart (no new feed files → no
    * micro-batch) that reads the store — per-call cost flat instead
    * of linear in feed history, which at 100 TB is the difference
    * between a live funnel query and a full-history replay per ask. */
  def intervalJoin(spark: SparkSession, srcDir: String,
                   schemaFrom: DataFrame,
                   prepLeft: DataFrame => DataFrame,
                   prepRight: DataFrame => DataFrame,
                   joinExpr: String, queryName: String,
                   outPath: String, checkpoint: String,
                   statePartitions: Int = 2,
                   leftWatermark: Option[(String, String)] = None,
                   rightWatermark: Option[(String, String)] = None,
                   maxFilesPerTrigger: Option[Int] = None): DataFrame =
      withStoreLock(checkpoint, "intervalJoin") {
    requireCkptMatchesStore(outPath, checkpoint, "intervalJoin")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    def src() = {
      val rd = ss.readStream.schema(schemaFrom.schema)
      maxFilesPerTrigger.fold(rd)(n =>
        rd.option("maxFilesPerTrigger", n.toString)).parquet(srcDir)
    }
    val l0 = prepLeft(src())
    val r0 = prepRight(src())
    val l = leftWatermark.fold(l0) { case (c, d) => l0.withWatermark(c, d) }
    val r = rightWatermark.fold(r0) { case (c, d) => r0.withWatermark(c, d) }
    val joined = l.join(r, expr(joinExpr))
    val q = joined.writeStream
      .outputMode("append")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (out: DataFrame, bid: Long) =>
        writeResultBatch(out, bid, outPath)
      }
      .start()
    try q.processAllAvailable() finally {
      lastStateRowsRemoved.put(queryName,
        q.recentProgress.toSeq
          .flatMap(p => Option(p.stateOperators).toSeq.flatten)
          .map(_.numRowsRemoved).sum)
      q.stop()
    }
    requireStoreMatchesCkpt(outPath, checkpoint, "intervalJoin")
    // "fired but zero pairs" writes only batch markers, no data files —
    // the empty branch keys on DATA files (the watermarkedBarsIngest
    // discipline)
    val haveData = new java.io.File(outPath).exists() &&
      !org.apache.commons.io.FileUtils.listFiles(
        new java.io.File(outPath), Array("parquet"), true).isEmpty
    if (haveData) spark.read.parquet(outPath).drop("__batch")
    else { // never-fired or zero-pair feed: schema-correct empty
      def empty() = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        schemaFrom.schema)
      prepLeft(empty()).join(prepRight(empty()), expr(joinExpr))
    }
  }

  /** Total join-state rows evicted by the watermark during the LAST
    * [[intervalJoin]] run under each query name — the observable that
    * distinguishes the bounded-state production form (q75) from the
    * unbounded replay form (q56): with per-side watermarks + a
    * time-bound condition, Spark derives each side's eviction horizon
    * and this reads > 0 across a multi-batch run (WatermarkSpec pins
    * it in the q75 query's own run). */
  val lastStateRowsRemoved =
    new scala.collection.concurrent.TrieMap[String, Long]()

  /** Watermarked APPEND-mode windowed aggregation over a time-ordered
    * feed — the streaming form of the hourly-bars family (q80 OHLC;
    * reference shape: live bars built by insert callbacks,
    * `core/update.c:414-555` + `examples/sesslog.rfl`). Each bar emits
    * EXACTLY ONCE when the watermark passes its window end, and
    * closed-bar state EVICTS mid-run ([[lastStateRowsRemoved]] under
    * `queryName`). CHECKPOINTED, with each micro-batch's closed bars
    * landing in a persisted store (the disk-as-state convention of the
    * four scan-ingest siblings). Append mode + the checkpoint means
    * each bar is computed exactly once across the stream's LIFETIME —
    * repeated invocations cost one punctuation micro-batch (~the q79
    * warm floor), never a feed replay; a crash between the store write
    * and the checkpoint commit redelivers the batch, whose DYNAMIC
    * `__batch` partition overwrite ([[writeResultBatch]]) replaces its
    * own rows instead of duplicating them — exactly-once end to end.
    *
    * Punctuation: every invocation appends one fresh `tick_*` file
    * (nanoTime-named — the checkpoint's file log skips the old ones),
    * so bars closed by data drained in THIS invocation emit before the
    * return. Tick rows carry `sentinelKey`, whose bars are filtered
    * from the returned store read; their window state is one row per
    * distinct tick timestamp — bounded. State eviction is recorded in
    * [[lastStateRowsRemoved]] under `queryName` across the stream's
    * lifetime so far (the WatermarkSpec observable). */
  def watermarkedBarsIngest(spark: SparkSession, srcDir: String,
                            schemaFrom: DataFrame,
                            prep: DataFrame => DataFrame,
                            keyCol: String, tsUsCol: String,
                            windowDur: String, delay: String,
                            aggs: Seq[org.apache.spark.sql.Column],
                            sentinelKey: Long, queryName: String,
                            punctuation: DataFrame, barsPath: String,
                            checkpoint: String,
                            statePartitions: Int = 2): DataFrame =
      withStoreLock(checkpoint, "watermarkedBarsIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    // NO pre-agg sentinel filter: a
    // key predicate pushes BELOW EventTimeWatermark and would exclude
    // punctuation rows from watermark tracking
    val stream = prep(ss.readStream.schema(schemaFrom.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .withColumn("evt_ts", expr(s"timestamp_micros($tsUsCol)"))
      .withWatermark("evt_ts", delay)
    val q = stream
      .groupBy(col(keyCol), window(col("evt_ts"), windowDur))
      .agg(aggs.head, aggs.tail: _*)
      .writeStream.option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (bars: DataFrame, bid: Long) =>
        // append mode hands foreachBatch ONLY the newly closed bars
        writeResultBatch(bars, bid, barsPath)
      }
      .start()
    try {
      q.processAllAvailable()
      // one punctuation tick per FEED STATE (r18 optimization — was one
      // per invocation): a batch runs under the watermark PRIOR batches
      // set, so bars closed by data drained above need one more batch
      // to emit, and newly appended feed data (a changed stamp) still
      // gets its wake-up tick — but a warm restart over a drained,
      // unchanged feed finds its tick already in the checkpoint's
      // seen-map and runs ZERO micro-batches (the q79 planned-restart
      // floor, ~1 s/call saved on the live-bars query)
      val dataStamp = Option(new java.io.File(srcDir).listFiles)
        .toSeq.flatten
        .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("tick_") && !f.getName.startsWith("_"))
        .map(f => f.getName.hashCode * 31L + f.length + f.lastModified)
        .sum
      val dst = new java.io.File(srcDir, s"tick_s$dataStamp.parquet")
      if (!dst.exists()) {
        val tmp = new java.io.File(srcDir, s"_ticktmp_${System.nanoTime()}")
        punctuation.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"watermarkedBarsIngest: no tick part in $tmp"))
        java.nio.file.Files.move(part.toPath, dst.toPath)
        tmp.listFiles().foreach(_.delete()); tmp.delete()
        q.processAllAvailable()
      }
    } finally {
      lastStateRowsRemoved.put(queryName,
        q.recentProgress.toSeq
          .flatMap(p => Option(p.stateOperators).toSeq.flatten)
          .map(_.numRowsRemoved).sum)
      q.stop()
    }
    // "fired but zero bars ever closed" writes barsPath with markers
    // and no data files — reading that throws schema-inference errors,
    // so the empty-result branch keys on DATA files, not dir existence
    // (round-18 self-review)
    val barsHaveData = new java.io.File(barsPath).exists() &&
      !org.apache.commons.io.FileUtils.listFiles(
        new java.io.File(barsPath), Array("parquet"), true).isEmpty
    if (barsHaveData)
      spark.read.parquet(barsPath)
        .filter(col(keyCol) =!= sentinelKey).drop("__batch")
    else { // never-fired or zero-bars feed: schema-correct empty
      val empty = prep(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          schemaFrom.schema))
        .withColumn("evt_ts", expr(s"timestamp_micros($tsUsCol)"))
      empty.groupBy(col(keyCol), window(col("evt_ts"), windowDur))
        .agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Streaming per-user TWAP state (q77's live twin — the kdb
    * prevailing-value bar kept current by insert callbacks): each
    * micro-batch folds into a tiny PERSISTED per-user state table
    * (user_id, n, first_tus, last_tus, last_eid, last_vq,
    * num DECIMAL(38,0)) — state is bounded by USER cardinality, never
    * event count, and every v·dt term stays exact integer/decimal (the
    * q77 discipline; a long accumulator would overflow at corpus
    * scale).
    *
    * The cross-batch interval (last event of batch i → first event of
    * batch i+1, the prevailing-value bridge) is handled by injecting
    * each user's stored last event as a PHANTOM row into the batch
    * window: the same lead() arithmetic that prices in-batch intervals
    * prices the bridge — including the same-µs boundary tie, where a
    * batch event with an earlier event_id sorts BEFORE the phantom and
    * contributes dt = 0 exactly as the batch query would. Phantoms are
    * excluded from the n/first/min accumulators.
    *
    * Requires a TIME-ORDERED feed (the stageTimeOrderedFeed contract):
    * a batch row strictly BEFORE a user's stored last event would need
    * interval re-splicing that summary state cannot express — the
    * merge fail-fasts row-level on it (raise_error). State rewrites go
    * through a tmp dir + rename swap, so a crash mid-write never
    * leaves a torn state table.
    *
    * EXACTLY-ONCE on replay: the state table carries the id of the
    * last merged batch (`last_batch` — stamped on every row, since the
    * swap rewrites the whole table anyway, the censusIngest
    * batch-stamp precedent), so a batch redelivered after a crash
    * between the state swap and the checkpoint commit is a NO-OP
    * instead of tripping the id-reuse fail-fast into manual recovery;
    * a PLANNED restart over a drained feed delivers no batches at all.
    *
    * Residual duplicate-delivery hole (documented, not closable from
    * summary state): full-batch replays are no-ops (above) and most
    * single-event redeliveries trip the id-reuse or out-of-order
    * guards — but a redelivered copy of a NON-last event that shares
    * the stored last event's µs passes both (its µs is not strictly
    * earlier, its eid differs from last_eid) and inflates `n` by one.
    * The state keeps only (last_tus, last_eid), and the same-µs
    * boundary tie is a LEGAL feed shape (stageTimeOrderedFeed range-
    * splits on ts alone, so same-µs rows can straddle chunks in any
    * eid order) — tightening the guard would abort legal feeds. An
    * upstream that can re-send individual historical events needs its
    * own dedup. */
  def twapIngest(spark: SparkSession, srcDir: String,
                 schemaFrom: DataFrame, prep: DataFrame => DataFrame,
                 statePath: String, checkpoint: String,
                 statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "twapIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val q = prep(ss.readStream.schema(schemaFrom.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        mergeTwapState(batch, bid, statePath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming inter-event-gap census — q86's live twin, COMPOSING the
    * two state disciplines this family established: the cross-batch
    * BRIDGE gap (stored last event → first batch event per user) is
    * priced by the phantom carry-in (the twapIngest lead() rule,
    * same-µs boundary ties included — ties share the µs, so every gap
    * a tie displaces keeps its value), while the gap COUNTS land in
    * the persisted census store whose batch-stamped cells are
    * mergeable and exactly-once at read
    * ([[graft.operators.Quantiles.appendToCensusStore]]
    * distinct-at-read — a redelivered batch rewrites IDENTICAL cells,
    * which the distinct collapses). Every event's gap is emitted
    * exactly once: in the batch where its successor first arrives
    * (the stored last event per user is precisely the one event whose
    * gap is still open; at stream end it stays open, matching the
    * batch query's excluded null-gap row). State is (user_id,
    * last_tus, last_eid, last_type) — key-bounded. Strictly-earlier
    * batch rows fail fast BEFORE any census write (re-splicing an
    * already-emitted gap is unexpressable from summary state).
    * `prep` maps a raw batch to (user_id, tus, eid, etype). */
  def gapCensusIngest(spark: SparkSession, srcDir: String,
                      schemaFrom: DataFrame, prep: DataFrame => DataFrame,
                      censusPath: String, statePath: String,
                      checkpoint: String,
                      statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "gapCensusIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val q = prep(ss.readStream.schema(schemaFrom.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        mergeGapState(batch, bid, censusPath, statePath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** One gap merge: guards first (a failed batch must not have
    * half-written census cells), then cells, then the state swap —
    * so every crash window lands on a replayable side. */
  private[graft] def mergeGapState(batch: DataFrame, batchId: Long,
                                   censusPath: String,
                                   statePath: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val bs = batch.sparkSession
    val state0 = readState(bs, statePath,
      "user_id BIGINT, last_tus BIGINT, last_eid BIGINT, " +
        "last_type STRING, last_batch BIGINT", "gapCensusIngest")
    if (replayedBatch(state0, batchId, "twapIngest")) return
    requireNoBatchDups(batch, "user_id", "eid", "gapCensusIngest")
    val st = state0.select(col("user_id"), col("last_tus"),
      col("last_eid"), col("last_type")).localCheckpoint()
    val dup = batch.join(st.select(col("user_id"), col("last_eid")),
        Seq("user_id"))
      .filter(col("eid") === col("last_eid")).limit(1).collect()
    require(dup.isEmpty,
      "gapCensusIngest: an event_id recurred across batches — duplicate " +
        "delivery the summary state would re-count; dedupe upstream")
    val ooo = batch.join(st.select(col("user_id"), col("last_tus")),
        Seq("user_id"))
      .filter(col("tus") < col("last_tus")).limit(1).collect()
    require(ooo.isEmpty,
      "gapCensusIngest: out-of-order feed — a batch row precedes its " +
        "user's stored last event; the emitted gap census cannot be " +
        "re-spliced from summary state")
    val carry = st.select(col("user_id"), col("last_tus").as("tus"),
      col("last_eid").as("eid"), col("last_type").as("etype"),
      lit(true).as("ph"))
    val rows = batch.select(col("user_id"), col("tus"), col("eid"),
        col("etype"), lit(false).as("ph"))
      .unionByName(carry)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("eid"))
    val gapped = rows
      .withColumn("gap_us", lead(col("tus"), 1).over(w) - col("tus"))
      .localCheckpoint() // one computation feeds cells AND state
    val cells = gapped.filter(col("gap_us").isNotNull)
      .select(col("etype").as("event_type"), col("gap_us"))
    if (!new java.io.File(s"$censusPath/meta").exists())
      graft.operators.Quantiles.buildCensusStore(cells,
        Seq("event_type"), "gap_us", censusPath)
    else
      graft.operators.Quantiles.appendToCensusStore(cells, censusPath,
        batchId)
    val newState = gapped
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("tus").as("t"), col("eid").as("e"),
          col("etype").as("y")),
        struct(col("tus"), col("eid"))).as("last"))
      .select(col("user_id"), col("last.t").as("last_tus"),
        col("last.e").as("last_eid"), col("last.y").as("last_type"),
        lit(batchId).as("last_batch"))
    writeStateSwap(newState, statePath, "gapCensusIngest")
  }

  /** Streaming Bollinger breakout census — q88's live twin,
    * introducing the THIRD state discipline of the scan-ingest family:
    * BOUNDED-LOOKBACK carry-in + mergeable accumulators. The 20-row
    * band window is order-sensitive (the phantom family's territory)
    * but only 19 rows deep, so per-user state is the last ≤ 19
    * (t, e, x) rows — re-exploded into each batch as phantoms that
    * provide window CONTEXT but are never re-counted — plus three
    * ASSOCIATIVE counters (n_up, n_dn, n_events) that merge like
    * q90's sums. Every batch row's window is exact: its ≤ 19
    * predecessors are either in-batch or in the carried tail (a user
    * with < 19 history carries all of it, so warm-up suppression
    * matches the batch query row for row).
    *
    * STRICTLY-ORDERED feed required — stricter than twapIngest's
    * same-µs tolerance, and the reason is structural: a late row
    * splicing in at-or-before the stored last (t, e) would change the
    * window CONTENT of rows whose flags are already counted (TWAP's
    * boundary ties contribute dt = 0 by arithmetic; Bollinger's
    * change the moments), which summary state cannot re-splice — the
    * merge fail-fasts on any batch row not lexicographically after
    * its user's stored (t, e) max. `prep` maps a raw batch to
    * (k, t, i, x ×100-cents); |x| < 2^20 is guarded row-level (the
    * q88 operand bound). */
  def bollingerIngest(spark: SparkSession, srcDir: String,
                      schemaFrom: DataFrame, prep: DataFrame => DataFrame,
                      statePath: String, checkpoint: String,
                      statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "bollingerIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val q = prep(ss.readStream.schema(schemaFrom.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        mergeBollingerState(batch, bid, statePath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** One Bollinger merge: batch must carry (k, t, i, x). */
  private[graft] def mergeBollingerState(batch: DataFrame, batchId: Long,
                                         statePath: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val bs = batch.sparkSession
    val state0 = readState(bs, statePath,
      "k BIGINT, tail ARRAY<STRUCT<t: BIGINT, e: BIGINT, x: BIGINT>>, " +
        "n_up BIGINT, n_dn BIGINT, n_events BIGINT, last_batch BIGINT",
      "bollingerIngest")
    if (replayedBatch(state0, batchId, "bollingerIngest")) return
    requireNoBatchDups(batch, "k", "i", "bollingerIngest")
    val st = state0.localCheckpoint() // the swap rewrites what it reads
    // strict order: tail is stored ASC, so element -1 is the (t, e) max
    val bad = batch.join(
        st.select(col("k"), element_at(col("tail"), -1).as("last")),
        Seq("k"))
      .filter(col("t") < col("last.t") ||
        (col("t") === col("last.t") && col("i") <= col("last.e")))
      .limit(1).collect()
    require(bad.isEmpty,
      "bollingerIngest: a batch row is not strictly after its user's " +
        "stored (t, e) max — it would change the window content of " +
        "already-counted rows, which lookback state cannot re-splice " +
        "(this also catches event-id reuse at the boundary); order " +
        "the feed or dedupe upstream")
    val xOk = when(col("x").isNull || abs(col("x")) >= (1L << 20),
      raise_error(concat(
        lit("bollingerIngest needs |x| < 2^20 cents, got "),
        coalesce(col("x").cast("string"), lit("NULL")))).cast("long"))
      .otherwise(col("x"))
    val carry = st.select(col("k"), explode(col("tail")).as("p"))
      .select(col("k"), col("p.t").as("t"), col("p.e").as("i"),
        col("p.x").as("x"), lit(true).as("ph"))
    val rows = batch.select(col("k"), col("t"), col("i"),
        xOk.as("x"), lit(false).as("ph"))
      .unionByName(carry)
      .localCheckpoint() // one computation feeds flags AND tails
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("i"))
      .rowsBetween(-19, 0)
    val dev = col("n") * col("x") - col("s")
    val varn = lit(4L) * (col("n") * col("ss") - col("s") * col("s"))
    val flags = rows
      .select(col("k"), col("x"), col("ph"),
        sum(col("x")).over(w).as("s"),
        sum(col("x") * col("x")).over(w).as("ss"),
        count(lit(1)).over(w).as("n"))
      .filter(!col("ph")) // phantom windows were counted LAST batch
      .groupBy(col("k"))
      .agg(
        sum(when(col("n") === 20 && dev > 0 && dev * dev > varn, 1L)
          .otherwise(0L)).as("d_up"),
        sum(when(col("n") === 20 && dev < 0 && dev * dev > varn, 1L)
          .otherwise(0L)).as("d_dn"),
        count(lit(1)).as("d_ne"))
    val wTail = Window.partitionBy(col("k"))
      .orderBy(col("t").desc, col("i").desc)
    val tails = rows
      .withColumn("rn", row_number().over(wTail))
      .filter(col("rn") <= 19)
      .groupBy(col("k"))
      .agg(sort_array(collect_list(
        struct(col("t"), col("i").as("e"), col("x")))).as("tail"))
    val acc = st.select(col("k"), col("n_up").as("s_up"),
      col("n_dn").as("s_dn"), col("n_events").as("s_ne"))
    // tails covers every user in batch ∪ carry ⊇ every stored user
    val merged = tails
      .join(flags, Seq("k"), "left_outer")
      .join(acc, Seq("k"), "left_outer")
      .select(col("k"), col("tail"),
        (coalesce(col("s_up"), lit(0L)) + coalesce(col("d_up"), lit(0L)))
          .as("n_up"),
        (coalesce(col("s_dn"), lit(0L)) + coalesce(col("d_dn"), lit(0L)))
          .as("n_dn"),
        (coalesce(col("s_ne"), lit(0L)) + coalesce(col("d_ne"), lit(0L)))
          .as("n_events"),
        lit(batchId).as("last_batch"))
    writeStateSwap(merged, statePath, "bollingerIngest")
  }

  /** The exactly-once replay decision for a scan-ingest merge: skip
    * (true) ONLY the exact last-committed batch — the one id a crash
    * between the state swap and the checkpoint commit can redeliver.
    * A batch id BELOW the committed stamp means the checkpoint lineage
    * no longer matches the state table (a reset/lost checkpoint dir
    * restarting ids at 0, or a re-staged feed against live state) —
    * skipping those would silently drop genuinely new events, so the
    * merge aborts loudly instead (the pre-stamp fail-fast behavior,
    * kept for exactly the case the stamp cannot vouch for). */
  private def replayedBatch(state0: DataFrame, batchId: Long,
                            fn: String): Boolean = {
    val committed = committedBatch(state0)
    if (batchId == committed) true
    else {
      require(batchId > committed,
        s"$fn: batch $batchId is below the state's committed batch " +
          s"$committed — the checkpoint lineage does not match this " +
          "state table (reset checkpoint? re-staged feed?); refusing " +
          "to skip batches that may hold unfolded events. Point the " +
          "stream at a fresh statePath or restore the checkpoint.")
      false
    }
  }

  /** Last merged batch id from a scan-ingest state table (−1 when the
    * state is empty). Every row carries the same stamp — the swap
    * rewrites the whole table per merge, so stamping is free and the
    * read is one tiny agg over bounded state. */
  private def committedBatch(state0: DataFrame): Long =
    // a state table written before the stamp existed reads as "nothing
    // committed" — the pre-stamp at-least-once behavior, and the next
    // merge's rewrite adds the column (self-migrating)
    if (!state0.columns.contains("last_batch")) -1L
    else {
      val r = state0.agg(max(col("last_batch"))).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }

  /** Duplicate (key, id) rows WITHIN one micro-batch would slip past
    * the cross-batch guards (those compare against STORED state only)
    * and silently diverge the fold — the EMA/CUSUM (k,i) join-back
    * row-multiplies, TWAP re-counts the event. One distinct-vs-total
    * agg over the batch fails fast instead. */
  private def requireNoBatchDups(batch: DataFrame, kCol: String,
                                 iCol: String, fn: String): Unit = {
    val r = batch.agg(count(lit(1)),
      count_distinct(col(kCol), col(iCol))).head()
    require(r.getLong(0) == r.getLong(1),
      s"$fn: ${r.getLong(0) - r.getLong(1)} duplicate ($kCol, $iCol) " +
        "rows within one micro-batch — duplicate delivery; dedupe upstream")
  }

  /** One TWAP state merge: batch must carry (user_id, tus, vq, eid). */
  private[graft] def mergeTwapState(batch: DataFrame, batchId: Long,
                                    statePath: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val bs = batch.sparkSession
    val state0 = readState(bs, statePath,
      "user_id BIGINT, n BIGINT, first_tus BIGINT, last_tus BIGINT, " +
        "last_eid BIGINT, last_vq BIGINT, num DECIMAL(38,0), " +
        "last_batch BIGINT", "twapIngest")
    // a redelivered batch (crash between swap and checkpoint commit)
    // is already folded into the state — exactly-once by skipping,
    // BEFORE any guard (the guards would otherwise trip on it)
    if (replayedBatch(state0, batchId, "twapIngest")) return
    requireNoBatchDups(batch, "user_id", "eid", "twapIngest")
    // event-id reuse across batches = a duplicate delivery the summary
    // state can't absorb (it would re-count the event) — fail fast
    val dup = batch.join(state0.select(col("user_id"), col("last_eid")),
        Seq("user_id"))
      .filter(col("eid") === col("last_eid")).limit(1).collect()
    require(dup.isEmpty,
      "twapIngest: an event_id recurred across batches — duplicate " +
        "delivery the summary state would re-count; dedupe upstream")
    val carry = state0.select(col("user_id"), col("last_tus").as("tus"),
      col("last_vq").as("vq"), col("last_eid").as("eid"),
      lit(true).as("ph"))
    val rows = batch.select(col("user_id"), col("tus"), col("vq"),
        col("eid"), lit(false).as("ph"))
      .unionByName(carry)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("eid"))
    val part = rows.withColumn("tnext", lead(col("tus"), 1).over(w))
      .groupBy(col("user_id")).agg(
        sum(when(col("tnext").isNotNull,
          (col("tnext") - col("tus")).cast("decimal(38,0)") * col("vq")))
          .as("dnum"),
        sum(when(!col("ph"), 1L).otherwise(0L)).as("dn"),
        min(when(!col("ph"), col("tus"))).as("bfirst"),
        min(when(!col("ph"), struct(col("tus"), col("eid")))).as("bmin"),
        max_by(struct(col("tus").as("t"), col("eid").as("e"),
            col("vq").as("v")),
          struct(col("tus"), col("eid"))).as("blast"))
    val st = state0.select(col("user_id"), col("n").as("s_n"),
      col("first_tus").as("s_first"), col("last_tus").as("s_last_tus"),
      col("last_eid").as("s_last_eid"), col("num").as("s_num"))
    // carry covers every stored user, so part ⊇ state users — a left
    // join from part loses nothing
    val j = part.join(st, Seq("user_id"), "left_outer")
    // out-of-order fail-fast: a batch row at a STRICTLY earlier µs than
    // the stored last event needs interval re-splicing summary state
    // can't express. Same-µs rows (any event_id) are fine — every
    // interval they displace has dt = 0, and the phantom lead prices
    // the rest correctly (the spec's boundary-tie golden).
    val ooo = col("bmin").isNotNull && col("s_last_tus").isNotNull &&
      col("bmin.tus") < col("s_last_tus")
    val zero = lit(0).cast("decimal(38,0)")
    val merged = j.select(col("user_id"),
        when(ooo, raise_error(concat(
          lit("twapIngest: out-of-order feed for user "),
          col("user_id").cast("string"),
          lit(" — batch row precedes stored last event"))).cast("long"))
          .otherwise(coalesce(col("s_n"), lit(0L)) + col("dn")).as("n"),
        least(col("s_first"), col("bfirst")).as("first_tus"),
        col("blast.t").as("last_tus"),
        col("blast.e").as("last_eid"),
        col("blast.v").as("last_vq"),
        (coalesce(col("s_num"), zero) + coalesce(col("dnum"), zero))
          .cast("decimal(38,0)").as("num"),
        lit(batchId).as("last_batch"))
    writeStateSwap(merged, statePath, "twapIngest")
  }

  /** Per-file row target for scan-ingest state writes — a
    * `private[graft]` var (the maxDriverVec precedent) so the
    * multi-file spec can force it tiny. State bounded by key
    * cardinality usually fits ONE file; past the target the write
    * fans out so no single task writes the whole table (the
    * Store.compactParquet size discipline). */
  private[graft] var stateMaxFileRows: Long = 1L << 20

  /** Rewrite a per-key state table through tmp + rename swap — the
    * shared tail of every scan-ingest merge (TWAP/EMA/CUSUM/drawdown).
    * The tmp write fully materializes the merge (which reads the live
    * state) BEFORE any rename touches it; a crash inside the rename
    * pair leaves `.old`/`.tmp` siblings that [[readState]] fail-fasts
    * on rather than silently refolding from empty.
    *
    * File fan-out sizes off the LIVE state's row count (a footer-only
    * count — merges only ever grow the key set, so the prior count is
    * a one-batch-lagged lower bound; the first oversized merge may
    * write slightly-over-target files, the next one resizes). */
  private def writeStateSwap(newState: DataFrame, statePath: String,
                             fn: String): Unit = {
    val tmp = s"$statePath.tmp"
    val n0 =
      if (new java.io.File(s"$statePath/_SUCCESS").exists())
        newState.sparkSession.read.parquet(statePath).count()
      else 0L
    val parts = (n0 / stateMaxFileRows + 1).toInt
    val sized =
      if (parts == 1) newState.coalesce(1) else newState.repartition(parts)
    sized.write.mode("overwrite").parquet(tmp)
    // the rename-pair mechanics live in ONE home with the index
    // rebalances; requireLive = false because the first merge has no
    // live state root yet
    graft.operators.Similarity.swapRoot(statePath, tmp,
      s"$statePath.old", fn, requireLive = false)
  }

  /** Read a scan-ingest state table, FAIL-FASTING on a torn swap: a
    * missing live root alongside `.old`/`.tmp` siblings means a crash
    * interrupted [[writeStateSwap]]'s rename pair — treating that as a
    * fresh (empty) state would silently refold every key's aggregate
    * from zero, the exact corruption the swap discipline exists to
    * prevent. `.old` holds the complete pre-merge state; `.tmp` the
    * (possibly complete) merged one — recovery is a manual rename. */
  private def readState(bs: SparkSession, statePath: String,
                        ddl: String, fn: String): DataFrame =
    if (new java.io.File(s"$statePath/_SUCCESS").exists())
      bs.read.parquet(statePath)
    else {
      require(!new java.io.File(s"$statePath.old").exists() &&
          !new java.io.File(s"$statePath.tmp").exists(),
        s"$fn: torn state swap at $statePath — a crash interrupted the " +
          "rename pair; recover manually (.old = pre-merge state, " +
          ".tmp = merged) instead of refolding from empty")
      bs.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    }

  /** Streaming per-key EMA (q70's live twin — the kdb scan kept
    * current by insert callbacks): each micro-batch folds through the
    * SAME sequential [[graft.operators.Ema]] pass as the batch query,
    * seeded per key by a PHANTOM carry-in row whose value IS the
    * stored EMA — Ema's "first row of a key seeds the chain" rule
    * makes the phantom the seed, and every later step is the identical
    * (aNum·v + (aDen−aNum)·prev)/aDen double chain, so the streamed
    * per-event values are BIT-EQUAL to the batch fold (the oracle IS
    * q70's SQL). Per-event rows append to `resultPath`; per-key
    * (last_t, last_i, last_ema) state rewrites through tmp + rename
    * swap (the twapIngest discipline). Requires a time-ordered feed:
    * EMA order matters materially, so ANY batch row at-or-before a
    * key's stored last event fails fast (stricter than TWAP's
    * same-µs tolerance — a same-µs lower-id row would re-order the
    * chain, not just add a zero-width interval). At-least-once on a
    * crash between result append and checkpoint commit; a planned
    * restart over a drained feed is a no-op. */
  def emaIngest(spark: SparkSession, srcDir: String,
                schemaFrom: DataFrame, prep: DataFrame => DataFrame,
                aNum: Int, aDen: Int, statePath: String,
                resultPath: String, checkpoint: String,
                statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "emaIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val q = prep(ss.readStream.schema(schemaFrom.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        mergeEmaState(batch, bid, aNum, aDen, statePath, resultPath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** One EMA batch fold: batch must carry (k, t, i, v). */
  private[graft] def mergeEmaState(batch: DataFrame, batchId: Long,
                                   aNum: Int, aDen: Int,
                                   statePath: String,
                                   resultPath: String): Unit = {
    val bs = batch.sparkSession
    val state0 = readState(bs, statePath,
      "k BIGINT, last_t BIGINT, last_i BIGINT, last_ema DOUBLE, " +
        "last_batch BIGINT", "emaIngest")
    // replayed batch (crash between state swap and checkpoint commit):
    // state AND its result partition are already written — skip both
    if (replayedBatch(state0, batchId, "emaIngest")) return
    requireNoBatchDups(batch, "k", "i", "emaIngest")
    val carry = state0.select(col("k"), col("last_t").as("t"),
      col("last_i").as("i"), col("last_ema").as("v"))
    val rows = batch.select(col("k"), col("t"), col("i"),
      col("v").cast("double").as("v"))
    // out-of-order fail-fast BEFORE folding: EMA order matters
    // materially, so any batch row at-or-before the stored last event
    // re-orders the chain (no same-µs tolerance — the TWAP contrast).
    // An id EQUAL to the stored last event's at a LATER time is id
    // reuse (duplicate delivery): it would collide with the phantom in
    // the (k, i) output anti-join and the state join-back — fail fast.
    val viol = rows.join(state0, Seq("k"))
      .filter(struct(col("t"), col("i")) <=
          struct(col("last_t"), col("last_i")) ||
        col("i") === col("last_i"))
      .limit(1).collect()
    require(viol.isEmpty,
      s"emaIngest: out-of-order or id-reusing feed for key ${
        if (viol.isEmpty) "" else viol.head.getLong(0)} — " +
        "batch row at-or-before (or reusing the id of) the stored " +
        "last event")
    val folded = graft.operators.Ema.ema(
      rows.unionByName(carry), "k", "t", "i", "v", aNum, aDen)
    // phantoms are (k, last_i) — their events were emitted by an
    // earlier batch; anti-join them out of this batch's emission
    val out = folded.join(
      state0.select(col("k"), col("last_i").as("i")),
      Seq("k", "i"), "left_anti")
    writeResultBatch(out, batchId, resultPath)
    // new state: the (t, i)-max row of (carry ∪ batch) with its folded
    // EMA — join the fold output back to the inputs for t
    val newState = folded.join(rows.unionByName(carry), Seq("k", "i"))
      .groupBy(col("k"))
      .agg(max_by(struct(col("t").as("lt"), col("i").as("li"),
          col("ema").as("le")),
        struct(col("t"), col("i"))).as("last"))
      .select(col("k"), col("last.lt").as("last_t"),
        col("last.li").as("last_i"), col("last.le").as("last_ema"),
        lit(batchId).as("last_batch"))
    writeStateSwap(newState, statePath, "emaIngest")
  }

  /** Append one batch's result rows under its `__batch` partition via
    * DYNAMIC partition overwrite — a redelivered batch (crash between
    * the result write and the state swap) REPLACES its own partition
    * instead of appending duplicates, so the result store is
    * exactly-once through every crash window (the state-side window is
    * closed by the `last_batch` stamp skip). */
  private def writeResultBatch(out: DataFrame, batchId: Long,
                               resultPath: String): Unit =
    out.withColumn("__batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch").parquet(resultPath)

  /** COMPLETE-mode twin of [[writeResultBatch]]: the batch's FULL
    * result supersedes every prior batch, so after the dynamic
    * overwrite lands (a crash-redelivered batch rewrites its partition
    * with identical content — complete output is deterministic), older
    * `__batch` partitions prune. The reader takes the latest partition
    * ([[readLatestBatch]]) — never a torn mid-overwrite root, the
    * readState swap discipline without the rename pair. */
  private def writeCompleteBatch(out: DataFrame, batchId: Long,
                                 resultPath: String): Unit = {
    writeResultBatch(out, batchId, resultPath)
    Option(new java.io.File(resultPath).listFiles).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("__batch=") &&
        f.getName.stripPrefix("__batch=").toLong < batchId)
      .foreach { d =>
        // surface (don't swallow) a stuck stale partition — harmless for
        // readLatestBatch but it must be visible, and the next batch's
        // prune retries it (r18 ADVICE)
        if (!org.apache.commons.io.FileUtils.deleteQuietly(d))
          System.err.println(s"writeCompleteBatch: stale partition $d " +
            "could not be deleted; the next batch's prune will retry")
      }
  }

  /** A checkpoint with committed batches whose durable store directory
    * has VANISHED means external tampering (a /tmp cleaner, a partial
    * rm): the planned restart would run zero micro-batches and the
    * empty-store branch would silently return a schema-correct empty —
    * the shape the readState torn-swap discipline aborts on. A
    * fired-but-zero-rows store legally EXISTS (foreachBatch's write
    * always creates the root + _SUCCESS), so this guard is exact. */
  private def requireStoreMatchesCkpt(outPath: String, checkpoint: String,
                                      fn: String): Unit = {
    val fired = Option(new java.io.File(checkpoint, "commits").listFiles)
      .exists(_.exists(_.isFile))
    require(!fired || new java.io.File(outPath).exists,
      s"$fn: checkpoint at $checkpoint has committed batches but the " +
        s"durable store at $outPath is gone — external deletion; delete " +
        "the checkpoint (or the whole base dir) to rebuild from the feed")
  }

  /** MIRROR of [[requireStoreMatchesCkpt]], checked BEFORE the stream
    * starts (r18 ADVICE): a store with `__batch` partitions whose
    * checkpoint never wrote an offsets WAL means the checkpoint was
    * deleted while the store survived — a fresh run would restart batch
    * ids at 0 and the append-mode union could double-count (and the
    * complete-mode `< batchId` prune never removes the stale
    * higher-numbered partition). The batch-0 crash window is NOT this
    * shape: Spark writes offsets/0 before the first batch runs, so a
    * legitimately redelivered batch always has a non-empty offsets
    * dir. */
  private def requireCkptMatchesStore(outPath: String, checkpoint: String,
                                      fn: String): Unit = {
    val storeHasBatches = Option(new java.io.File(outPath).listFiles)
      .toSeq.flatten
      .exists(f => f.isDirectory && f.getName.startsWith("__batch="))
    val started = Option(new java.io.File(checkpoint, "offsets").listFiles)
      .exists(_.exists(_.isFile))
    require(!storeHasBatches || started,
      s"$fn: durable store at $outPath has __batch partitions but the " +
        s"checkpoint at $checkpoint has no offsets WAL — the checkpoint " +
        "was deleted out from under the store; delete the store (or the " +
        "whole base dir) to rebuild from the feed instead of re-running " +
        "with reset batch ids")
  }

  /** Exclusive owner lock over one checkpointed durable store: Spark
    * does not support concurrent structured-streaming access to a
    * checkpoint, and the durable stores are shared mutable state across
    * JVMs (bench + spec runs) — this turns a silent-corruption risk
    * into an abort (r18 verdict "What's wrong #5"). An OS file lock
    * auto-releases on process death, so no stale-lock handling is
    * needed; a second owner in the SAME JVM surfaces as
    * OverlappingFileLockException and aborts identically
    * (WatermarkSpec pins that).
    *
    * ONE never-closed channel per lock file per JVM: POSIX fcntl drops
    * ALL of a process's locks on a file when ANY fd to it closes, so a
    * rejected second-owner attempt that opened-then-closed its own
    * channel would silently release the live owner's lock (the r19
    * self-review finding). A lock file deleted under the cached
    * channel (a staged-base rm on stamp change) is reopened fresh; the
    * stale channel is abandoned, never closed (closing it could drop a
    * concurrent holder's lock — the fd leak is bounded by testdata
    * regenerations per JVM).
    *
    * Residual window, documented: the locked functions return LAZY
    * DataFrames over the store, so a caller that parks the result
    * while a NEXT owner prunes/overwrites partitions can see a
    * mid-rewrite read. The complete-mode readers close it by eagerly
    * materializing the (key-cardinality-bounded) latest batch inside
    * the lock; the append-mode pair store is append-only outside crash
    * redelivery, where the rewritten partition is byte-identical. */
  private val storeLockChans = new java.util.concurrent.ConcurrentHashMap[
    String, java.nio.channels.FileChannel]()

  private def withStoreLock[T](ckpt: String, fn: String)(body: => T): T = {
    val lockFile = new java.io.File(ckpt + ".lock")
    Option(lockFile.getParentFile).foreach(_.mkdirs())
    val key = lockFile.getCanonicalPath
    def open() = java.nio.channels.FileChannel.open(lockFile.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    var ch = storeLockChans.computeIfAbsent(key, _ => open())
    if (!lockFile.exists()) { // deleted under the cached channel
      storeLockChans.remove(key, ch)
      ch = storeLockChans.computeIfAbsent(key, _ => open())
    }
    val lock =
      try ch.tryLock()
      catch {
        case _: java.nio.channels.OverlappingFileLockException => null
      }
    require(lock != null,
      s"$fn: the durable store under $ckpt is owned by another live " +
        "process/query (concurrent structured-streaming access to one " +
        "checkpoint is unsupported) — aborting instead of corrupting")
    try body finally lock.release()
  }

  /** The latest `__batch` partition of a complete-mode store, or None
    * on a never-fired feed. */
  private def readLatestBatch(spark: SparkSession,
                              resultPath: String): Option[DataFrame] =
    Option(new java.io.File(resultPath).listFiles).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("__batch="))
      .sortBy(_.getName.stripPrefix("__batch=").toLong)
      .lastOption.map(d => spark.read.parquet(d.getPath))

  /** Streaming per-hour VWAP — q89's live twin, and the MERGEABLE
    * member of the scan-ingest family: unlike TWAP/EMA/CUSUM/drawdown
    * (order-sensitive folds that need phantom carry-in rows and state
    * swaps), VWAP's per-hour state is three ASSOCIATIVE integer sums
    * (n, Σvol, Σ(pc·vol)) — each micro-batch's partials land under
    * their `__batch` partition via dynamic overwrite
    * ([[writeResultBatch]]), so exactly-once needs NO state swap, no
    * phantom, no order guard: a batch redelivered after any crash
    * REPLACES its own partials, and the read-side fold
    * ([[readVwapStore]] — one groupBy over the partial store)
    * reproduces the whole-history batch aggregate EXACTLY (integer
    * sums are order-free, and the closing division happens only at
    * read). `prep` maps a raw batch to (hr, pc cents, vol); zero and
    * null volumes drop here, the q89 rule. */
  def vwapIngest(spark: SparkSession, srcDir: String,
                 schemaFrom: DataFrame, prep: DataFrame => DataFrame,
                 storePath: String, checkpoint: String,
                 statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "vwapIngest") {
    // vwap keeps no committed-bid state of its own (mergeable partials
    // are the whole exactly-once story), so the deleted-checkpoint
    // mirror guard is its only reset detection
    requireCkptMatchesStore(storePath, checkpoint, "vwapIngest")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = ss.readStream.schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val p = prep(batch)
          .filter(col("vol").isNotNull && col("vol") > 0)
          .groupBy(col("hr"))
          .agg(count(lit(1)).as("n"), sum(col("vol")).as("sum_v"),
            sum((col("pc") * col("vol")).cast("decimal(38,0)"))
              .cast("long").as("sum_pv"))
        writeResultBatch(p, bid, storePath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** The VWAP card off the partial store: fold the batch partials and
    * close with the one division — bit-equal to the batch q89 chain
    * (same exact integers in, same IEEE division out). */
  def readVwapStore(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)
      .groupBy(col("hr"))
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("volume"),
        (sum(col("sum_pv")).cast("long").cast("double") /
          sum(col("sum_v")).cast("double")).as("vwap_c"))

  /** Streaming per-key CUSUM (q82's live twin): the same sequential
    * [[graft.operators.Cusum]] fold per micro-batch, seeded per key by
    * a PHANTOM carry-in row with v = stored_S + kRef — the fold's
    * first step then reads max(0, 0 + (stored_S + kRef) − kRef) =
    * stored_S exactly (S ≥ 0 by construction), so every streamed
    * per-event S is the integer the batch fold produces (the oracle IS
    * q82's SQL). Same strict out-of-order fail-fast as EMA: S is
    * emitted per event, so a same-timestamp reorder changes the middle
    * values even though the end state survives. State/result/swap
    * discipline identical to [[emaIngest]]. */
  def cusumIngest(spark: SparkSession, srcDir: String,
                  schemaFrom: DataFrame, prep: DataFrame => DataFrame,
                  kRef: Long, statePath: String, resultPath: String,
                  checkpoint: String, statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "cusumIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val q = prep(ss.readStream.schema(schemaFrom.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        mergeCusumState(batch, bid, kRef, statePath, resultPath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** One CUSUM batch fold: batch must carry (k, t, i, vq). */
  private[graft] def mergeCusumState(batch: DataFrame, batchId: Long,
                                     kRef: Long, statePath: String,
                                     resultPath: String): Unit = {
    val bs = batch.sparkSession
    val state0 = readState(bs, statePath,
      "k BIGINT, last_t BIGINT, last_i BIGINT, last_s BIGINT, " +
        "last_batch BIGINT", "cusumIngest")
    if (replayedBatch(state0, batchId, "cusumIngest")) return
    requireNoBatchDups(batch, "k", "i", "cusumIngest")
    // the seed trick: v = stored_S + kRef makes the phantom's own fold
    // step reproduce stored_S bit-for-bit
    val carry = state0.select(col("k"), col("last_t").as("t"),
      col("last_i").as("i"), (col("last_s") + kRef).as("vq"))
    val rows = batch.select(col("k"), col("t"), col("i"),
      col("vq").cast("long").as("vq"))
    // same contract as emaIngest: at-or-before rows AND id reuse fail
    val viol = rows.join(state0, Seq("k"))
      .filter(struct(col("t"), col("i")) <=
          struct(col("last_t"), col("last_i")) ||
        col("i") === col("last_i"))
      .limit(1).collect()
    require(viol.isEmpty,
      s"cusumIngest: out-of-order or id-reusing feed for key ${
        if (viol.isEmpty) "" else viol.head.getLong(0)} — " +
        "batch row at-or-before (or reusing the id of) the stored " +
        "last event")
    val folded = graft.operators.Cusum.cusum(
      rows.unionByName(carry), "k", "t", "i", col("vq"), kRef)
    val out = folded.join(
      state0.select(col("k"), col("last_i").as("i")),
      Seq("k", "i"), "left_anti")
    writeResultBatch(out, batchId, resultPath)
    val newState = folded.join(rows.unionByName(carry), Seq("k", "i"))
      .groupBy(col("k"))
      .agg(max_by(struct(col("t").as("lt"), col("i").as("li"),
          col("s").as("ls")),
        struct(col("t"), col("i"))).as("last"))
      .select(col("k"), col("last.lt").as("last_t"),
        col("last.li").as("last_i"), col("last.ls").as("last_s"),
        lit(batchId).as("last_batch"))
    writeStateSwap(newState, statePath, "cusumIngest")
  }

  /** Streaming per-key maximum drawdown (q84's live twin): the
    * summary is MERGEABLE state — per key (n, peak_c, best_key) where
    * best_key is q84's tie-total argmax key dd·2^31 + (2^31−1−eid),
    * so cross-batch merging is a plain max (key-max is associative and
    * the key ordering IS the (max dd, first event) rule). The running
    * peak seeds per batch via a PHANTOM carry-in row whose value is
    * the stored peak — the batch's cummax window then reads the global
    * running peak for every row; the phantom is excluded from n and
    * from the argmax (its own dd = 0 with a stale eid could steal a
    * zero-drawdown tie). Strict out-of-order fail-fast (the EMA rule:
    * a reordered row changes the running peak mid-stream). */
  def drawdownIngest(spark: SparkSession, srcDir: String,
                     schemaFrom: DataFrame, prep: DataFrame => DataFrame,
                     statePath: String, checkpoint: String,
                     statePartitions: Int = 2): Unit =
      withStoreLock(checkpoint, "drawdownIngest") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val q = prep(ss.readStream.schema(schemaFrom.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
      .writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        mergeDrawdownState(batch, bid, statePath)
      }
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** One drawdown state merge: batch must carry (k, t, i, vq). */
  private[graft] def mergeDrawdownState(batch: DataFrame, batchId: Long,
                                        statePath: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val bs = batch.sparkSession
    val state0 = readState(bs, statePath,
      "k BIGINT, last_t BIGINT, last_i BIGINT, n BIGINT, " +
        "peak_c BIGINT, best_key BIGINT, last_batch BIGINT",
      "drawdownIngest")
    if (replayedBatch(state0, batchId, "drawdownIngest")) return
    requireNoBatchDups(batch, "k", "i", "drawdownIngest")
    // row-level id-domain guard (the q84/ohlcPrep twin's rule): the
    // packed argmax key needs 0 <= i < 2^31 — an out-of-range id would
    // silently collide best_key across dd values instead of aborting
    val iOk = when(col("i").isNull || col("i") < 0L ||
        col("i") >= (1L << 31),
      raise_error(concat(
        lit("drawdownIngest key needs 0 <= id < 2^31, got "),
        coalesce(col("i").cast("string"), lit("NULL")))).cast("long"))
      .otherwise(col("i"))
    val rows = batch.select(col("k"), col("t"), iOk.as("i"),
      col("vq").cast("long").as("vq"), lit(false).as("ph"))
    val viol = rows.join(state0, Seq("k"))
      .filter(struct(col("t"), col("i")) <=
          struct(col("last_t"), col("last_i")) ||
        col("i") === col("last_i"))
      .limit(1).collect()
    require(viol.isEmpty,
      s"drawdownIngest: out-of-order or id-reusing feed for key ${
        if (viol.isEmpty) "" else viol.head.getLong(0)} — " +
        "batch row at-or-before (or reusing the id of) the stored " +
        "last event")
    val carry = state0.select(col("k"), col("last_t").as("t"),
      col("last_i").as("i"), col("peak_c").as("vq"), lit(true).as("ph"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val led = rows.unionByName(carry)
      .withColumn("peak", max(col("vq")).over(w))
      .withColumn("dd", col("peak") - col("vq"))
    val part = led.groupBy(col("k")).agg(
      sum(when(!col("ph"), 1L).otherwise(0L)).as("dn"),
      max(col("vq")).as("pk"), // phantom = stored peak rides along
      max(when(!col("ph"),
        col("dd") * (1L << 31) + (lit((1L << 31) - 1) - col("i"))))
        .as("bk"),
      max_by(struct(col("t").as("lt"), col("i").as("li")),
        struct(col("t"), col("i"))).as("last"))
    val st = state0.select(col("k"), col("n").as("s_n"),
      col("best_key").as("s_bk"))
    val merged = part.join(st, Seq("k"), "left_outer")
      .select(col("k"), col("last.lt").as("last_t"),
        col("last.li").as("last_i"),
        (coalesce(col("s_n"), lit(0L)) + col("dn")).as("n"),
        col("pk").as("peak_c"),
        greatest(col("s_bk"), col("bk")).as("best_key"),
        lit(batchId).as("last_batch"))
    writeStateSwap(merged, statePath, "drawdownIngest")
  }

  /** Stage a DataFrame as a TIME-ORDERED multi-file feed: rows are
    * range-split on `tsCol` into `nChunks` single-file parquet chunks
    * with ascending modification times, so a file-source stream with
    * `maxFilesPerTrigger = 1` replays them as micro-batches in event-
    * time order — the shape of a real journal, where appends arrive
    * roughly ordered. Because chunk time-ranges are DISJOINT and
    * ascending, no row is ever behind the watermark at arrival, so a
    * watermarked consumer drops nothing and its output set equals the
    * batch computation exactly (the q75 oracle argument) while its
    * state still evicts as the watermark advances past each chunk.
    *
    * Staging device for tests/queries (one coalesce(1) pass per
    * chunk); production feeds are already journals. */
  def stageTimeOrderedFeed(df: DataFrame, tsCol: String, nChunks: Int,
                           dir: String): Unit = {
    require(nChunks >= 1, s"nChunks must be >= 1, got $nChunks")
    val mm = df.agg(min(col(tsCol).cast("long")),
      max(col(tsCol).cast("long")),
      sum(when(col(tsCol).isNull, 1L).otherwise(0L))).head()
    require(!mm.isNullAt(0),
      s"stageTimeOrderedFeed: empty input (or all-null $tsCol) — " +
        "nothing to stage")
    // a null ts would fall into NO chunk's range filter and silently
    // vanish from the feed, breaking the stream==batch contract
    require(mm.getLong(2) == 0L,
      s"stageTimeOrderedFeed: ${mm.getLong(2)} null-$tsCol rows would " +
        "be dropped — clean or route them before staging")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (hi - lo) / nChunks + 1)
    val fdir = new java.io.File(dir)
    fdir.mkdirs()
    val base = System.currentTimeMillis() - (nChunks + 1) * 60000L
    for (i <- 0 until nChunks) {
      val cLo = lo + i * width
      val cHi = if (i == nChunks - 1) hi + 1 else lo + (i + 1) * width
      val tmp = new java.io.File(fdir, s"_tmp_$i")
      df.filter(col(tsCol).cast("long") >= cLo &&
          col(tsCol).cast("long") < cHi)
        .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"stageTimeOrderedFeed: no part file in $tmp"))
      val dst = new java.io.File(fdir, f"chunk_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(base + i * 60000L)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
    new java.io.File(fdir, "_SUCCESS").createNewFile()
  }

  /** Declarative watermarked SESSIONIZATION: `session_window` merges
    * per-key state-store sessions as rows arrive and emits each session
    * exactly once when the watermark passes its end — the production
    * form of the `sessionizeStream` gap logic (which keeps the custom
    * flatMapGroupsWithState shape for arbitrary per-session state). A
    * closed session can never reopen, so state is bounded by the open
    * sessions inside the watermark horizon — the property that keeps a
    * 100 TB clickstream's session store flat. */
  def sessionWindowAgg(stream: DataFrame, tsCol: String, keyCol: String,
                       gap: String, delay: String): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  final case class Ev(user_id: Long, ts_us: Long)
  final case class SessState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Int)

  /** Custom streaming state (reference: live tables mutated by insert
    * callbacks): per-user sessionization via flatMapGroupsWithState.
    * Emits a session when a gap > `gapUs` arrives; the open session
    * stays in the state store (checkpointable — the journal analog).
    * Within a micro-batch, events are sorted per user before folding.
    */
  def sessionizeStream(spark: SparkSession, srcDir: String,
                       schemaFrom: DataFrame, gapUs: Long,
                       queryName: String,
                       prep: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    val events: Dataset[Ev] =
      prep(spark.readStream.schema(schemaFrom.schema).parquet(srcDir)).as[Ev]
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = evs.toSeq.sortBy(_.ts_us)
          var st = state.getOption.orNull
          val out = Seq.newBuilder[Session]
          for (e <- sorted) {
            if (st == null) st = SessState(e.ts_us, e.ts_us, 1)
            else if (e.ts_us - st.last > gapUs) {
              out += Session(uid, st.start, st.last, st.n)
              st = SessState(e.ts_us, e.ts_us, 1)
            } else st = SessState(st.start, e.ts_us, st.n + 1)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName(queryName).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
