package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 100× probes over the make_scale replica (default
  * /tmp/sf10): the new operators' scale shapes —
  *   - q82 CUSUM: one key repartition + parallel sequential folds
  *     over 10M events;
  *   - t100 concentration card: one window + one aggregation over
  *     500k docs;
  *   - m09 WAV wrap + REAL javax.sound decode: typed passes over
  *     500k payloads;
  *   - s26/s27: IVFADC rebalance lifecycle + cell card over 200k
  *     vectors (fit-dominated — the bounded-model argument);
  *   - t92 re-probe (the DictPairCodes fused walk).
  * Usage: runMain graft.TimeR17 [sfDir] */
object TimeR17 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // one-file replica → repartition to real parallelism (the TimeR16
    // input-split lesson)
    val ev = Tables.load(spark, dir, "events").repartition(32).cache()
    ev.agg(count(lit(1))).collect()
    val docs = Tables.load(spark, dir, "documents")
      .repartition(32).cache()
    docs.agg(count(lit(1))).collect()

    for (rep <- 1 to 2) {
      time(s"q82 cusum 10M events (pass $rep)") {
        operators.Cusum.cusum(ev, "user_id", "ts", "event_id",
            expr("CAST(round(value * 100) AS BIGINT)"), kRef = 5000L)
          .agg(sum($"s")).collect()
      }
      time(s"t100 concentration card (pass $rep)") {
        operators.CorpusStats.concentrationCard(docs, "source",
          "doc_id", "text").collect()
      }
      time(s"m09 wav wrap+decode 500k (pass $rep)") {
        operators.Multimodal.audioStats(
            operators.Multimodal.wrapPcm8Wav(
              docs.select($"doc_id",
                substring($"text", 1, 200).cast("binary").as("d")),
              "doc_id", "d"),
            "media_id", "wav")
          .agg(sum($"sum_sq")).collect()
      }
      time(s"t92 textrank fused walk (pass $rep)") {
        operators.TextRank.keywords(docs, "text",
          minDf = 2L, maxNodes = 64, iters = 5, k = 10).collect()
      }
    }

    for (rep <- 1 to 2) {
      time(s"q84 drawdown 10M events (pass $rep)") {
        Queries.drawdownOf(ev.select(col("user_id"), col("ts"),
          col("value"), col("event_id"))).agg(sum($"max_dd_c")).collect()
      }
      time(s"q86 gap quantiles 10M (pass $rep)") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
        val gaps = ev.select($"user_id", $"event_type",
            expr("ts div 1000").as("tus"), $"event_id")
          .withColumn("gap_us", lead($"tus", 1).over(w) - $"tus")
        operators.Quantiles.quantileCensus(gaps, Seq("event_type"),
          "gap_us", Seq(50, 90, 99)).collect()
      }
      time(s"d16 normalized dedup 500k (pass $rep)") {
        val norm = lower(trim(regexp_replace(col("text"),
          "[ \\t\\n]+", " ")))
        docs.groupBy(norm.as("nk")).agg(count(lit(1)).as("c"))
          .agg(count(lit(1)), sum($"c"), max($"c")).collect()
      }
    }

    val emb = Tables.load(spark, dir, "embeddings")
      .repartition(32).cache()
    emb.agg(count(lit(1))).collect()
    val path = s"/tmp/graft_ivfpq_probe/${System.nanoTime()}"
    time("s26 buildIvfPqIndex (half, 200k)") {
      operators.Pq.buildIvfPqIndex(emb.filter($"vec_id" % 2 === 0),
        "vec_id", "embedding", nCells = 8, m = 4, kSub = 8, path)
    }
    time("s26 appendToIvfPqIndex (half)") {
      operators.Pq.appendToIvfPqIndex(emb.filter($"vec_id" % 2 =!= 0),
        "vec_id", "embedding", path)
    }
    time("s26 rebalanceIvfPqIndex (full)") {
      operators.Pq.rebalanceIvfPqIndex(emb, "vec_id", "embedding",
        nCells = 8, m = 4, kSub = 8, path)
    }
    val cents = operators.Pq.loadIvfPqModel(spark, path).coarse
    for (rep <- 1 to 2)
      time(s"s27 cell balance 200k (pass $rep)") {
        operators.Similarity.cellBalanceCard(emb, "vec_id", "embedding",
          cents, 9L, 8L, l2 = true).collect()
      }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    spark.stop()
  }
}
