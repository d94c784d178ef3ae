package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the round-16 third-session operators at the 100×
  * replica (/tmp/sf10 — 500k docs):
  *
  *   - t90 char entropy / t91 LZW / t93 AC blocklist: the claim is all
  *     three are ONE codegen scan — cost ~ text mass, no shuffle.
  *   - t92 TextRank: two corpus-sized census shuffles + a bounded
  *     driver iteration — the loop must be corpus-size-independent.
  *   - t95 source KL: one (src, word) census shuffle; everything else
  *     runs over the checkpointed vocab×sources census.
  *
  *   sbt "runMain graft.TimeR16c /tmp/sf10"
  */
object TimeR16c {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
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
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // one-file replica → repartition to real parallelism (the TimeR16
    // input-split lesson)
    val docs = Tables.load(spark, dir, "documents")
      .repartition(32).cache()
    docs.agg(count(lit(1))).collect()

    // narrow-map probes MUST aggregate over the computed column — a
    // bare count() prunes the expression entirely (the t42 lesson)
    for (rep <- 1 to 2) {
      time(s"t90 char entropy (pass $rep)") {
        operators.CorpusStats.charEntropy(docs, "doc_id", "text", 256L, 288L)
          .agg(sum($"ent_num")).collect()
      }
      time(s"t91 lzw phrases (pass $rep)") {
        operators.CorpusStats.compressionRatio(docs, "doc_id", "text", 2L, 3L)
          .agg(sum($"n_phrases")).collect()
      }
      time(s"t93 AC blocklist (pass $rep)") {
        operators.CorpusStats.blocklistCensus(docs, "doc_id", "text",
            Queries.blockPhrases, 13L)
          .agg(sum($"n_hits")).collect()
      }
      time(s"t92 textrank (pass $rep)") {
        operators.TextRank.keywords(docs, "text",
          minDf = 2L, maxNodes = 64, iters = 5, k = 10).collect()
      }
      time(s"t95 source KL (pass $rep)") {
        operators.CorpusStats.sourceKl(docs, "source", "text", 1L, 10L)
          .agg(sum($"kl_num")).collect()
      }
      time(s"t97 zipf card (pass $rep)") {
        operators.CorpusStats.zipfCard(docs, "doc_id", "text", 64).collect()
      }
    }

    // ---- the vector/temporal members (200k vectors / 10M events)
    val emb = Tables.load(spark, dir, "embeddings")
      .repartition(32).cache()
    emb.agg(count(lit(1))).collect()
    val cents = operators.Similarity.fitCentroids(emb, "vec_id",
      "embedding", nCells = 8, iters = 3)
    val ev = Tables.load(spark, dir, "events").repartition(32).cache()
    ev.agg(count(lit(1))).collect()
    // the langid kernel for the gate stack + confidence (fit once)
    val lm = operators.LangNb.fit(docs.filter($"doc_id" % 5 =!= 4L),
      "text", "lang")
    val kern = operators.LangNb.kernel(lm)
    for (rep <- 1 to 2) {
      time(s"s23 radius join, 50 queries (pass $rep)") {
        operators.Similarity.radiusJoin(emb, "vec_id", "embedding",
          (0L until 50L).toSeq, 0.28).agg(count(lit(1))).collect()
      }
      time(s"s24 cell balance (pass $rep)") {
        operators.Similarity.cellBalanceCard(emb, "vec_id", "embedding",
          cents, 9L, 8L).collect()
      }
      time(s"s25 dispersion (pass $rep)") {
        operators.Similarity.dispersionCard(emb, "embedding", "label")
          .collect()
      }
      time(s"q77 twap 10M events (pass $rep)") {
        Queries.twapOf(ev.select($"user_id", $"ts", $"value", $"event_id"))
          .agg(sum($"twap")).collect()
      }
      time(s"t96 langid confidence (pass $rep)") {
        operators.LangNb.confidence(docs, "doc_id", "text", kern, 2L)
          .agg(sum($"margin64")).collect()
      }
      time(s"t98 gate stack (pass $rep)") {
        val p = Queries.blockPhrases.size
        docs.select($"doc_id",
            graft.functions.EntropyExpr.charEntropy64($"text").as("e"),
            element_at(graft.functions.AcCounts.acCounts($"text",
              Queries.blockPhrases), p + 1).as("h"),
            element_at(coalesce(graft.functions.LangNbScore.stats($"text",
              kern), typedLit(Seq(-1L, 0L, 0L))), 2).as("mg"),
            graft.functions.QualityExpr.qualityScore($"text").as("q"))
          .agg(sum($"e"), sum($"h"), sum($"mg"), sum($"q")).collect()
      }
      time(s"m08 audio VAD (pass $rep)") {
        operators.Multimodal.audioActivity(
            docs.select($"doc_id", $"text".cast("binary").as("data")),
            "doc_id", "data", 32, 1000L)
          .agg(sum($"n_active"), sum($"max_run")).collect()
      }
    }
    spark.stop()
  }
}
