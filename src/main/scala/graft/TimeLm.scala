package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: stage-by-stage timing of the t33 scoring pipeline —
  * where does the per-rep time go (pair explode, vocab map, model
  * joins, aggregate)? `runMain graft.TimeLm <sfDir> [reps]`. */
object TimeLm {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 4
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val lm = operators.NgramLm.fit(docs.filter($"lang" === "en"), "text",
      cacheModel = true)
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); mk.count()
        (System.nanoTime() - t0) / 1e3 / 1e3
      }
      println(f"[tlm] $tag%-14s " + ts.map(t => f"$t%.0f").mkString(" ") + " ms")
    }
    val ws = split($"text", " ")
    val m = greatest(size(ws) - 1, lit(0))
    val pair = arrays_zip(slice(ws, lit(1), m).as("w1"),
      slice(ws, lit(2), m).as("w2"))
    time("explode")(docs.select($"doc_id", explode_outer(pair).as("pr")))
    time("explode+agg")(docs.select($"doc_id", explode_outer(pair).as("pr"))
      .groupBy($"doc_id").agg(count(lit(1))))
    time("score")(operators.NgramLm.score(docs, "doc_id", "text", lm, 24L, 5L))
    time("score+sort")(operators.NgramLm
      .score(docs, "doc_id", "text", lm, 24L, 5L).orderBy($"doc_id"))
    time("t33")(SparkEntry.queries("t33_lm_quality")(spark, dir))
    // plan-fixed overhead: same score plan over ZERO corpus rows —
    // whatever remains is broadcast/stage scheduling, not per-row work
    time("score-empty")(operators.NgramLm
      .score(docs.limit(0), "doc_id", "text", lm, 24L, 5L))
    // AQE off: does stage materialization account for the fixed cost?
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("score-noAQE")(operators.NgramLm
      .score(docs, "doc_id", "text", lm, 24L, 5L))
    time("empty-noAQE")(operators.NgramLm
      .score(docs.limit(0), "doc_id", "text", lm, 24L, 5L))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the hash-space twin (t42). The folded plan is a narrow map, so a
    // bare count() would PRUNE the scoring expression entirely (the
    // t24 lesson) — force full evaluation through sum aggregates, and
    // time the string path the same way for a like-for-like read
    val hlm = operators.NgramLm.fitHashed(docs.filter($"lang" === "en"),
      "text", cacheModel = true)
    time("score-sum")(operators.NgramLm
      .score(docs, "doc_id", "text", lm, 24L, 5L)
      .agg(sum($"s64"), sum($"keep")))
    time("scoreHashed-sum")(operators.NgramLm
      .scoreHashed(docs, "doc_id", "text", hlm, 24L, 5L)
      .agg(sum($"s64"), sum($"keep")))
    time("hashed-joins-sum")(operators.NgramLm
      .scoreHashed(docs, "doc_id", "text", hlm, 24L, 5L,
        forceJoins = true)
      .agg(sum($"s64"), sum($"keep")))
    if (sys.env.contains("SPARK_GRAFT_TIMELM_BASE")) {
      // cost decomposition of the pair explode: i64 gram hashes (one
      // codegen pass, no strings) vs the string-struct pair array
      import graft.functions.NgramHashExpr.{ngramHashes, bigramHashPairs}
      time("hash-explode")(docs.select(explode(ngramHashes($"text", 2))))
      time("split-explode")(docs.select(explode(split($"text", " "))))
      time("hpair-explode")(docs.select($"doc_id",
        explode_outer(bigramHashPairs($"text")).as("pr")))
      time("hpair+agg")(docs.select($"doc_id",
        explode_outer(bigramHashPairs($"text")).as("pr"))
        .groupBy($"doc_id").agg(count(lit(1))))
    }
    if (sys.env.contains("SPARK_GRAFT_TIMELM_SHARDS")) {
      // t37 shape on a bare documents dir: trained merges + subword
      // sequences + id-mapped packed shards
      import org.apache.spark.sql.expressions.Window
      val wf = operators.Bpe.wordFreq(docs, "text").cache()
      val merges = operators.Bpe.trainMergesFromFreq(wf, 40)
      time("t37-shards") {
        val wt = broadcast(operators.Bpe.wordTokens(wf, merges))
        val vid = broadcast(operators.Bpe.tokenCensusFromFreq(wf, merges)
          .withColumn("id", (row_number().over(
            Window.orderBy($"freq".desc, $"token".asc)) - 1).cast("long"))
          .select($"token", $"id"))
        val spans = operators.Packing.chunkSpans(
          operators.Bpe.docTokenCounts(docs, "doc_id", "text", wf, merges),
          "doc_id", $"n_btok", budget = 512L, shards = 4)
          .select($"doc_id", $"shard",
            ($"start_chunk" * 512L + $"chunk_offset").as("cum_excl"))
        val toks = docs
          .select($"doc_id",
            posexplode(split($"text", " ")).as(Seq("wi", "word")))
          .filter($"word" =!= "")
          .join(wt, "word")
          .select($"doc_id", $"wi", posexplode($"toks").as(Seq("si", "token")))
          .join(vid, "token")
        val k = row_number().over(
          Window.partitionBy($"doc_id").orderBy($"wi", $"si"))
          .cast("long") - 1L
        toks.withColumn("k", k)
          .join(spans, "doc_id")
          .withColumn("g", $"cum_excl" + $"k")
          .select($"shard",
            graft.functions.RF.euclidDiv($"g", lit(512L)).as("chunk"),
            pmod($"g", lit(512L)).as("pos"), $"id")
          .groupBy($"shard", $"chunk")
          .agg(count(lit(1)).as("n_tokens"))
      }
    }
    if (sys.env.contains("SPARK_GRAFT_TIMELM_DSIR")) {
      val m = operators.Dsir.fit(docs.filter($"lang" === "en"), docs,
        "text", n = 2, buckets = 1 << 16)
      time("dsir-top100")(operators.Dsir
        .selectTopK(docs, "doc_id", "text", m, 100))
    }
    if (sys.env.contains("SPARK_GRAFT_TIMELM_PLAN")) {
      val df = operators.NgramLm.score(docs, "doc_id", "text", lm, 24L, 5L)
      df.count()
      println(df.queryExecution.executedPlan.toString
        .linesIterator.map(_.take(110)).take(60).mkString("\n"))
    }
    spark.stop()
  }
}
