package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the round-13 curation operators at the 100× replica
  * (/tmp/sf10 — 500k docs / 200k embeddings):
  *
  *   - t44 LSH dedup index lifecycle, SPLIT into its phases: build
  *     (the one-time signature hash of the accumulated corpus), append
  *     (a snapshot's marginal cost), probe+verify (the recurring
  *     per-batch cost — the number that matters at 100 TB).
  *   - t45 prototype scoring (narrow-map claim: full-eval via
  *     agg(sum), never count() — the t24/t42 pruning lesson).
  *   - t46 k-center greedy (k rounds × one scan each).
  *   - t48 epoch mixing, full manifest materialized.
  *
  *   sbt "runMain graft.TimeCurate /tmp/sf10"
  */
object TimeCurate {
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
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")

    // warm the scans + codegen
    docs.agg(count(lit(1))).collect(); emb.agg(count(lit(1))).collect()

    val base = java.nio.file.Files.createTempDirectory("curate100x").toString
    val idx = s"$base/lsh"
    time("t44 buildLshIndex (1/2)") {
      operators.Dedup.buildLshIndex(docs.filter($"doc_id" % 4 < 2),
        "doc_id", "text", 16, 2, idx)
    }
    time("t44 appendToLshIndex (1/4)") {
      operators.Dedup.appendToLshIndex(docs.filter($"doc_id" % 4 === 2),
        "doc_id", "text", idx)
    }
    val cands = time("t44 probe (candidates)") {
      val c = operators.Dedup.probeLshIndex(docs.filter($"doc_id" % 4 === 3),
        "doc_id", "text", idx, maxBucketSize = 100)
      println(s"  candidates: ${c.count()}")
      c
    }
    time("t44 jaccard verify") {
      val v = operators.Dedup.jaccardVerify(
        cands.select($"id_idx".as("id_a"), $"id_new".as("id_b")),
        docs, "doc_id", "text", 0.5)
      println(s"  verified: ${v.count()}")
    }

    val cent = time("t45 exactMean (anchor)") {
      operators.Similarity.exactMean(emb.filter($"label" === 0), "embedding")
    }
    for (rep <- 1 to 3) time(s"t45 prototypeScore rep$rep") {
      // full-eval: a bare count() would prune the scoring expression
      val r = operators.Similarity.prototypeScore(emb, "vec_id",
        "embedding", cent, 0.2).agg(sum($"score"), sum($"keep")).collect()
      if (rep == 1) println(s"  sums: ${r.head}")
    }

    time("t46 kCenterGreedy k=8") {
      val r = operators.Similarity.kCenterGreedy(emb, "vec_id",
        "embedding", k = 8, seedId = 0L).collect()
      println(s"  centers: ${r.map(_.getLong(1)).mkString(",")}")
    }

    for (rep <- 1 to 3) time(s"t48 epochMix rep$rep") {
      val m = operators.Sampling.epochMix(docs, "doc_id", "source", "text",
        Map("src0" -> 800000L, "src1" -> 600000L, "src2" -> 250000L,
          "src3" -> 70000L))
      m.queryExecution.toRdd.foreach(_ => ())
    }

    // t51: the zero-shuffle Bloom probe vs the exact broadcast-join
    // report over the SAME corpus/bench split (the sum keeps the
    // expression un-pruned; the filter rides the scan either way)
    val bench = docs.filter($"doc_id" % 97 === 0)
    val corpus = docs.filter($"doc_id" % 97 =!= 0)
    val bits = time("t51 bloomBits (bench fold)") {
      operators.Decontam.bloomBits(bench, "text", 3, 3, 1 << 20)
    }
    for (rep <- 1 to 3) time(s"t51 bloomReport rep$rep") {
      val r = operators.Decontam.bloomReport(corpus, "doc_id", "text",
        3, 3, 1 << 20, bits).agg(count(lit(1)), sum($"n_bloom")).collect()
      if (rep == 1) println(s"  flagged/sum: ${r.head}")
    }
    for (rep <- 1 to 2) time(s"t09 exact report rep$rep") {
      val r = operators.Decontam.report(corpus, "doc_id", "text",
        bench, "text", 3).agg(count(lit(1)), sum($"n_hits")).collect()
      if (rep == 1) println(s"  flagged/sum: ${r.head}")
    }

    // s13 production lifecycle: project + persist ONCE, then per-query
    // searches over the 16-dim table (vs the 64-dim brute-force scan)
    val projDir = s"$base/jl16"
    time("s13 jlProject+persist d'=16") {
      operators.Similarity.jlProject(emb, "vec_id", "embedding", 16)
        .write.parquet(projDir)
    }
    val projTbl = spark.read.parquet(projDir)
    for (rep <- 1 to 3) time(s"s13 jlSearchProjected rep$rep") {
      val r = operators.Similarity.jlSearchProjected(projTbl,
        queryId = 0L, k = 10).collect()
      if (rep == 1) println(s"  top: ${r.map(_.getLong(0)).mkString(",")}")
    }
    for (rep <- 1 to 2) time(s"s01 bruteForceTopK d=64 rep$rep") {
      operators.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        0L, 10).collect()
    }

    // q64: HLL census over the 6M-row lineitem replica
    val li = Tables.load(spark, dir, "lineitem")
    li.agg(count(lit(1))).collect()
    for (rep <- 1 to 3) time(s"q64 hll census rep$rep") {
      val r = operators.Hll.census(li, Seq("l_returnflag"), "l_orderkey",
        logM = 10).collect()
      if (rep == 1) r.foreach(x => println(s"  $x"))
    }
    for (rep <- 1 to 2) time(s"q64 exact distinct rep$rep") {
      li.groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey")).collect()
    }

    // m05: persisted signature index lifecycle over the 500k-doc
    // replica treated as media bytes (decode+hash once per phase)
    val media = docs.select($"doc_id", $"text".cast("binary").as("data"))
    def sigs(f: org.apache.spark.sql.DataFrame) =
      operators.Multimodal.perceptualHash(f, "doc_id", "data")
        .select($"media_id".as("id"), $"phash".as("sh"))
    val sigIdx = s"$base/sigidx"
    time("m05 buildSigIndex (1/2)") {
      operators.Dedup.buildSigIndex(sigs(media.filter($"doc_id" % 4 < 2)),
        "phash62", sigIdx)
    }
    time("m05 appendToSigIndex (1/4)") {
      operators.Dedup.appendToSigIndex(sigs(media.filter($"doc_id" % 4 === 2)),
        "phash62", sigIdx)
    }
    time("m05 probeSigIndex (1/4)") {
      val p = operators.Dedup.probeSigIndex(
        sigs(media.filter($"doc_id" % 4 === 3)), "phash62", sigIdx)
      println(s"  pairs: ${p.count()}")
    }

    // q70: per-key ema fold (repartition + in-partition sort + fold)
    val ev = Tables.load(spark, dir, "events")
    ev.agg(count(lit(1))).collect()
    for (rep <- 1 to 3) time(s"q70 ema fold rep$rep") {
      val r = operators.Ema.ema(ev, "user_id", "ts", "event_id",
        "value", 1, 2).agg(count(lit(1)), sum($"ema")).collect()
      if (rep == 1) println(s"  rows/sum: ${r.head}")
    }

    // q65: census quantiles vs the row-buffering median aggregate
    for (rep <- 1 to 3) time(s"q65 quantile census rep$rep") {
      val r = operators.Quantiles.quantileCensus(li, Seq("l_returnflag"),
        "l_quantity", Seq(50, 90, 99)).collect()
      if (rep == 1) r.foreach(x => println(s"  $x"))
    }
    for (rep <- 1 to 2) time(s"q65 sort-based median rep$rep") {
      li.groupBy($"l_returnflag")
        .agg(median($"l_quantity"), percentile_approx($"l_quantity",
          lit(0.9), lit(10000))).collect()
    }

    // t56: raw-HTML extraction over the staged 500k-doc corpus — full
    // eval via agg(sum(...)) over the OUTPUT columns (a bare count()
    // would prune the expression, the t24/t42 lesson)
    val staged = docs.select($"doc_id",
      operators.Html.stagedHtmlCol($"doc_id", $"lang", $"source", $"text")
        .as("html"))
    for (rep <- 1 to 2) time(s"t56 staging baseline rep$rep") {
      staged.agg(sum(length($"html"))).collect()
    }
    for (rep <- 1 to 3) time(s"t56 htmlExtract rep$rep") {
      val r = operators.Html.cleanHtml(staged, "html", textOut = "t")
        .agg(sum(length($"t")), sum($"n_tags"), sum($"n_boiler")).collect()
      if (rep == 1) println(s"  sums: ${r.head}")
    }

    // t62: BM25 over the 500k-doc corpus (stats action + one scoring job)
    for (rep <- 1 to 3) time(s"t62 bm25 rep$rep") {
      val r = operators.TfIdf.bm25Search(docs, "doc_id", "text",
        Seq("spark", "table", "merge"), k = 10).collect()
      if (rep == 1) println(s"  top: ${r.take(2).mkString(";")}")
    }

    // s14: NN-descent graph build (one-time index cost) + beam search
    // (the recurring per-batch cost) vs the s11 IVF k-NN join
    val gdir = s"$base/graph"
    time("s14 knnGraph build+persist") {
      operators.GraphAnn.buildGraphIndex(emb, "vec_id", "embedding",
        k = 8, nBuckets = (emb.count() / 16).toInt.max(8), iters = 2,
        path = gdir)
    }
    for (rep <- 1 to 2) time(s"s14 exact knnJoin 20q rep$rep") {
      operators.Similarity.knnJoin(emb, "vec_id", "embedding",
        (0L until 20L).toSeq, 10).agg(count(lit(1))).collect()
    }
    val gEdges = spark.read.parquet(s"$gdir/edges").distinct()
    val gNodes = spark.read.parquet(s"$gdir/nodes")
    val ki = time("s14 kernelIndex load (once)") {
      operators.GraphAnn.kernelIndex(gEdges, gNodes, "id", "v")
    }
    for (rep <- 1 to 3) time(s"s14 beam kernel 20q rep$rep") {
      val r = operators.GraphAnn.searchKernel(spark, ki,
        (0L until 20L).toSeq, k = 10, beamWidth = 32, hops = 3, nSeeds = 16)
        .agg(count(lit(1)), sum($"score")).collect()
      if (rep == 1) println(s"  rows/sum: ${r.head}")
    }
    for (rep <- 1 to 2) time(s"s14 beam stage-form 20q rep$rep") {
      operators.GraphAnn.searchGraphIndex(spark, gdir,
        (0L until 20L).toSeq, k = 10, beamWidth = 32, hops = 3, nSeeds = 16)
        .agg(count(lit(1)), sum($"score")).collect()
    }

    for (rep <- 1 to 3) time(s"s12 mmrRerank rep$rep") {
      val r = operators.Similarity.mmrRerank(emb, "vec_id", "embedding",
        queryId = 0L, shortlist = 32, k = 8, lamNum = 7, lamDen = 10)
        .collect()
      if (rep == 1) println(s"  picks: ${r.map(_.getLong(1)).mkString(",")}")
    }
    spark.stop()
  }
}
