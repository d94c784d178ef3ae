package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the round-15 operators at the 100× replica
  * (/tmp/sf10 — 500k docs):
  *
  *   - t65 byte-level BPE: the one corpus pre-token shuffle + the
  *     bounded driver merge loop (40 merges), and the distinct-word
  *     token-count probe (t70's engine side).
  *   - t66 trained language ID: fit (one gram shuffle) + predict
  *     (narrow explode + broadcast probes) — full-eval via agg.
  *   - t68 URL canonicalization + host-cap census (pure string maps).
  *   - t69 line-level boilerplate dedup (census + broadcast anti-probe).
  *   - t05 Luhn-gated redaction (codegen scan) — full-eval via agg(sum)
  *     (the t24/t42 count()-pruning lesson).
  *
  *   sbt "runMain graft.TimeR15 /tmp/sf10"
  */
object TimeR15 {
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

    // the 100× replica is ONE ~150 MB parquet file → 2 input splits;
    // repartition+cache so the probe measures operator cost at real
    // parallelism (at 100 TB the scan arrives in thousands of splits)
    val docs = Tables.load(spark, dir, "documents")
      .repartition(32).cache()
    docs.agg(count(lit(1))).collect() // warm scan + materialize cache

    // t65/t70: byte BPE
    val wf = time("t65 byteWordFreq (cache)") {
      val w = operators.Bpe.byteWordFreq(docs, "text").cache()
      println(s"  distinct pre-tokens: ${w.count()}")
      w
    }
    val merges = time("t65 trainMergesBytes (40)") {
      operators.Bpe.trainMergesBytesFromFreq(wf, 40)
    }
    time("t70 byteWordTokenCounts") {
      val r = operators.Bpe.byteWordTokenCounts(wf, merges)
        .agg(sum($"ntok")).collect()
      println(s"  total subword tokens over distinct words: ${r.head}")
    }
    wf.unpersist()

    // t66: trained language ID
    val m = time("t66 LangNb.fit (80% split)") {
      operators.LangNb.fit(docs.filter($"doc_id" % 5 =!= 4L), "text",
        "lang")
    }
    for (rep <- 1 to 2) time(s"t66 predictStages rep$rep (stage plan)") {
      val r = operators.LangNb.predictStages(docs, "doc_id", "text", m)
        .groupBy($"lang_pred").count().collect()
      if (rep == 1) println(s"  census: ${r.mkString(" ")}")
    }
    for (rep <- 1 to 2) time(s"t66 predict rep$rep (gated — routes " +
        "through the fold)") {
      val r = operators.LangNb.predict(docs, "doc_id", "text", m)
        .groupBy($"lang_pred").count().collect()
      if (rep == 1) println(s"  census: ${r.mkString(" ")}")
    }
    val kern = time("t66 kernel fold") { operators.LangNb.kernel(m) }
    for (rep <- 1 to 3) time(s"t66 predictFast rep$rep (kernel)") {
      val r = operators.LangNb.predictFast(docs, "doc_id", "text", kern)
        .groupBy($"lang_pred").count().collect()
      if (rep == 1) println(s"  census: ${r.mkString(" ")}")
    }

    // t68: URL canonicalization + host caps (the t68 construction)
    val urled = docs.withColumn("url", expr(
      "(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || " +
        "'://WWW.' || source || '.Example.COM' || " +
        "CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END || " +
        "'/docs/' || CAST(doc_id % 5 AS STRING) || " +
        "CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed' " +
        "WHEN doc_id % 4 = 1 THEN '?id=' || CAST(doc_id % 7 AS STRING) " +
        "ELSE '#top' END)"))
    for (rep <- 1 to 3) time(s"t68 hostCapCensus rep$rep") {
      val r = graft.functions.Url.hostCapCensus(urled, "doc_id", "url", 3)
        .agg(sum($"n_urls"), sum($"n_canon"), sum($"n_kept")).collect()
      if (rep == 1) println(s"  sums: ${r.head}")
    }

    // t69: line dedup over constructed pages
    val paged = docs.withColumn("page", concat(
      lit("Cookie notice: accept all cookies"), lit("\n"),
      lit("Home / About / "), $"source", lit("\n"),
      lit("Language: "), $"lang", lit("\n"),
      $"text", lit("\n"),
      lit("Copyright 2026 "), $"source"))
    for (rep <- 1 to 3) time(s"t69 lineDedup rep$rep") {
      val r = operators.CorpusStats.lineDedup(paged, "doc_id", "page", 10)
        .agg(sum($"n_kept"), sum(length($"clean"))).collect()
      if (rep == 1) println(s"  sums: ${r.head}")
    }

    // t05: Luhn-gated redaction — full-eval (count() would prune it)
    val pii = docs.withColumn("t", concat($"text",
      lit(" card 4111 1111 1111 111"), ($"doc_id" % 10).cast("string"),
      lit(" call (555) 123-4567")))
    for (rep <- 1 to 3) time(s"t05 redactPii+Luhn rep$rep") {
      val r = pii.select(graft.functions.Text.redactPii($"t").as("c"))
        .agg(sum(length($"c"))).collect()
      if (rep == 1) println(s"  total clean chars: ${r.head}")
    }

    spark.stop()
  }
}
