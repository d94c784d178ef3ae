package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape pins for the TPC-H star joins: the dims must broadcast and
  * the fact must shuffle exactly once (for the aggregation) — the plan
  * that survives a 100× scale-up. A regression to SortMergeJoin or an
  * extra fact shuffle fails here before it shows up in BENCH. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(FormattedMode)

  // FormattedMode prints each Exchange's partitioning on its own
  // "Arguments:" line — count those, not the node names
  private def count(s: String, token: String): Int =
    s.linesIterator.count(_.trim.startsWith(token))

  test("q43 (TPC-H Q3 shape): dims broadcast, one fact shuffle, top-k folds") {
    val p = plan("q43_tpch3")
    assert(!p.contains("SortMergeJoin"), "star dims must broadcast")
    assert(p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 2, "customer+orders side broadcast")
    assert(count(p, "Arguments: hashpartitioning") == 1,
      s"exactly one shuffle (the aggregation), got plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "ORDER BY + LIMIT must fold to TakeOrderedAndProject (no global sort)")
  }

  test("t09 (decontamination): benchmark grams broadcast, corpus side " +
      "probes before any shuffle") {
    val p = plan("t09_decontam")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the benchmark gram set must broadcast")
    assert(p.contains("BroadcastHashJoin"))
    // exactly three hash exchanges: the (tiny) benchmark-side distinct,
    // the post-probe distinct, and the per-doc aggregate — the raw
    // corpus gram explode must never hit one
    assert(count(p, "Arguments: hashpartitioning") <= 3,
      s"corpus gram set leaked into a shuffle:\n$p")
  }

  test("t13 (TF-IDF): vocabulary broadcasts, the corpus (doc, token) " +
      "shuffle runs exactly once") {
    val p = plan("t13_tfidf")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the df vocabulary table must broadcast")
    assert(p.contains("BroadcastHashJoin"))
    // tf (doc, tok), df (tok), and the doc-partitioned rank window —
    // a 4th hash exchange means the df side re-ran the corpus shuffle
    // (the round-8 exchange-reuse regression this pin guards)
    assert(count(p, "Arguments: hashpartitioning") == 3,
      s"unexpected shuffle count:\n$p")
    assert(p.contains("WindowGroupLimit"),
      "rank-limit pushdown must prune before the window shuffle")
  }

  test("t14 (n-gram census): one gram-hash shuffle family, top-k folds") {
    val p = plan("t14_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must fold to TakeOrderedAndProject (no global sort)")
    // distinct-doc counting expands to two agg levels over one gram key
    assert(count(p, "Arguments: hashpartitioning") <= 2,
      s"gram census grew an extra shuffle:\n$p")
  }

  test("t45 (prototype scoring) is a pure narrow map: centroid is a " +
      "literal, no exchange, no join") {
    val emb = Tables.load(spark, sf, "embeddings")
    val cent = operators.Similarity.exactMean(
      emb.filter(org.apache.spark.sql.functions.col("label") === 0),
      "embedding")
    val p = operators.Similarity.prototypeScore(
      emb, "vec_id", "embedding", cent, 0.2)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"prototype scoring must be a narrow map:\n$p")
  }

  test("t51 (bloom decontam probe) is a pure narrow scan: no exchange, " +
      "no join, no generate — the bit array rides inside the expression") {
    val docs = Tables.load(spark, sf, "documents")
    val bits = operators.Decontam.bloomBits(
      docs.limit(5), "text", 3, 3, 1 << 12)
    val p = operators.Decontam.bloomReport(
      docs, "doc_id", "text", 3, 3, 1 << 12, bits)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange") && !p.contains("Join") &&
      !p.contains("Generate"),
      s"bloom probe must be one narrow scan:\n$p")
  }

  test("q64 (hll census): the register agg partials map-side — exactly " +
      "two hash shuffles (registers, then slices), no join") {
    val p = plan("q64_hll")
    assert(count(p, "Arguments: hashpartitioning") <= 2,
      s"hll census grew an extra shuffle:\n$p")
    assert(!p.contains("Join"), s"hll census must not join:\n$p")
  }

  test("q65 (quantile census): rows never shuffle — the census agg " +
      "partials map-side, then one slice window; <= 2 hash shuffles, " +
      "no join") {
    val p = plan("q65_quantile_census")
    assert(count(p, "Arguments: hashpartitioning") <= 2,
      s"quantile census grew an extra shuffle:\n$p")
    assert(!p.contains("Join"), s"quantile census must not join:\n$p")
  }

  test("t66 (trained langid): gated predict routes through the folded " +
      "kernel — one narrow codegen scan, no explode/join/window/" +
      "exchange (the stage plan stays as the above-gate fallback, " +
      "spec-pinned bit-equal in LangNbSpec)") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, sf, "documents")
    val m = operators.LangNb.fit(
      docs.filter(col("doc_id") % 5 =!= 4L), "text", "lang")
    assert(m.foldKernel.isDefined, "capped model must fold")
    val p = operators.LangNb.predict(docs, "doc_id", "text", m)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Generate") && !p.contains("Join") &&
      !p.contains("Window") && !p.contains("Exchange"),
      s"gated predict must be a narrow kernel scan:\n$p")
  }

  test("s05 (quantization) pass 2 is a pure narrow map: no exchange " +
      "between the scan and the quantized output") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (mins, maxs) = operators.Quantize.dimensionRanges(emb, "embedding")
    val p = operators.Quantize.quantize(emb, "embedding", mins, maxs)
      .queryExecution.explainString(FormattedMode)
    assert(count(p, "Arguments: hashpartitioning") == 0 &&
      !p.contains("Exchange"), s"quantize pass must not shuffle:\n$p")
  }

  test("t16 (dup spans): frequent-gram set broadcasts; census + coverage " +
      "are the only hash shuffles") {
    val p = plan("t16_dup_spans")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the frequent-gram set must broadcast")
    assert(p.contains("BroadcastHashJoin"))
    // 2 for the distinct-doc census (g,id → g), 2 for the per-doc
    // distinct-position count (id,p → id); a 5th means the raw gram
    // explode leaked into a shuffle
    assert(count(p, "Arguments: hashpartitioning") <= 4,
      s"gram rows leaked into an extra shuffle:\n$p")
  }

  test("t24 (dup-span removal): frequent-gram set broadcasts; census + " +
      "per-doc start-position fold are the only hash shuffles") {
    val p = plan("t24_span_removal")
    // the freq membership probe must be a broadcast join (heavy-hitter
    // set is bounded by total-grams / minDocs)
    assert(p.contains("BroadcastHashJoin Inner"),
      s"the frequent-gram set must broadcast:\n$p")
    // 2 for the distinct-doc census (g,id → g), 1 for the per-doc
    // collect_set of flagged starts; a 4th hash exchange means the raw
    // gram explode leaked into a shuffle
    assert(count(p, "Arguments: hashpartitioning") <= 3,
      s"gram rows leaked into an extra shuffle:\n$p")
  }

  test("t26 (quality classifier): scoring is a pure narrow map — no " +
      "hash exchange anywhere") {
    val p = plan("t26_quality_model")
    assert(count(p, "Arguments: hashpartitioning") == 0,
      s"model scoring must not shuffle:\n$p")
  }

  test("t17 (source caps): rank-limit prunes map-side, one hash shuffle") {
    val p = plan("t17_source_caps")
    assert(p.contains("WindowGroupLimit"),
      "rank filter must push a partial group-limit below the shuffle")
    assert(count(p, "Arguments: hashpartitioning") == 1,
      s"per-source cap needs exactly the source shuffle:\n$p")
  }

  test("s06 (knn join): query side broadcasts, rank-limit caps the qid " +
      "shuffle") {
    val p = plan("s06_knn_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the query set must broadcast (no base-side shuffle join)")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
    assert(p.contains("WindowGroupLimit"),
      "per-query top-k must prune before the qid shuffle")
    assert(count(p, "Arguments: hashpartitioning") == 1,
      s"scoring must not shuffle the base side:\n$p")
  }

  test("events ts-range filter pushes a µs predicate to the parquet scan " +
      "(NanosFilterInference under MicrosAsNanos)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Tables.load(spark, sf, "events")
    val Array(lo, hi) = e.agg(min($"ts"), max($"ts")).collect()
      .map(r => Array(r.getLong(0), r.getLong(1))).head
    val mid = lo + (hi - lo) / 2
    val q = e.filter($"ts" >= mid && $"ts" < hi).select($"event_id", $"ts")
    val p = q.queryExecution.explainString(FormattedMode)
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThanOrEqual(ts") || p.contains("GreaterThan(ts")),
      s"ts-range must reach the scan as a pushed parquet filter:\n$p")
    // the inference is an implication, never a substitute: the exact
    // ns-domain filter still gates, so the count matches a driver check
    val expected = e.select($"ts").collect()
      .count(r => r.getLong(0) >= mid && r.getLong(0) < hi)
    assert(q.count() == expected)
  }

  test("q57 (events time-range): the inferred µs conjunct reaches the " +
      "parquet scan as a pushed filter") {
    val p = plan("q57_events_range")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"),
      s"q57's range must row-group-prune:\n${p.take(1200)}")
  }

  test("q44 (TPC-H Q5 shape): all four dims broadcast, one fact shuffle") {
    val p = plan("q44_tpch5")
    assert(!p.contains("SortMergeJoin"), "star dims must broadcast")
    assert(p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 4,
      "region/nation/supplier/customer must all broadcast")
    assert(count(p, "Arguments: hashpartitioning") == 1,
      s"exactly one shuffle (the aggregation), got plan:\n$p")
    assert(count(p, "Arguments: rangepartitioning") <= 1,
      "at most the final ORDER BY range exchange")
  }

  test("q58 (cube): ONE Expand + one aggregation shuffle covers all four " +
      "grouping-set levels") {
    val p = plan("q58_cube")
    assert(p.sliding("Expand".length).count(_ == "Expand") >= 1 &&
      p.linesIterator.count(_.trim.matches("""\(\d+\) Expand.*""")) == 1,
      s"cube must plan exactly one Expand:\n$p")
    assert(count(p, "Arguments: hashpartitioning") == 1,
      s"all cube levels must ride one aggregation shuffle:\n$p")
  }

  test("q84 (drawdown): ONE user_id hash exchange — the grouped " +
      "aggregation reuses the cummax window's partitioning (the q77 " +
      "plan rule)") {
    val p = plan("q84_drawdown")
    assert(count(p, "Arguments: hashpartitioning") == 1,
      s"the drawdown agg must reuse the window exchange:\n$p")
  }

  test("q88 (Bollinger): ONE user_id hash exchange — the breach census " +
      "reuses the rolling-moment window's partitioning (the q84 rule)") {
    val p = plan("q88_bollinger")
    assert(count(p, "Arguments: hashpartitioning") == 1,
      s"the breach census must reuse the window exchange:\n$p")
  }

  test("q86 (gap quantiles): exactly three hash exchanges — the user " +
      "lead-window over rows, then census CELLS only through the " +
      "(type, gap) aggregate and the per-type quantile window") {
    val p = plan("q86_gap_quantiles")
    assert(count(p, "Arguments: hashpartitioning") == 3,
      s"user window + census agg + slice window, nothing more:\n$p")
  }

  test("q59 (rolling windows): one user_id partition shuffle feeds every " +
      "frame; no extra exchange between the window functions") {
    val p = plan("q59_moving")
    assert(count(p, "Arguments: hashpartitioning") == 1,
      s"msum/mavg/mmax/lag must share the user_id exchange:\n$p")
  }

  test("s07 (PQ encode+ADC): a narrow map — no hash exchange anywhere") {
    val p = plan("s07_pq_adc")
    assert(count(p, "Arguments: hashpartitioning") == 0,
      s"PQ encode/score must not shuffle:\n$p")
  }

  test("s08 (IVFADC search): zero exchanges — probed filter + map-side " +
      "TakeOrdered") {
    val p = plan("s08_ivfpq")
    assert(!p.contains("Exchange"), s"IVFADC search must not shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("s09 (SQ8 search): no hash exchange — dequantized scan + " +
      "TakeOrdered") {
    val p = plan("s09_sq8_search")
    assert(count(p, "Arguments: hashpartitioning") == 0,
      s"SQ8 scoring must not shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("s10 (batched ADC knn join): query tables broadcast, rank-limit " +
      "caps the single qid shuffle") {
    val p = plan("s10_pq_knn")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the Q distance tables must broadcast")
    assert(p.contains("WindowGroupLimit"),
      "map tasks must forward only their local top-k per query")
    assert(count(p, "Arguments: hashpartitioning") == 1,
      s"one qid shuffle only:\n$p")
  }

  test("q60 (RANGE frame): the user_id exchange is the only hash shuffle") {
    val p = plan("q60_range_frame")
    assert(count(p, "Arguments: hashpartitioning") == 1,
      s"range frames must ride one partition shuffle:\n$p")
  }

  test("TfIdf vocabulary gate: a bounded vocab carries the broadcast " +
      "hint; an unbounded vocab leaves the join to the optimizer") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "a b d"), (2L, "a c e"))
      .toDF("doc_id", "text")
    // threshold -1 disables STATS-based broadcast, isolating the hint:
    // the gated (bounded) call must still broadcast, the unbounded call
    // must be free to shuffle-join (the crawl-scale OOM guard)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = operators.TfIdf
        .topKeywords(docs, "doc_id", "text", 3, maxVocab = 10)
        .queryExecution.explainString(FormattedMode)
      assert(gated.contains("BroadcastHashJoin"),
        s"bounded vocab must broadcast:\n$gated")
      val open = operators.TfIdf.topKeywords(docs, "doc_id", "text", 3)
        .queryExecution.explainString(FormattedMode)
      assert(!open.contains("BroadcastHashJoin"),
        s"unbounded vocab must not force a broadcast:\n$open")
      val overCap = operators.TfIdf.topKeywords(docs, "doc_id", "text", 3,
          maxVocab = operators.TfIdf.maxBroadcastVocab + 1)
        .queryExecution.explainString(FormattedMode)
      assert(!overCap.contains("BroadcastHashJoin"),
        s"an over-cap vocab bound must not force a broadcast:\n$overCap")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("Bpe token-count gate: a vocabulary measured under the cap " +
      "carries the broadcast hint; over the cap the join is left to " +
      "the optimizer (the crawl-scale OOM guard, as TfIdf)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "a b d"), (2L, "a c e"))
      .toDF("doc_id", "text")
    val wf = operators.Bpe.wordFreq(docs, "text")
    val merges = operators.Bpe.trainMergesFromFreq(wf, 3)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = operators.Bpe
        .docTokenCounts(docs, "doc_id", "text", wf, merges)
        .queryExecution.explainString(FormattedMode)
      assert(gated.contains("BroadcastHashJoin"),
        s"a bounded vocabulary must broadcast the lookup:\n$gated")
      val over = operators.Bpe
        .docTokenCounts(docs, "doc_id", "text", wf, merges,
          maxBroadcast = 0L)
        .queryExecution.explainString(FormattedMode)
      assert(!over.contains("BroadcastHashJoin"),
        s"an over-cap vocabulary must not force a broadcast:\n$over")
      // the gated result is the same rows either way (the gate changes
      // the JOIN STRATEGY, never the semantics — no word is dropped)
      val a = operators.Bpe
        .docTokenCounts(docs, "doc_id", "text", wf, merges)
        .orderBy(col("doc_id")).collect().toSeq
      val b = operators.Bpe
        .docTokenCounts(docs, "doc_id", "text", wf, merges,
          maxBroadcast = 0L)
        .orderBy(col("doc_id")).collect().toSeq
      assert(a == b, "gate must not change results")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("NgramLm model gate: a capped vocabulary broadcasts the vocab " +
      "and model lookups; over the cap every model join is left to the " +
      "optimizer (the crawl-scale OOM guard, as TfIdf/Bpe)") {
    import spark.implicits._
    val train = Seq("a b a b c", "b c d").toDF("text")
    val docs = Seq((0L, "a b c"), (1L, "x y z")).toDF("doc_id", "text")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gatedLm = operators.NgramLm.fit(train, "text", maxVocab = 10)
      val gated = operators.NgramLm
        .score(docs, "doc_id", "text", gatedLm, 24L, 5L)
        .queryExecution.explainString(FormattedMode)
      assert(gated.contains("BroadcastHashJoin"),
        s"a capped vocab must broadcast the model joins:\n$gated")
      val openLm = operators.NgramLm.fit(train, "text",
        maxVocab = operators.NgramLm.maxBroadcastVocab + 1)
      val open = operators.NgramLm
        .score(docs, "doc_id", "text", openLm, 24L, 5L)
        .queryExecution.explainString(FormattedMode)
      assert(!open.contains("BroadcastHashJoin"),
        s"an over-cap vocab must not force broadcasts:\n$open")
      // the gate changes join STRATEGY only — results are identical
      val a = operators.NgramLm
        .score(docs, "doc_id", "text", gatedLm, 24L, 5L)
        .orderBy($"doc_id").collect().toSeq
      val b = operators.NgramLm
        .score(docs, "doc_id", "text", openLm, 24L, 5L)
        .orderBy($"doc_id").collect().toSeq
      assert(a == b, "gate must not change results")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("t33 (LM quality): the scoring side is broadcast-join narrow — " +
      "the only exchanges are the model-fit aggregates and the final " +
      "per-doc aggregate, never a corpus-side join shuffle") {
    val p = plan("t33_lm_quality")
    // 4 scoring-side broadcasts: vocab×2 (w1/w2 map), bigrams, prefix
    assert(p.split("BroadcastHashJoin").length - 1 >= 4,
      s"the model lookups must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no sort-merge join anywhere in the t33 plan:\n$p")
  }

  test("t34 (DSIR): bucket tables broadcast, the global top-k folds to " +
      "TakeOrderedAndProject — no sort-merge join, no global sort") {
    val p = plan("t34_dsir_select")
    assert(p.split("BroadcastHashJoin").length - 1 >= 2,
      s"the two bucket-count lookups must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must fold to TakeOrderedAndProject:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no SMJ in the t34 plan:\n$p")
  }

  test("t39 (KN quality): scoring is broadcast-join narrow like t33 — " +
      "five model lookups broadcast (vocab x2, bigrams, prefix, " +
      "continuation), never a sort-merge join") {
    val p = plan("t39_kn_quality")
    assert(p.split("BroadcastHashJoin").length - 1 >= 5,
      s"all five model lookups must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no SMJ in t39:\n$p")
  }

  test("t36 (perplexity mix): the bucket+sample composition adds no " +
      "join beyond t33's broadcast lookups — no sort-merge join, and " +
      "the sampling gate is a pure filter (no extra exchange family " +
      "beyond the doc aggregate and the census)") {
    val p = plan("t36_ppl_mix")
    assert(!p.contains("SortMergeJoin"), s"no SMJ in t36:\n$p")
    assert(p.split("BroadcastHashJoin").length - 1 >= 4,
      s"the t33 model lookups must broadcast:\n$p")
  }

  test("t38 (corpus card): flags + fingerprint compute INLINE — no " +
      "join anywhere, only the (lang, source) aggregation shuffles") {
    val p = plan("t38_corpus_card")
    assert(!p.contains("Join"), s"the card must not self-join:\n$p")
    assert(p.contains("hashpartitioning(lang"),
      s"the only exchange family is the slice aggregation:\n$p")
  }

  test("t30 (shard shuffle): the rank window partitions BY SHARD (no " +
      "single-partition global row_number) and the scan prunes to the " +
      "id column") {
    val p = plan("t30_shard_shuffle")
    assert(p.contains("hashpartitioning(shard"),
      s"the window exchange must partition by shard:\n$p")
    assert(!p.contains("SinglePartition"),
      s"a global single-partition window would bottleneck at scale:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"only doc_id should be read:\n$p")
  }

  test("t31 (cluster balance): the cap filter plans a map-side " +
      "WindowGroupLimit before the cell shuffle; assignment is a " +
      "narrow map (no crossJoin, no extra exchange)") {
    val p = plan("t31_cluster_balance")
    assert(p.contains("WindowGroupLimit"),
      s"rk <= cap must prune map-side before the window shuffle:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"assignment must be the codegen nearest-centroid map:\n$p")
    assert(p.contains("hashpartitioning(cell"),
      s"the rank window partitions by cell:\n$p")
  }

  test("s18 (semantic decontam): the benchmark side broadcasts (nested " +
      "loop — there is no equi-key), arg-top-1 prunes map-side, one id " +
      "shuffle") {
    val p = plan("s18_sem_decontam")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the benchmark must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"))
    assert(p.contains("WindowGroupLimit"),
      s"rk = 1 must prune before the id shuffle:\n$p")
  }

  test("t74 (Gumbel DSIR): the resample is still a " +
      "TakeOrderedAndProject — no global sort, no rank window") {
    val p = plan("t74_dsir_gumbel")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k by key64 must fold:\n$p")
    assert(!p.contains("WindowGroupLimit") && !p.contains("Window "),
      s"no rank window expected:\n$p")
  }

  test("t73 (paragraph dedup): frequent-block set broadcasts back as an " +
      "anti probe — no corpus self-join, no sort-merge") {
    val p = plan("t73_paragraph_dedup")
    assert(p.contains("BroadcastHashJoin") &&
      p.contains("LeftAnti"), s"anti-probe must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-vs-corpus join:\n$p")
  }

  test("t90/t91/t93 (entropy, LZW, AC blocklist) are pure narrow scans: " +
      "no exchange before the presentation sort, no join, no generate") {
    Seq("t90_char_entropy", "t91_lzw_ratio", "t93_blocklist").foreach { q =>
      val p = plan(q)
      assert(count(p, "Arguments: hashpartitioning") == 0,
        s"$q must not shuffle before the orderBy:\n$p")
      assert(!p.contains("Join") && !p.contains("Generate"),
        s"$q must stay one codegen pass:\n$p")
    }
  }

  test("t98 (gate stack): all four gates in ONE narrow pass — no join, " +
      "no generate, no pre-sort exchange (the langid model rides in the " +
      "codegen kernel, not a broadcast join)") {
    val p = plan("t98_gate_stack")
    assert(!p.contains("Join") && !p.contains("Generate"),
      s"gate stack must stay one codegen pass:\n$p")
    assert(count(p, "Arguments: hashpartitioning") == 0,
      s"no shuffle before the orderBy:\n$p")
  }

  test("s23 (radius join): bounded query side broadcasts, NO window and " +
      "no qid shuffle — the tau gate is row-local") {
    val p = plan("s23_radius_join")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"query side must broadcast:\n$p")
    assert(!p.contains("Window"), s"radius join needs no rank window:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus shuffle join:\n$p")
  }

  test("t92 (textrank): adjacency is a row-local zip — the corpus is " +
      "never self-joined") {
    // the collected result is a LocalTableScan; pin the HEAVY side by
    // planning the census inputs directly
    val docs = Tables.load(spark, sf, "documents")
    val adjPlan = {
      import org.apache.spark.sql.functions._
      val ws = split(col("text"), " ", -1)
      val m = greatest(size(ws) - 1, lit(0))
      docs.select(explode(arrays_zip(
          slice(ws, lit(1), m).as("wa"), slice(ws, lit(2), m).as("wb"))))
        .queryExecution.explainString(FormattedMode)
    }
    assert(!adjPlan.contains("Join"), s"pairs must be row-local:\n$adjPlan")
  }

  test("t92 (textrank): the edge-census exchange carries packed " +
      "dictionary-id longs — no string column, no join anywhere") {
    val docs = Tables.load(spark, sf, "documents")
    val p = graft.operators.TextRank
      .edgeCensus(docs, "text", Array("the", "a", "of"))
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("hashpartitioning(pc"),
      s"census must aggregate through the packed-pair exchange:\n$p")
    assert(!p.contains("Join"),
      s"the fused dictionary walk needs no join at all:\n$p")
  }
}
