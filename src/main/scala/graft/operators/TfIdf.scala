package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** TF-IDF keyword extraction for training corpora: per-document top-k
  * terms by term-frequency × inverse-document-frequency. The standard
  * signal for boilerplate-vs-content weighting, topic tagging and
  * quality heuristics over a crawl (reference capability family:
  * text analysis over the documents table).
  *
  * Cross-engine determinism: the score is the exact rational
  * `tf · N / df` (IEEE double division of small integers — correctly
  * rounded and bit-identical in Spark and DuckDB) rather than the
  * log-damped `tf · ln(N/df)`: `ln` is a libm call with no cross-engine
  * rounding guarantee, and a last-ulp disagreement would flip the
  * hash-match. The rational form is monotone in the same (tf, 1/df)
  * ordering, so the extracted keywords are the same ranking.
  *
  * 100 TB shape: (1) tf = groupBy(doc, token) over the exploded scan —
  * map-side combine absorbs the per-doc repeats, ONE corpus-wide
  * shuffle; (2) df = groupBy(token) over per-ROW distinct tokens
  * (`array_distinct` is row-local, so this side shuffles only
  * (token, partial-count) pairs — deriving df from the tf result reads
  * nicer but Catalyst can't reuse the exchange across the pruned
  * replan, and the corpus-wide (doc, token) shuffle runs TWICE);
  * (3) the vocabulary joins back to tf — see the broadcast gate below;
  * (4) per-doc top-k via a doc-partitioned rank window whose input
  * carries only (token, tf, df) — no text, and Spark's WindowGroupLimit
  * prunes to ~k rows per doc before the window shuffle.
  *
  * THE VOCABULARY BROADCAST GATE: at web-crawl scale the distinct-token
  * vocabulary (URLs, typos, unicode junk) runs 10⁸–10⁹ entries, so a
  * forced `broadcast(df)` OOMs the driver. The vocabulary is therefore
  * broadcast ONLY when it is provably bounded: `maxVocab > 0` (a top-V
  * cap — standard TF-IDF vocabulary control, V most-frequent terms with
  * token tie-break) and `maxVocab <= maxBroadcastVocab`. Otherwise the
  * join carries no hint and Catalyst/AQE picks the strategy from its
  * (runtime, under AQE) size estimate — the shuffle-join fallback is one
  * bounded exchange on `tok`. `minDf` prunes hapax junk (df < minDf)
  * before the cap; both default off so the unpruned call is unchanged.
  */
object TfIdf {

  /** Vocabulary rows above which a top-V cap no longer justifies a
    * forced broadcast (4M entries ≈ a few hundred MB of (tok, df) —
    * past the sane executor broadcast budget). */
  val maxBroadcastVocab: Int = 4 << 20

  /** Per-document top-k keywords: (doc_id, rnk, tok, tf, df, score),
    * rnk = 1..k by score DESC with token ASC tie-break.
    *
    * @param minDf    keep only tokens appearing in ≥ minDf documents
    *                 (1 = no pruning)
    * @param maxVocab keep only the maxVocab most frequent tokens by
    *                 (df DESC, tok ASC); 0 = uncapped. A bounded vocab
    *                 (≤ maxBroadcastVocab) is what licenses the
    *                 broadcast — uncapped vocabularies shuffle-join. */
  def topKeywords(corpus: DataFrame, idCol: String, textCol: String,
                  k: Int, minDf: Long = 1L, maxVocab: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.expressions.Window
    val nDocs = corpus.count()
    val tf = corpus
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), $"tok").agg(count(lit(1)).as("tf"))
    val df = corpus
      .select(explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("df"))
    val dfMin = if (minDf > 1L) df.filter($"df" >= minDf) else df
    // top-V folds to TakeOrderedAndProject — no global sort
    val vocab = if (maxVocab > 0)
      dfMin.orderBy($"df".desc, $"tok".asc).limit(maxVocab)
    else dfMin
    val vocabSide =
      if (maxVocab > 0 && maxVocab <= maxBroadcastVocab) broadcast(vocab)
      else vocab
    val w = Window.partitionBy(col(idCol))
      .orderBy($"score".desc, $"tok".asc)
    tf.join(vocabSide, "tok")
      .withColumn("score", ($"tf" * lit(nDocs)).cast("double") / $"df")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select(col(idCol), $"rnk", $"tok", $"tf", $"df", $"score")
  }

  /** BM25 retrieval (Robertson/Okapi, k1 = 6/5, b = 3/4 — the standard
    * parameters as exact rationals) — the keyword-search leg of the
    * retrieval stack (vector legs: s01-s14). ENTIRELY INTEGER, so
    * ranking replays bit-for-bit cross-engine:
    *
    *   - idf64(t) = s64(2N+2) − s64(2·df+1): the 1/64-bit integer log2
    *     ([[NgramLm.surprisal64Long]], the one scalar home) of the
    *     standard BM25+ idf (N+1)/(df+½) — `ln` is libm-unreplayable
    *     (the t13 rule), the integer log2 is the engine's replacement
    *     everywhere;
    *   - per-term contribution = (idf64 · 1024 · 44·tf·totTok) div
    *     (20·tf·totTok + 6·totTok + 18·dl·N) — the k1/b saturation
    *     ratio cross-multiplied to integers (denominator scaled by
    *     20·totTok), floor-divided at 1024× resolution; integer
    *     contributions SUM deterministically in any aggregation order
    *     (doubles would make the per-doc sum order-dependent);
    *   - fail-fast when the product bound would breach i64 (the fitKn
    *     precedent — shard the corpus stats past ~10¹⁷).
    *
    * 100 TB shape: stats = one bounded action (N, ΣdlL, df per query
    * term); scoring touches only docs CONTAINING a query term (explode
    * + isin filter pushes into the scan), one (doc, term) shuffle with
    * map-side combine, top-k folds to TakeOrderedAndProject. Returns
    * (idCol, n_hit, score) for the top `k` docs by (score DESC, id). */
  def bm25Search(corpus: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k: Int,
                 stats: Option[(Long, Long, Long)] = None): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      s"bm25Search wants 1..64 query terms, got ${terms.size}")
    val spark = corpus.sparkSession
    import spark.implicits._
    val withDl = corpus.select(col(idCol).as("id"),
      split(col(textCol), " ").as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
    // ONE stats action (N, Σdl, max dl) + one bounded df action —
    // or the caller's memoized stats for an immutable corpus
    val (n, tot, dlMax) =
      stats.getOrElse(corpusStats(corpus, idCol, textCol))
    // idf stays LAZY: df per term aggregates in-plan (a ≤|terms|-row
    // table, broadcast) and idf64 is the COLUMN form of the same
    // surprisal formula (spec-pinned bit-equal to surprisal64Long), so
    // scoring is ONE job after the single stats action
    val hits = withDl.select(col("id"), col("dl"), explode(col("w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val idfMax = NgramLm.surprisal64Long(2 * n + 2).max(1L) // df=0 worst case
    val bound = BigInt(idfMax) * 1024 * 44 * dlMax.max(1L) * tot.max(1L)
    require(bound <= (BigInt(1) << 62),
      s"bm25 integer chain would overflow i64 (bound $bound) — shard " +
        "the corpus stats (score per shard against shard-local idf)")
    val idfDf = broadcast(
      hits.select(col("tok"), col("id")).distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .select(col("tok"),
          (lit(NgramLm.surprisal64Long(2 * n + 2)) -
            NgramLm.surprisal64(lit(2L) * col("df") + 1L)).as("idf64")))
    hits.groupBy(col("id"), col("tok"), col("dl")).agg(count(lit(1)).as("tf"))
      .join(idfDf, "tok")
      .withColumn("c", expr(
        s"(idf64 * 1024 * 44 * tf * ${tot}L) div " +
          s"(20 * tf * ${tot}L + 6 * ${tot}L + 18 * dl * ${n}L)"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("c")).as("score"))
      .select(col("id").as(idCol), col("n_hit"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** The bm25 corpus statistics (N docs, Σ token count, max doc
    * length) — ONE full tokenize-scan action. Factored out so callers
    * that serve repeated queries against an immutable corpus can
    * memoize it per (session, corpus stamp) — the wordFreqMemo
    * discipline (r19: t62 and s15 each re-paid this scan per call). */
  def corpusStats(corpus: DataFrame, idCol: String,
                  textCol: String): (Long, Long, Long) = {
    val withDl = corpus.select(col(idCol).as("id"),
      split(col(textCol), " ").as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
    val stats = withDl.agg(count(lit(1)), sum(col("dl")),
      coalesce(max(col("dl")), lit(0L))).collect().head
    (stats.getLong(0), stats.getLong(1), stats.getLong(2))
  }
}
