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
}
