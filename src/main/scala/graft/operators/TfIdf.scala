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
  * replan, and the corpus-wide (doc, token) shuffle runs TWICE),
  * broadcast back (vocabulary-sized); (3) per-doc top-k via a
  * doc-partitioned rank window whose input carries only
  * (token, tf, df) — no text, and Spark's WindowGroupLimit prunes to
  * ~k rows per doc before the window shuffle. Nothing driver-side;
  * the only broadcast is the vocabulary table.
  */
object TfIdf {

  /** Per-document top-k keywords: (doc_id, rnk, tok, tf, df, score),
    * rnk = 1..k by score DESC with token ASC tie-break. */
  def topKeywords(corpus: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.expressions.Window
    val nDocs = corpus.count()
    val tf = corpus
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), $"tok").agg(count(lit(1)).as("tf"))
    val df = corpus
      .select(explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy($"score".desc, $"tok".asc)
    tf.join(broadcast(df), "tok")
      .withColumn("score", ($"tf" * lit(nDocs)).cast("double") / $"df")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select(col(idCol), $"rnk", $"tok", $"tf", $"df", $"score")
  }
}
