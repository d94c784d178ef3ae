package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Corpus-level n-gram frequency census: the standard boilerplate /
  * template detector for crawl corpora (a handful of n-grams carried by
  * millions of pages — cookie banners, nav bars — dominate the corpus
  * and should be down-weighted or stripped before training).
  *
  * 100 TB shape: grams travel as i64 hashes (`functions.NgramHashes`,
  * one codegen pass per document — the t09/t11 convention), so the
  * shuffle carries (hash, partial-count) pairs with map-side combine,
  * never gram strings; the per-gram distinct-document count is a
  * two-level partial aggregate (Spark's distinct-agg expansion); the
  * top-k folds to TakeOrderedAndProject — no global sort.
  */
object CorpusStats {

  /** Top-k most frequent word n-gram hashes: (g, total, ndocs),
    * ordered by total DESC with hash ASC tie-break. `total` = total
    * occurrences, `ndocs` = distinct documents containing the gram. */
  def topNgrams(corpus: DataFrame, idCol: String, textCol: String,
                n: Int, k: Int): DataFrame = {
    import graft.functions.NgramHashExpr.ngramHashes
    corpus
      .select(col(idCol), explode(ngramHashes(col(textCol), n)).as("g"))
      .groupBy($"g")
      .agg(count(lit(1)).as("total"), countDistinct(col(idCol)).as("ndocs"))
      .orderBy($"total".desc, $"g".asc)
      .limit(k)
  }
}
