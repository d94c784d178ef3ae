package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Benchmark decontamination for training corpora: flag corpus
  * documents that share any word n-gram with a (small) benchmark /
  * eval set — the standard 13-gram-overlap test, parameterized on n
  * because the right width tracks the corpus vocabulary.
  *
  * 100 TB shape: the benchmark side is tiny (eval suites are MBs), so
  * its distinct n-gram set is BROADCAST and the corpus side is a
  * narrow explode + hash probe over the scan — no corpus shuffle until
  * the final per-doc aggregate, whose input is only the matching
  * (doc, gram) pairs. Nothing in the pipeline materializes the corpus
  * n-gram set.
  */
object Decontam {

  /** Word n-grams of the whitespace tokenization, space-rejoined.
    * Empty array when the doc has fewer than n tokens (Spark's
    * `sequence(1, 0)` counts DOWN, so the short-doc case must be
    * guarded, not clamped). */
  def ngrams(c: Column, n: Int): Column = {
    val toks = split(c, " ")
    val last = size(toks) - lit(n - 1)
    when(last >= 1,
      transform(sequence(lit(1), last), i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document contamination report: (doc_id, n_hits) for every
    * corpus doc sharing ≥1 n-gram with the benchmark set, n_hits =
    * number of DISTINCT shared n-grams. Clean docs are absent.
    *
    * Grams travel as 8-byte hashes (`functions.NgramHashes`, one
    * codegen pass per doc), never as strings: the corpus side is a
    * scan + explode + broadcast-hash probe on longs, and only MATCHING
    * (id, hash) pairs reach a shuffle. Hash collisions are
    * deterministic and engine-identical (the oracle replays the same
    * arithmetic), so counts stay exact cross-engine. */
  def report(corpus: DataFrame, idCol: String, textCol: String,
             bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    import graft.functions.NgramHashExpr.ngramHashes
    val benchGrams = bench
      .select(explode(ngramHashes(col(benchTextCol), n)).as("g")).distinct()
    corpus
      .select(col(idCol), explode(ngramHashes(col(textCol), n)).as("g"))
      // probe FIRST (narrow, broadcast), dedupe AFTER — the distinct
      // then shuffles only the matching pairs, not the corpus gram set
      .join(broadcast(benchGrams), "g")
      .distinct()
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The corpus with contaminated docs dropped. */
  def clean(corpus: DataFrame, idCol: String, textCol: String,
            bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    val bad = report(corpus, idCol, textCol, bench, benchTextCol, n)
      .select(col(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}
