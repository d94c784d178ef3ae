package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style hard quality rules (Rae et al. 2021 §A1.1) — the
  * rule-filter stage of a pretraining data pipeline, emitting per-rule
  * flags PLUS the keep decision so drop reasons stay auditable (at
  * 100 TB you audit WHY a shard shrank, not just that it did).
  *
  * Every gate is an INTEGER comparison — rational thresholds are
  * cross-multiplied (mean word length ∈ [lo, hi] becomes
  * `lo·wc ≤ sumLen ≤ hi·wc`) — so the flags are bit-identical across
  * engines; a drop decision must never depend on float rounding.
  * One narrow codegen'd pass, no shuffle: the filter stage is
  * map-side-only at any scale.
  */
object QualityRules {

  /** Per-doc rule flags over whitespace-tokenized text:
    *  - `r_wc`:   word count within [minWords, maxWords]
    *  - `r_mwl`:  mean word length within [minMeanLen, maxMeanLen]
    *  - `r_stop`: contains at least `minStopHits` of the stop words
    *              (Gopher's "2 of 8 stop words" heuristic)
    *  - `r_uniq`: distinct words ≥ half the word count (repetition gate)
    *  - `keep`:   every rule passed
    * Flags are 0/1 BIGINTs (hash-stable across engines). */
  def gopher(df: DataFrame, idCol: String, textCol: String,
             minWords: Long = 50, maxWords: Long = 100000,
             minMeanLen: Long = 3, maxMeanLen: Long = 10,
             stopWords: Seq[String] = Seq("the", "a", "of", "to", "and",
               "in", "that", "is"),
             minStopHits: Int = 2): DataFrame = {
    val Seq(rWc, rMwl, rStop, rUniq) = flags(col(textCol), minWords,
      maxWords, minMeanLen, maxMeanLen, stopWords, minStopHits)
    df.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("wc"),
      rWc.as("r_wc"), rMwl.as("r_mwl"), rStop.as("r_stop"),
      rUniq.as("r_uniq"),
      (rWc * rMwl * rStop * rUniq).as("keep"))
  }

  /** The four 0/1 rule flags as COLUMNS over a text column — for
    * composing the gate into another projection (one narrow pass, no
    * self-join back on the id; the t38 audit-card shape). */
  def flags(textCol: org.apache.spark.sql.Column,
            minWords: Long = 50, maxWords: Long = 100000,
            minMeanLen: Long = 3, maxMeanLen: Long = 10,
            stopWords: Seq[String] = Seq("the", "a", "of", "to", "and",
              "in", "that", "is"),
            minStopHits: Int = 2): Seq[org.apache.spark.sql.Column] = {
    val words = split(textCol, " ")
    val wc = size(words).cast("long")
    val sumLen = length(translate(textCol, " ", "")).cast("long")
    val uniq = size(array_distinct(words)).cast("long")
    val stopHits = stopWords.map(w =>
      when(array_contains(words, w), 1L).otherwise(0L)).reduce(_ + _)
    def flag(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
    Seq(flag(wc >= minWords && wc <= maxWords),
      flag(sumLen >= lit(minMeanLen) * wc && sumLen <= lit(maxMeanLen) * wc),
      flag(stopHits >= minStopHits),
      flag(uniq * 2L >= wc))
  }

  /** The combined keep gate as ONE column (product of [[flags]]). */
  def keepFlag(textCol: org.apache.spark.sql.Column,
               minWords: Long = 50, maxWords: Long = 100000,
               minMeanLen: Long = 3, maxMeanLen: Long = 10,
               stopWords: Seq[String] = Seq("the", "a", "of", "to", "and",
                 "in", "that", "is"),
               minStopHits: Int = 2): org.apache.spark.sql.Column =
    flags(textCol, minWords, maxWords, minMeanLen, maxMeanLen,
      stopWords, minStopHits).reduce(_ * _)
}
