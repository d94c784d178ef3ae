package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** OPTIMAL (Viterbi) unigram subword segmentation — SentencePiece's
  * encode step (Kudo 2018, arXiv:1804.10959) re-expressed with exact
  * integer scores so it is engine-replayable: the vocabulary and its
  * unigram statistics come from the trained BPE census (t29), and each
  * piece costs its smoothed surprisal in 1/64-bit units,
  *
  *   cost(piece) = s64(C + V) − s64(cnt + 1)
  *
  * (s64 = `NgramLm.surprisal64Long`, the one scalar home of the
  * formula; C = census mass, V = census vocabulary, cnt = the piece's
  * census count, 0 for unseen single symbols). A word's segmentation is
  * the dynamic program over its symbol positions minimizing
  * (Σcost, n_pieces, earliest-split) — the last component makes the
  * optimum total (dp states are unique per split point), so both
  * engines and any replay pick the same segmentation, not just the
  * same cost. Greedy BPE encoding is a FEASIBLE segmentation of the
  * same vocabulary, so viterbi cost ≤ greedy cost everywhere — the
  * optimality margin is what this operator buys (spec-pinned).
  *
  * Scale shape: the DP runs once per DISTINCT word of the bounded
  * top-V dictionary (the BPE-trainer argument — corpus text is never
  * re-read), against a census map that is itself dictionary-bounded.
  * Corpus-side application would be the same broadcast hash probe as
  * `Bpe.wordTokenCounts`.
  */
object Unigram {

  /** Census → (cost lookup, smoothing total C+V). Bounded by the
    * dictionary by construction (census tokens are encode outputs of
    * the top-V dict). */
  def censusCosts(census: DataFrame): (Map[String, Long], Long) = {
    val rows = census.select("token", "freq").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val cv = rows.map(_._2).sum + rows.length
    require(cv >= 1 && cv < (1L << 57),
      s"censusCosts: C+V = $cv outside surprisal64's shift domain")
    (rows.toMap, cv)
  }

  /** DP over the word's symbols. `cnt` = census count lookup; pieces
    * longer than one symbol must be IN the census, single symbols are
    * always feasible (unseen → count 0). Returns (cost64, pieces).
    * Tie-break: (cost, n_pieces, smallest split q) — q ascends in the
    * loop and only strict (cost, np) improvements replace, so the
    * earliest split wins ties, exactly ROW_NUMBER ORDER BY cost, np, q. */
  def viterbi(syms: Array[String], cnt: String => Option[Long], cv: Long,
              maxPieceSyms: Int): (Long, Vector[String]) = {
    val s64tot = NgramLm.surprisal64Long(cv)
    def cost(c: Long): Long = s64tot - NgramLm.surprisal64Long(c + 1)
    val n = syms.length
    // dp(i): best (cost, np, pieces) for the length-i prefix
    val dp = new Array[(Long, Int, Vector[String])](n + 1)
    dp(0) = (0L, 0, Vector.empty)
    var p = 1
    while (p <= n) {
      var best: (Long, Int, Vector[String]) = null
      var q = math.max(0, p - maxPieceSyms)
      while (q < p) {
        if (dp(q) != null) {
          val piece = syms.slice(q, p).mkString
          val c: Option[Long] =
            if (p - q == 1) Some(cnt(piece).getOrElse(0L))
            else cnt(piece)
          c.foreach { pcCnt =>
            val cc = dp(q)._1 + cost(pcCnt)
            val np = dp(q)._2 + 1
            if (best == null || cc < best._1 ||
                (cc == best._1 && np < best._2))
              best = (cc, np, dp(q)._3 :+ piece)
          }
        }
        q += 1
      }
      dp(p) = best
      p += 1
    }
    (dp(n)._1, dp(n)._3)
  }

  /** The per-word segmentation table over the dictionary's top
    * `topWords` words (freq desc, codepoint-ascending word — the
    * words_0 `iv` gate's tie-break) with ≤ `maxSyms` symbols:
    * (word, n_pieces, cost64, seg). */
  def viterbiTable(freqDf: DataFrame, census: DataFrame,
                   maxSyms: Int, topWords: Int,
                   maxPieceSyms: Int): DataFrame = {
    val spark = freqDf.sparkSession
    import spark.implicits._
    val (cm, cv) = censusCosts(census)
    val words = freqDf.select("word", "freq").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filter { case (w, _) => Bpe.toSyms(w).length <= maxSyms }
      .sortWith { case ((wa, fa), (wb, fb)) =>
        fa > fb || (fa == fb && Bpe.cpLess(wa, wb))
      }
      .take(topWords)
    words.toSeq.map { case (w, _) =>
      val (c, pieces) = viterbi(Bpe.toSyms(w), cm.get, cv, maxPieceSyms)
      (w, pieces.length, c, pieces.mkString("-"))
    }.toDF("word", "n_pieces", "cost64", "seg")
  }
}
