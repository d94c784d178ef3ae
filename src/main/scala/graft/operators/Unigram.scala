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

  /** The bounded word universe shared by [[viterbiTable]] and
    * [[emTable]]: top `topWords` by (freq desc, codepoint-ascending
    * word — the words_0 `iv` gate's tie-break) with ≤ `maxSyms`
    * symbols. */
  def selectWords(freqDf: DataFrame, maxSyms: Int,
                  topWords: Int): Array[(String, Long)] =
    selectWordsFrom(freqDf.select("word", "freq").collect()
      .map(r => (r.getString(0), r.getLong(1))), maxSyms, topWords)

  /** The driver half of [[selectWords]], over an already-collected
    * (word, freq) dict — callers with a memoized dict pull skip the
    * per-call collect. */
  def selectWordsFrom(all: Array[(String, Long)], maxSyms: Int,
                      topWords: Int): Array[(String, Long)] =
    all
      .filter { case (w, _) => Bpe.toSyms(w).length <= maxSyms }
      .sortWith { case ((wa, fa), (wb, fb)) =>
        fa > fb || (fa == fb && Bpe.cpLess(wa, wb))
      }
      .take(topWords)

  /** The per-word segmentation table over the dictionary's top
    * `topWords` words (freq desc, codepoint-ascending word — the
    * words_0 `iv` gate's tie-break) with ≤ `maxSyms` symbols:
    * (word, n_pieces, cost64, seg). */
  def viterbiTable(freqDf: DataFrame, census: DataFrame,
                   maxSyms: Int, topWords: Int,
                   maxPieceSyms: Int): DataFrame = {
    val (cm, cv) = censusCosts(census)
    viterbiTableFrom(freqDf.sparkSession,
      selectWords(freqDf, maxSyms, topWords), cm, cv, maxPieceSyms)
  }

  /** [[viterbiTable]] from already-collected model pieces (r19: the
    * census costs and word dict are fitted-model artifacts callers
    * memoize per (session, corpus stamp) — the knModelMemo
    * discipline; each call re-collected both). */
  def viterbiTableFrom(spark: org.apache.spark.sql.SparkSession,
                       words: Array[(String, Long)], cm: Map[String, Long],
                       cv: Long, maxPieceSyms: Int): DataFrame = {
    import spark.implicits._
    words.toSeq.map { case (w, _) =>
      val (c, pieces) = viterbi(Bpe.toSyms(w), cm.get, cv, maxPieceSyms)
      (w, pieces.length, c, pieces.mkString("-"))
    }.toDF("word", "n_pieces", "cost64", "seg")
  }

  /** HARD-EM unigram-LM training (SentencePiece's fit, Kudo 2018 §3.2,
    * re-expressed with exact integer scores so every round is
    * engine-replayable): alternate
    *
    *   E: Viterbi-segment each dict word under the current costs
    *      (the hard assignment — forward-backward's expected counts
    *      would need real-valued logs, which are not replayable;
    *      hard EM keeps every quantity an integer),
    *   M: re-estimate each piece's count as its freq-weighted
    *      occurrence total over those segmentations and rebuild the
    *      costs cost(p) = s64(C+V) − s64(cnt(p)+1).
    *
    * Pieces that no Viterbi path uses drop out of the vocabulary
    * naturally (the pruning step — only census members are feasible
    * multi-symbol pieces; single symbols always remain feasible at
    * count 0, so no word ever becomes unsegmentable). The fit is
    * deterministic: the DP tie-break is total, so both engines and
    * the CTE replay produce identical censuses every round.
    *
    * Scale shape: the whole loop runs over the BOUNDED word dict
    * (`words`, ≤ topWords rows carrying corpus-census freqs) — the
    * BPE-trainer argument; corpus text is never re-read. Applying
    * the fitted model corpus-side is the same broadcast word→pieces
    * hash probe as `Bpe.wordTokenCounts`.
    *
    * Returns (final census, final C+V, per-pass weighted total cost —
    * `rounds + 1` entries: pass r's Viterbi total under the census of
    * round r, the last being the fitted model's; BpeSpec pins
    * non-increase on a toy corpus). */
  def emFit(words: Array[(String, Long)], census0: Map[String, Long],
            cv0: Long, rounds: Int, maxPieceSyms: Int)
      : (Map[String, Long], Long, Vector[Long]) = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    var cm = census0
    var cv = cv0
    val totals = Vector.newBuilder[Long]
    var r = 0
    while (r <= rounds) {
      val segs = words.map { case (w, f) =>
        val (c, pieces) = viterbi(Bpe.toSyms(w), cm.get, cv, maxPieceSyms)
        (f, c, pieces)
      }
      totals += segs.iterator
        .map { case (f, c, _) => math.multiplyExact(f, c) }
        .foldLeft(0L)(math.addExact)
      if (r < rounds) {
        val cnt = scala.collection.mutable.HashMap.empty[String, Long]
        segs.foreach { case (f, _, ps) =>
          ps.foreach(p => cnt.update(p, cnt.getOrElse(p, 0L) + f))
        }
        cm = cnt.toMap
        cv = cm.valuesIterator.foldLeft(0L)(math.addExact) + cm.size
        require(cv >= 1 && cv < (1L << 57),
          s"emFit: C+V = $cv outside surprisal64's shift domain")
      }
      r += 1
    }
    (cm, cv, totals.result())
  }

  /** [[viterbiTable]] under an EM-FITTED census (t72): `rounds` hard-EM
    * passes from the seed census, then the final segmentation table
    * (word, n_pieces, cost64, seg) under the fitted model. */
  def emTable(freqDf: DataFrame, census: DataFrame, rounds: Int,
              maxSyms: Int, topWords: Int,
              maxPieceSyms: Int): DataFrame = {
    val (cm0, cv0) = censusCosts(census)
    emTableFrom(freqDf.sparkSession,
      selectWords(freqDf, maxSyms, topWords), cm0, cv0, rounds, maxPieceSyms)
  }

  /** [[emTable]] from already-collected model pieces (see
    * [[viterbiTableFrom]]). */
  def emTableFrom(spark: org.apache.spark.sql.SparkSession,
                  words: Array[(String, Long)], cm0: Map[String, Long],
                  cv0: Long, rounds: Int, maxPieceSyms: Int): DataFrame = {
    import spark.implicits._
    val (cm, cv, _) = emFit(words, cm0, cv0, rounds, maxPieceSyms)
    words.toSeq.map { case (w, _) =>
      val (c, pieces) = viterbi(Bpe.toSyms(w), cm.get, cv, maxPieceSyms)
      (w, pieces.length, c, pieces.mkString("-"))
    }.toDF("word", "n_pieces", "cost64", "seg")
  }
}
