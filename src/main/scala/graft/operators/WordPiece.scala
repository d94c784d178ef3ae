package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training (Schuster & Nakajima 2012; the BERT
  * tokenizer per Devlin et al. 2019 §4.1; HuggingFace `tokenizers`'
  * WordPieceTrainer): the BPE merge loop with a LIKELIHOOD objective —
  * the winning pair maximizes score(a,b) = cnt(ab) / (cnt(a)·cnt(b)),
  * the merge that most increases a unigram LM's corpus likelihood,
  * instead of raw pair frequency. Continuation symbols carry the `##`
  * prefix (seed "word" → [w, ##o, ##r, ##d]); a merged token keeps the
  * head's prefix and strips the tail's (`w`+`##o` → `wo`, `##o`+`##r`
  * → `##or`).
  *
  * REPLAYABILITY: the score is quantized to the exact integer
  * `score64 = floor(cnt·2^40 / (cnt_a·cnt_b))` and selection is
  * (score64 DESC, cnt DESC, lhs ASC, rhs ASC by code point) — a total
  * order in pure integers, so the whole training loop replays
  * bit-for-bit in DuckDB as HUGEINT arithmetic (the t28 40-stage
  * precedent with two extra censuses per stage). Scores of ties under
  * the 2^40 quantization resolve by the cnt/lexicographic chain
  * identically in both engines.
  *
  * SCALE: training is dict-bounded like BPE — ONE corpus word-freq
  * shuffle (shared `Bpe.wordFreq` memo), then a driver loop over the
  * top-`maxWords` dictionary with INCREMENTAL pair/symbol count
  * maintenance (only words containing the winning pair are rewritten,
  * the `trainMergesLocal` shape). The per-merge argmax is one pass
  * over the live pair map — unlike BPE, a lazy max-heap cannot carry
  * the argmax across merges because a merge changes the DENOMINATOR
  * (symbol counts) of every pair sharing a symbol with it, silently
  * raising scores of untouched pairs; the scan is exact and
  * O(|pairs|) per merge, fine for the query's 30 merges and the
  * documented cost at production vocabularies.
  */
object WordPiece {

  /** One trained merge: `token = lhs + rhs-stripped-of-##`, `score64`
    * = the quantized likelihood score the pair won with. */
  final case class Merge(rank: Int, lhs: String, rhs: String,
                         token: String, score64: Long)

  /** Split a word into WordPiece seed symbols: first code point bare,
    * continuations `##`-prefixed (mirrors `Bpe.toSyms`'s per-code-point
    * walk — the same DuckDB `string_split(word, '')` caveat applies). */
  private[graft] def toSymsWp(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val s = new String(Character.toChars(cp))
      out += (if (i == 0) s else "##" + s)
      i += Character.charCount(cp)
    }
    out.result()
  }

  private[graft] def mergedToken(lhs: String, rhs: String): String =
    lhs + (if (rhs.startsWith("##")) rhs.substring(2) else rhs)

  /** floor(cnt·2^40 / (a·b)) exactly: the Long fast path covers every
    * realistic count (cnt ≤ 2^23, symbol counts ≤ 2^31); anything
    * larger routes through BigInt — correct at any magnitude, never a
    * silent overflow (the KN runtime-operand-guard rule). */
  private[graft] def score64(cnt: Long, a: Long, b: Long): Long =
    if (cnt <= (Long.MaxValue >> 40) && a <= Int.MaxValue && b <= Int.MaxValue)
      (cnt << 40) / (a * b)
    else ((BigInt(cnt) << 40) / (BigInt(a) * BigInt(b))).toLong

  /** Train from a precomputed (word, freq) table (the shared
    * `Bpe.wordFreq` shuffle): top-`maxWords` dictionary (freq DESC,
    * word ASC — deterministic under the cap), then the driver merge
    * loop. Stops early when no adjacent pair remains. */
  def trainFromFreq(freqDf: DataFrame, numMerges: Int,
                    maxWords: Int = 1 << 20): Seq[Merge] =
    fitFromFreq(freqDf, numMerges, maxWords)._1

  /** Train AND return the fitted vocabulary (seed symbols of the
    * capped dictionary + merge tokens) — what the greedy encoder
    * serves from. `trainLocal` rebinds its own symbol-array slots but
    * never mutates the seed arrays in place, so the seeds read here
    * are the pre-merge ones. */
  def fitFromFreq(freqDf: DataFrame, numMerges: Int,
                  maxWords: Int = 1 << 20): (Seq[Merge], Set[String]) = {
    val wf = freqDf
      .orderBy(col("freq").desc, col("word").asc).limit(maxWords)
      .collect()
    val entries = wf.map(r => (toSymsWp(r.getString(0)), r.getLong(1)))
    val m = trainLocal(entries.map { case (s, f) => (s.clone(), f) },
      numMerges)
    (m, vocabOf(entries, m))
  }

  private[graft] def trainLocal(
      entries: Array[(Array[String], Long)], numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] = entries.map(_._1)
    val freq: Array[Long] = entries.map(_._2)
    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    val symCnt = mutable.HashMap.empty[String, Long]
    // pair → word indices that (at some point) gained the pair;
    // append-only, stale/duplicate-tolerant (the trainMergesLocal shape)
    val where = mutable.HashMap.empty[(String, String),
      mutable.ArrayBuffer[Int]]
    def incP(p: (String, String), f: Long, wi: Int): Unit = {
      pairCnt(p) = pairCnt.getOrElse(p, 0L) + f
      where.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += wi
    }
    def decP(p: (String, String), f: Long): Unit = {
      val c = pairCnt(p) - f
      if (c <= 0L) { pairCnt.remove(p); where.remove(p) }
      else pairCnt(p) = c
    }
    def incS(s: String, f: Long): Unit =
      symCnt(s) = symCnt.getOrElse(s, 0L) + f
    def decS(s: String, f: Long): Unit = {
      val c = symCnt(s) - f
      if (c <= 0L) symCnt.remove(s) else symCnt(s) = c
    }
    var w = 0
    while (w < syms.length) {
      val s = syms(w); val f = freq(w); var i = 0
      while (i < s.length) {
        incS(s(i), f)
        if (i < s.length - 1) incP((s(i), s(i + 1)), f, w)
        i += 1
      }
      w += 1
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    while (rank <= numMerges && pairCnt.nonEmpty) {
      // exact argmax scan: (score64 DESC, cnt DESC, lhs ASC, rhs ASC)
      var bs = 0L; var bc = 0L
      var bp: (String, String) = null
      pairCnt.foreach { case (p, c) =>
        val sc = score64(c, symCnt(p._1), symCnt(p._2))
        val better =
          bp == null || sc > bs || (sc == bs && (c > bc || (c == bc && {
            val l = Bpe.cpCompare(p._1, bp._1)
            l < 0 || (l == 0 && Bpe.cpCompare(p._2, bp._2) < 0)
          })))
        if (better) { bs = sc; bc = c; bp = p }
      }
      val (lhs, rhs) = bp
      val tok = mergedToken(lhs, rhs)
      merges += Merge(rank, lhs, rhs, tok, bs)
      val hits = where.getOrElse(bp, mutable.ArrayBuffer.empty)
      val seen = mutable.HashSet.empty[Int]
      for (wi <- hits if seen.add(wi)) {
        val old = syms(wi)
        val L = old.length
        // non-overlapping sites, left-to-right (doubles as the
        // stale-entry verification)
        val sites = mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < L - 1) {
          if (old(i) == lhs && old(i + 1) == rhs) { sites += i; i += 2 }
          else i += 1
        }
        if (sites.nonEmpty) {
          val f = freq(wi)
          val consumed = new Array[Boolean](L)
          sites.foreach { si => consumed(si) = true; consumed(si + 1) = true }
          var j = 0
          while (j < L - 1) {
            if (consumed(j) || consumed(j + 1)) decP((old(j), old(j + 1)), f)
            j += 1
          }
          // symbol deltas: each site consumes one lhs + one rhs and
          // produces one merged token
          sites.foreach { _ => decS(lhs, f); decS(rhs, f); incS(tok, f) }
          val nw = new Array[String](L - sites.size)
          val isNew = new Array[Boolean](nw.length)
          var k = 0; i = 0
          while (i < L) {
            if (consumed(i) && i < L - 1 && consumed(i + 1) &&
                old(i) == lhs && old(i + 1) == rhs) {
              nw(k) = tok; isNew(k) = true; k += 1; i += 2
            } else { nw(k) = old(i); k += 1; i += 1 }
          }
          syms(wi) = nw
          k = 0
          while (k < nw.length - 1) {
            if (isNew(k) || isNew(k + 1)) incP((nw(k), nw(k + 1)), f, wi)
            k += 1
          }
        }
      }
      // every occurrence was consumed by the left-to-right pass
      pairCnt.remove(bp); where.remove(bp)
      rank += 1
    }
    merges.result()
  }

  /** The full-rescan reference loop (recount symbols AND pairs from
    * scratch each merge) — the oracle for [[trainLocal]]'s bit-identity
    * spec; O(numMerges × Σ|syms|), not a production path. */
  private[graft] def trainRescan(
      entries0: Array[(Array[String], Long)], numMerges: Int): Seq[Merge] = {
    var entries = entries0
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val pairCnt = new java.util.HashMap[(String, String), Long]
      val symCnt = new java.util.HashMap[String, Long]
      entries.foreach { case (s, f) =>
        var i = 0
        while (i < s.length) {
          symCnt.merge(s(i), f, _ + _)
          if (i < s.length - 1) pairCnt.merge((s(i), s(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (pairCnt.isEmpty) exhausted = true
      else {
        var bs = 0L; var bc = 0L
        var bp: (String, String) = null
        pairCnt.forEach { (p, c) =>
          val sc = score64(c, symCnt.get(p._1), symCnt.get(p._2))
          val better =
            bp == null || sc > bs || (sc == bs && (c > bc || (c == bc && {
              val l = Bpe.cpCompare(p._1, bp._1)
              l < 0 || (l == 0 && Bpe.cpCompare(p._2, bp._2) < 0)
            })))
          if (better) { bs = sc; bc = c; bp = p }
        }
        val tok = mergedToken(bp._1, bp._2)
        merges += Merge(rank, bp._1, bp._2, tok, bs)
        // explicit site walk (NOT mergePass + rename: a pre-existing
        // symbol could textually equal lhs+rhs and must not rename)
        entries = entries.map { case (s, f) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == bp._1 && s(i + 1) == bp._2) {
              out += tok; i += 2
            } else { out += s(i); i += 1 }
          }
          (out.result(), f)
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Greedy longest-match-first encoding over a fitted vocabulary (the
    * BERT runtime tokenizer — NOT merge-order application; the two can
    * differ, which is why the oracle reads the merge TABLE, not
    * encodings). `vocab` = seed symbols + merge tokens. A word with an
    * unmatchable position encodes to `[unk]` wholesale (BERT rule).
    *
    * '#'-CONTAINING WORDS: a vocab string starting with `##` is
    * treated as a CONTINUATION piece ONLY — it never matches at word
    * start, even when the word itself begins with literal `##`
    * (markdown headings). The textual `##` prefix makes a merged head
    * piece spelled `##…` indistinguishable from a continuation piece
    * in the vocab SET, so position decides: head candidates must not
    * start with `##` (and the degenerate `##` piece is unreachable at
    * any position — continuation candidates are `##`+non-empty). This
    * is exactly the t86/t87 oracle's vp rule (cont = piece LIKE
    * '##%', matched only at pos > 1, piece <> '##' dropped) — without
    * it the engines diverge on `##`-initial words. */
  def encodeWord(word: String, vocab: Set[String],
                 unk: String = "[UNK]"): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      var j = word.length
      var found: String = null
      while (found == null && j > i) {
        val sub = word.substring(i, j)
        val cand = if (i == 0) sub else "##" + sub
        val headOk = i > 0 || !sub.startsWith("##")
        if (headOk && vocab.contains(cand)) found = cand
        else {
          j -= 1
          // never split a surrogate pair
          if (j > i && Character.isLowSurrogate(word.charAt(j)))
            j -= 1
        }
      }
      if (found == null) return Seq(unk)
      out += found
      i = j
    }
    out.result()
  }

  /** The fitted vocabulary: every seed symbol of the dictionary plus
    * every merge token. */
  def vocabOf(entries: Array[(Array[String], Long)],
              merges: Seq[Merge]): Set[String] =
    entries.iterator.flatMap(_._1).toSet ++ merges.iterator.map(_.token)

  /** Per-word greedy token counts: each DISTINCT word encodes once
    * through the bounded vocab closure on the executors (the t80
    * distributed-closure-map shape — no driver pull, no explode of the
    * token stream). */
  def wordTokenCounts(freqDf: DataFrame, vocab: Set[String]): DataFrame = {
    val spark = freqDf.sparkSession
    import spark.implicits._
    freqDf.select(col("word")).as[String]
      .map(w => (w, encodeWord(w, vocab).length.toLong))
      .toDF("word", "ntok")
  }

  /** Greedy-encoded corpus token census: (token, Σ freq) off the
    * shared word-freq shuffle — the corpus is never re-read and no
    * per-document token stream materializes. */
  def tokenCensusFromFreq(freqDf: DataFrame,
                          vocab: Set[String]): DataFrame = {
    val spark = freqDf.sparkSession
    import spark.implicits._
    freqDf.select(col("word"), col("freq")).as[(String, Long)]
      .flatMap { case (w, f) => encodeWord(w, vocab).map(t => (t, f)) }
      .toDF("token", "f")
      .groupBy(col("token")).agg(sum(col("f")).as("freq"))
  }

  /** Per-document greedy token counts (the `Bpe.docTokenCounts`
    * analog): word-level counts broadcast under the vocabulary gate,
    * documents pay one hash probe per word. */
  def docTokenCounts(corpus: DataFrame, idCol: String, textCol: String,
                     freqDf: DataFrame, vocab: Set[String],
                     maxBroadcast: Long = Bpe.maxBroadcastVocab,
                     knownVocab: Option[Long] = None): DataFrame = {
    val wt = wordTokenCounts(freqDf, vocab)
    val side =
      if (knownVocab.getOrElse(freqDf.count()) <= maxBroadcast)
        broadcast(wt)
      else wt
    corpus
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(side, "word")
      .groupBy(col(idCol)).agg(sum(col("ntok")).as("n_wptok"))
  }

  /** Persist the fitted model — merge table AND vocabulary (the greedy
    * encoder serves from the vocab; merges alone can't reconstruct the
    * seed symbols of the fitted dictionary). The fit-once/persist/
    * stream lifecycle every trained model in this repo carries. */
  def saveModel(spark: SparkSession, merges: Seq[Merge],
                vocab: Set[String], path: String): Unit = {
    import spark.implicits._
    merges.toDF("rank", "lhs", "rhs", "token", "score64").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/merges")
    vocab.toSeq.sorted.toDF("piece").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Load a persisted model; strings and longs round-trip parquet
    * exactly, so a loaded model encodes bit-identically. */
  def loadModel(spark: SparkSession,
                path: String): (Seq[Merge], Set[String]) = {
    val m = spark.read.parquet(s"$path/merges")
      .select("rank", "lhs", "rhs", "token", "score64")
      .orderBy(col("rank")).collect().toSeq
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val v = spark.read.parquet(s"$path/vocab")
      .collect().map(_.getString(0)).toSet
    (m, v)
  }
}
