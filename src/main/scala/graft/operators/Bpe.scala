package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016,
  * arXiv:1508.07909) — train merges from a corpus and encode text, the
  * standard vocabulary-construction step of an LLM training pipeline
  * (reference capability family: text analysis over the documents
  * table; this is the trained counterpart of `Text.tokens`' whitespace
  * counting).
  *
  * 100 TB shape: BPE never needs the raw corpus more than once. The
  * ONLY corpus-sized operation is the word-frequency aggregation (one
  * shuffle with map-side combine); training then runs on the bounded
  * frequency dictionary (top-`maxWords` by freq with a word tie-break —
  * the standard practice: HuggingFace's trainer also folds the corpus
  * to word counts first), and encoding touches each DISTINCT word once
  * (`tokenCensus` joins the encoded vocabulary back by word, so the
  * per-row cost at crawl scale is a hash probe, not a merge loop).
  *
  * Cross-engine determinism: pair selection is (count DESC, lhs ASC,
  * rhs ASC) — pure integer counts and binary string order, identical in
  * Spark and DuckDB. A merge pass rewrites occurrences LEFT-TO-RIGHT
  * (so "aaa" under (a,a) → [aa, a]); both the trainer and the oracle's
  * recursive-CTE replay walk the same way. Greedy encoding (repeatedly
  * merge the lowest-rank pair present) is equivalent to applying the
  * merges in rank order, one exhaustive pass each: applying merge k can
  * only create pairs that contain k's new token, and every pair
  * containing that token has rank > k — so no earlier merge ever
  * becomes applicable again. The oracle exploits the equivalence: its
  * stage-k word states ARE the encodings under merges 1..k.
  */
object Bpe {

  /** End-of-word marker appended to each word's symbol sequence (the
    * classic `</w>` of Sennrich et al.) — lets a decoder re-segment
    * words from a flat token stream. */
  val EndMark = "</w>"

  /** One learned merge: at `rank` (1-based), adjacent (lhs, rhs)
    * rewrite to the concatenation lhs+rhs. */
  final case class Merge(rank: Int, lhs: String, rhs: String)

  /** (word, freq) over the space-split corpus; empty tokens dropped.
    * The one corpus-sized pass — everything downstream is bounded by
    * the vocabulary. */
  def wordFreq(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))

  /** Code-point (binary UTF-8) string order — what Spark's UTF8String
    * comparisons and DuckDB's ORDER BY use. Java's `String` `<`
    * compares UTF-16 code units, which reorders supplementary-plane
    * symbols (an emoji's surrogates sort below U+E000..U+FFFF), so the
    * driver-side tie-break must compare code points to stay
    * cross-engine-identical. (Residual caveat, documented: DuckDB's
    * `string_split(word, '')` splits per grapheme cluster, so a
    * combining-mark sequence becomes ONE seed symbol there vs two code
    * points here — the test corpora and any NFC-normalized input are
    * unaffected.) */
  private[graft] def cpLess(a: String, b: String): Boolean =
    cpCompare(a, b) < 0

  /** Three-way code-point comparison (see [[cpLess]]). */
  private[graft] def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Split a word into per-code-point symbols plus the end marker. */
  private[graft] def toSyms(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndMark
    out.result()
  }

  /** One left-to-right merge pass: every non-overlapping (lhs, rhs)
    * adjacency becomes lhs+rhs. */
  private[graft] def mergePass(syms: Array[String], lhs: String,
                                   rhs: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == lhs && syms(i + 1) == rhs) {
        out += lhs + rhs; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train up to `numMerges` merges from the corpus word frequencies.
    * The driver materializes only the top-`maxWords` frequency
    * dictionary (freq DESC, word ASC — deterministic under the cap);
    * the merge loop is O(numMerges × total symbols), independent of
    * corpus size. Stops early when no adjacent pair remains. */
  def trainMerges(corpus: DataFrame, textCol: String, numMerges: Int,
                  maxWords: Int = 1 << 20): Seq[Merge] =
    trainMergesFromFreq(wordFreq(corpus, textCol), numMerges, maxWords)

  /** Train from a precomputed (word, freq) table — so one corpus scan
    * (cached or persisted) can feed both training and encoding. */
  def trainMergesFromFreq(freqDf: DataFrame, numMerges: Int,
                          maxWords: Int = 1 << 20): Seq[Merge] = {
    val wf = freqDf
      .orderBy($"freq".desc, $"word".asc).limit(maxWords)
      .collect()
    trainMergesLocal(
      wf.map(r => (toSyms(r.getString(0)), r.getLong(1))), numMerges)
  }

  /** Growable primitive int list — `where` index entries without the
    * boxing of ArrayBuffer[Int] (10⁷ memberships at the 2^20-word dict). */
  private final class IntBuf {
    private var a = new Array[Int](8)
    private var n = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def size: Int = n
    def apply(i: Int): Int = a(i)
  }

  /** Incremental pair-index trainer (the production-trainer shape, cf.
    * HuggingFace tokenizers' `word_to_pairs` update-at-merge-sites):
    * pair counts and a pair→words occurrence index are built ONCE, then
    * each merge rewrites only the words that actually contain the
    * winning pair, updating the counts by the exact before/after pair
    * delta of each rewritten word. Best-pair selection is a lazy-
    * invalidation max-heap on (count DESC, lhs ASC, rhs ASC by code
    * point) — stale heap entries are discarded when their count no
    * longer matches the live map, so the selected merge sequence is
    * BIT-IDENTICAL to the reference full-rescan loop
    * ([[trainMergesRescan]]; BpeSpec pins equality to full exhaustion).
    * Cost: O(Σ|syms| + numMerges × Σ|affected words| + heap churn)
    * instead of O(numMerges × Σ|syms|) — a 32k-merge production
    * vocabulary over the 2^20-word dict becomes minutes, not hours
    * (numMerges=1000 probe in README). */
  private[graft] def trainMergesLocal(
      entries: Array[(Array[String], Long)], numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] = entries.map(_._1)
    val freq: Array[Long] = entries.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    // pair → word indices that (at some point) gained the pair;
    // append-only with stale/duplicate tolerance — consumers re-verify
    // against the live word before rewriting
    val where = mutable.HashMap.empty[(String, String), IntBuf]
    // max-heap: highest count first, then code-point-smallest lhs, rhs
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String),
                  y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val l = cpCompare(y._2, x._2)
          if (l != 0) l else cpCompare(y._3, x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def inc(p: (String, String), f: Long, wi: Int): Unit = {
      val c = counts.getOrElse(p, 0L) + f
      counts(p) = c
      heap.enqueue((c, p._1, p._2))
      where.getOrElseUpdate(p, new IntBuf).add(wi)
    }
    def dec(p: (String, String), f: Long): Unit = {
      val c = counts(p) - f
      if (c <= 0L) { counts.remove(p); where.remove(p) }
      else { counts(p) = c; heap.enqueue((c, p._1, p._2)) }
    }
    var w = 0
    while (w < syms.length) {
      val s = syms(w); var i = 0
      while (i < s.length - 1) { inc((s(i), s(i + 1)), freq(w), w); i += 1 }
      w += 1
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // pop until a live entry (count matches the map) or the heap dries
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (c, l, r) = heap.dequeue()
        if (counts.get((l, r)).contains(c)) best = (l, r)
      }
      if (best == null) exhausted = true
      else {
        val (lhs, rhs) = best
        merges += Merge(rank, lhs, rhs)
        val hits = where.getOrElse(best, new IntBuf)
        val seen = mutable.HashSet.empty[Int]
        var h = 0
        while (h < hits.size) {
          val wi = hits(h)
          if (seen.add(wi)) {
            val old = syms(wi)
            val L = old.length
            // non-overlapping sites, left-to-right (= mergePass walk);
            // doubles as the stale-entry verification
            val sites = new IntBuf
            var i = 0
            while (i < L - 1) {
              if (old(i) == lhs && old(i + 1) == rhs) { sites.add(i); i += 2 }
              else i += 1
            }
            if (sites.size > 0) {
              val f = freq(wi)
              // SITE-LOCAL deltas: only adjacencies overlapping a merge
              // site change, so only those pay a map/heap op — O(sites)
              // index updates per word, not O(|word|) (the production-
              // trainer shape; the O(L) scans above are plain string
              // compares and stay)
              val consumed = new Array[Boolean](L)
              var si = 0
              while (si < sites.size) {
                consumed(sites(si)) = true
                consumed(sites(si) + 1) = true
                si += 1
              }
              var j = 0
              while (j < L - 1) {
                if (consumed(j) || consumed(j + 1))
                  dec((old(j), old(j + 1)), f)
                j += 1
              }
              // rebuild with a per-token merged flag for the inc side
              val nw = new Array[String](L - sites.size)
              val isNew = new Array[Boolean](nw.length)
              val merged = lhs + rhs
              var k = 0; i = 0
              while (i < L) {
                if (consumed(i) && i < L - 1 && consumed(i + 1) &&
                    old(i) == lhs && old(i + 1) == rhs) {
                  // consumed flags alone can chain across adjacent
                  // sites, so re-check the actual pair at i
                  nw(k) = merged; isNew(k) = true; k += 1; i += 2
                } else { nw(k) = old(i); k += 1; i += 1 }
              }
              syms(wi) = nw
              k = 0
              while (k < nw.length - 1) {
                if (isNew(k) || isNew(k + 1))
                  inc((nw(k), nw(k + 1)), f, wi)
                k += 1
              }
            }
          }
          h += 1
        }
        // every occurrence was consumed by the left-to-right pass
        counts.remove(best); where.remove(best)
        rank += 1
      }
    }
    merges.result()
  }

  /** The round-11 full-rescan reference loop (recount all pairs +
    * rewrite every word per merge) — kept as the oracle for
    * [[trainMergesLocal]]'s bit-identity spec; O(numMerges × Σ|syms|),
    * do not use in production paths. */
  private[graft] def trainMergesRescan(
      entries0: Array[(Array[String], Long)], numMerges: Int): Seq[Merge] = {
    var entries = entries0
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]
      entries.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
              (c == best._2 && (cpLess(p._1, best._1._1) ||
                (p._1 == best._1._1 && cpLess(p._2, best._1._2)))))
            best = (p, c)
        }
        val (lhs, rhs) = best._1
        merges += Merge(rank, lhs, rhs)
        entries = entries.map { case (s, f) => (mergePass(s, lhs, rhs), f) }
        rank += 1
      }
    }
    merges.result()
  }

  /** The merges as a tiny (rank, lhs, rhs) table — the persistable
    * model artifact. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "lhs", "rhs")
  }

  /** Persist the trained model (the merge table) as parquet — the
    * tokenizer artifact a pipeline trains once and reuses across runs,
    * like the IVF index lifecycle. */
  def saveModel(spark: SparkSession, merges: Seq[Merge],
                path: String): Unit =
    mergesDf(spark, merges).coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted model, rank-ordered. */
  def loadModel(spark: SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path).select("rank", "lhs", "rhs")
      .orderBy(col("rank")).collect().toSeq
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))

  /** Encode one word greedily: repeatedly merge the lowest-rank pair
    * present (left-to-right within a pass) until none applies —
    * equivalent to applying the merges in rank order (see scaladoc). */
  def encodeWord(word: String, rankOf: Map[(String, String), Int])
      : Array[String] = encodeSyms(toSyms(word), rankOf)

  /** The greedy merge loop over a prepared seed-symbol sequence — the
    * one encode home shared by the code-point ([[encodeWord]]) and
    * byte-level ([[encodeWordBytes]]) forms. */
  private[graft] def encodeSyms(seed: Array[String],
      rankOf: Map[(String, String), Int]): Array[String] = {
    var syms = seed
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rankOf.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else syms = mergePass(syms, syms(bi), syms(bi + 1))
    }
    syms
  }

  private def rankMap(merges: Seq[Merge]): Map[(String, String), Int] =
    merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap

  /** Corpus-wide (token, freq) census of the encoded text. Encoding
    * runs once per DISTINCT word (vocabulary-bounded, after the one
    * word-freq shuffle), then explodes subword tokens and re-aggregates
    * freq-weighted — the raw corpus is read exactly once. */
  def tokenCensus(corpus: DataFrame, textCol: String,
                  merges: Seq[Merge]): DataFrame =
    tokenCensusFromFreq(wordFreq(corpus, textCol), merges)

  /** Census over a precomputed (word, freq) table — pair with
    * [[trainMergesFromFreq]] on a cached word-freq to read the raw
    * corpus exactly ONCE for the whole train+encode chain. */
  def tokenCensusFromFreq(freqDf: DataFrame,
                          merges: Seq[Merge]): DataFrame = {
    val spark = freqDf.sparkSession
    import spark.implicits._
    val rk = rankMap(merges)
    val enc = freqDf.select(col("word"), col("freq")).as[(String, Long)]
      .map { case (w, f) => (encodeWord(w, rk).toSeq, f) }
    enc.select(explode(col("_1")).as("token"), col("_2").as("freq"))
      .groupBy(col("token")).agg(sum(col("freq")).as("freq"))
  }

  /** (word, ntok) — each distinct word's subword token count under the
    * merges: the broadcastable tokenizer lookup table. Corpus-side
    * token counting is then a hash-probe join, never a per-row merge
    * loop (the 100 TB shape for "how many tokens is this corpus"). */
  def wordTokenCounts(freqDf: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = freqDf.sparkSession
    import spark.implicits._
    val rk = rankMap(merges)
    freqDf.select(col("word")).as[String]
      .map(w => (w, encodeWord(w, rk).length.toLong)).toDF("word", "ntok")
  }

  /** (word, toks) — each distinct word's full subword token SEQUENCE
    * under the merges: the materializing tokenizer lookup ([[
    * wordTokenCounts]] is the count-only form). Same broadcast-gate
    * rationale as docTokenCounts — the table is vocabulary-sized. */
  def wordTokens(freqDf: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = freqDf.sparkSession
    import spark.implicits._
    val rk = rankMap(merges)
    freqDf.select(col("word")).as[String]
      .map(w => (w, encodeWord(w, rk).toSeq)).toDF("word", "toks")
  }

  /** Vocabulary rows above which the per-word token-count lookup no
    * longer fits a forced broadcast (same budget rationale as
    * [[TfIdf.maxBroadcastVocab]]: ~4M (word, ntok) entries ≈ a few
    * hundred MB — past the sane executor broadcast budget). */
  val maxBroadcastVocab: Long = 4L << 20

  /** Per-document BPE token totals: explode the corpus to words, probe
    * the per-DISTINCT-word token-count table, sum per doc — corpus-side
    * token counting is a hash probe, never a per-row merge loop.
    *
    * THE VOCABULARY BROADCAST GATE (the TfIdf pattern): on a crawl
    * corpus the distinct-word set runs 10⁸⁺ rows (URLs, typos, unicode
    * junk), so a forced `broadcast(wt)` OOMs the driver/executors. The
    * lookup is broadcast ONLY when the MEASURED vocabulary size is ≤
    * `maxBroadcast` (freqDf is cached by every caller in this repo, so
    * the count is one cached-scan job); above it the join carries no
    * hint and falls back to one bounded shuffle exchange on `word` —
    * still exact, still a single corpus pass. Unlike TfIdf's top-V cap
    * this gate never DROPS words (every word needs its count), which is
    * why it keys on the measured count rather than a truncating cap. */
  def docTokenCounts(corpus: DataFrame, idCol: String, textCol: String,
                     freqDf: DataFrame, merges: Seq[Merge],
                     maxBroadcast: Long = maxBroadcastVocab,
                     knownVocab: Option[Long] = None): DataFrame = {
    val wt = wordTokenCounts(freqDf, merges)
    // callers that already hold the vocabulary size (the SparkEntry
    // word-freq memo) pass it so the gate costs ZERO jobs — the bare
    // form still measures (one cached-scan action)
    val side =
      if (knownVocab.getOrElse(freqDf.count()) <= maxBroadcast)
        broadcast(wt)
      else wt
    corpus
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(side, "word")
      .groupBy(col(idCol)).agg(sum(col("ntok")).as("n_btok"))
  }

  /** Per-row subword tokens column. The merge table is bounded
    * (numMerges entries) and ships in the closure; a per-executor memo
    * caches word → tokens, so repeated words cost a hash probe. The
    * row form trades codegen for convenience — `tokenCensus` (and a
    * word-level join against its encoded vocabulary) is the
    * aggregate-scale path. */
  def withBpeTokens(corpus: DataFrame, textCol: String, merges: Seq[Merge],
                    outCol: String): DataFrame = {
    val rk = rankMap(merges)
    val enc = udf(new BpeEncoder(rk))
    corpus.withColumn(outCol, enc(col(textCol)))
  }

  /** Serializable encoder with a per-executor word memo. */
  private final class BpeEncoder(rk: Map[(String, String), Int])
      extends (String => Seq[String]) with Serializable {
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]
    def apply(text: String): Seq[String] =
      if (text == null) null
      else text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
        memo.computeIfAbsent(w, encodeWord(_, rk))
      }.toSeq
  }

  // ------------------------------------------------- byte-level form

  /** Lossless pre-tokenization regex for BYTE-level BPE (the
    * production tokenizer form, GPT-2-style byte fallback — t65):
    * CJK ideographs / kana / hangul are one pre-token PER CODE POINT
    * (the BERT CJK rule: unsegmented scripts would otherwise form
    * near-unique whole-phrase "words" that blow out the bounded
    * frequency dictionary), then letter+combining-mark runs, digit
    * runs, whitespace runs, and other-symbol runs. The branches cover
    * the whole alphabet, so every character lands in exactly one
    * pre-token and detokenization is an EXACT round-trip (whitespace
    * included — unlike [[wordFreq]]'s space split, nothing is thrown
    * away). Restricted to the Java-regex ∩ RE2 subset (no class
    * intersection, no lookahead) so the DuckDB oracle replays the SAME
    * pattern; both engines match alternations leftmost-first, so the
    * single-code-point CJK branch wins wherever a run STARTS on CJK.
    * The letter branch EXCLUDES CJK so a run that starts on a non-CJK
    * letter BREAKS at the script boundary ("iPhone超大" → "iPhone" +
    * one pre-token per ideograph — round-15 verdict item #4; GPT-2's
    * own regex never splits CJK, so this is strictly finer). RE2 has
    * no class subtraction, but [^\P{L}<cjk>] = letter AND not-CJK is
    * in the common subset; marks join the run via the \p{M}
    * alternative as before. */
  private val cjkRanges: String =
    "\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}\\x{F900}-\\x{FAFF}" +
      "\\x{3040}-\\x{30FF}\\x{31F0}-\\x{31FF}\\x{AC00}-\\x{D7AF}"
  val preTokRe: String =
    s"[$cjkRanges]|(?:[^\\P{L}$cjkRanges]|\\p{M})+" +
      "|\\p{N}+|\\s+|[^\\p{L}\\p{M}\\p{N}\\s]+"

  /** (word, freq) over the byte-level pre-tokenization — the one
    * corpus-sized pass of the byte form (same 100 TB shape as
    * [[wordFreq]]: one shuffle with map-side combine; training and
    * encoding are bounded by the dictionary). */
  def byteWordFreq(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(regexp_extract_all(col(textCol), lit(preTokRe),
        lit(0))).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))

  /** Seed symbols of the BYTE form: the word's UTF-8 bytes as
    * two-uppercase-hex-digit symbols (what both Spark's and DuckDB's
    * `hex(encode(word))` emit, split in pairs) plus the end marker.
    * Every possible input is spelled from 256 seed symbols — the byte
    * fallback: no OOV symbol can ever exist, no whitespace assumption,
    * any script tokenizes. */
  private[graft] def toSymsBytes(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length + 1)
    var i = 0
    while (i < bytes.length) {
      out(i) = f"${bytes(i) & 0xff}%02X"
      i += 1
    }
    out(bytes.length) = EndMark
    out
  }

  /** Train byte-level merges from a precomputed byte-pre-token
    * frequency table — [[trainMergesFromFreq]] with byte-hex seeds;
    * the trainer itself is symbol-agnostic. */
  def trainMergesBytesFromFreq(freqDf: DataFrame, numMerges: Int,
                               maxWords: Int = 1 << 20): Seq[Merge] = {
    val wf = freqDf
      .orderBy($"freq".desc, $"word".asc).limit(maxWords)
      .collect()
    trainMergesLocal(
      wf.map(r => (toSymsBytes(r.getString(0)), r.getLong(1))), numMerges)
  }

  /** Greedy byte-level encode of one pre-token. */
  def encodeWordBytes(word: String, rankOf: Map[(String, String), Int])
      : Array[String] = encodeSyms(toSymsBytes(word), rankOf)

  /** (word, ntok) — each distinct byte-pre-token's subword count under
    * the byte merges: [[wordTokenCounts]] for the byte form (same
    * broadcast-gate rationale — corpus-side token counting is a hash
    * probe, never a per-row merge loop). */
  def byteWordTokenCounts(freqDf: DataFrame,
                          merges: Seq[Merge]): DataFrame = {
    val spark = freqDf.sparkSession
    import spark.implicits._
    val rk = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    freqDf.select(col("word")).as[String]
      .map(w => (w, encodeWordBytes(w, rk).length.toLong))
      .toDF("word", "ntok")
  }

  /** Pre-tokenize + byte-encode a whole text into the flat token
    * stream (driver/spec form; the distributed path goes through
    * [[byteWordFreq]] + a per-DISTINCT-word probe like
    * [[docTokenCounts]]). */
  def encodeTextBytes(text: String,
                      rankOf: Map[(String, String), Int]): Seq[String] = {
    val m = java.util.regex.Pattern.compile(preTokRe).matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out ++= encodeWordBytes(m.group(0), rankOf)
    out.result()
  }

  /** Decode a byte-level token stream back to text — the exact
    * inverse of [[encodeTextBytes]] (the pre-tokenization is a lossless
    * partition of the text, merges only concatenate hex symbols, and
    * [[EndMark]] can only ever be a token SUFFIX, so stripping it and
    * un-hexing the concatenation reproduces the original bytes). */
  def decodeTokensBytes(tokens: Seq[String]): String = {
    val bb = new java.io.ByteArrayOutputStream()
    tokens.foreach { t =>
      val h = if (t.endsWith(EndMark)) t.dropRight(EndMark.length) else t
      require(h.length % 2 == 0 && h.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F')),
        s"not a byte-level token: '$t'")
      var i = 0
      while (i < h.length) {
        bb.write(Integer.parseInt(h.substring(i, i + 2), 16))
        i += 2
      }
    }
    new String(bb.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}
