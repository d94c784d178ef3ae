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
  private[graft] def cpLess(a: String, b: String): Boolean = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    i >= a.length && j < b.length
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
    var entries: Array[(Array[String], Long)] =
      wf.map(r => (toSyms(r.getString(0)), r.getLong(1)))
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
      : Array[String] = {
    var syms = toSyms(word)
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
}
