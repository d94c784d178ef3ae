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

  /** Duplicate-span coverage (the exact-substring-dedup signal at gram
    * granularity): the fraction of each document's tokens lying inside a
    * word n-gram that occurs in ≥ `minDocs` distinct documents. Docs
    * dominated by corpus-frequent spans are templates/boilerplate and
    * the standard policy drops or trims them.
    *
    * Output: (id, ntok, ncov, cov) per document — token count, covered
    * token count, coverage fraction (4-dp `roundBin`, engine-portable).
    *
    * 100 TB shape: one census shuffle over (hash, partial-count) pairs
    * with map-side combine (grams travel as i64 hashes, never strings);
    * the frequent set is a heavy-hitter list — bounded above by
    * total-grams / minDocs and in practice tiny — so the membership
    * probe is a broadcast semi-join over the per-doc gram scan, and the
    * only other shuffle is the per-doc distinct-position count. Token
    * positions never leave their document's rows. */
  def dupSpanCoverage(corpus: DataFrame, idCol: String, textCol: String,
                      n: Int, minDocs: Int): DataFrame = {
    import graft.functions.NgramHashExpr.ngramHashes
    val grams = corpus.select(col(idCol).as("id"),
      posexplode(ngramHashes(col(textCol), n)).as(Seq("i", "g")))
    val freq = grams.groupBy($"g")
      .agg(countDistinct($"id").as("nd"))
      .filter($"nd" >= minDocs)
      .select($"g")
    // A gram at token position i covers tokens i..i+n-1; a token is
    // covered if ANY frequent gram spans it → distinct positions.
    val covered = grams.join(broadcast(freq), Seq("g"))
      .select($"id", explode(sequence($"i", $"i" + lit(n - 1))).as("p"))
      .groupBy($"id").agg(countDistinct($"p").as("ncov"))
    corpus
      .select(col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("ntok"))
      .join(covered, Seq("id"), "left")
      .select($"id", $"ntok",
        coalesce($"ncov", lit(0L)).as("ncov"),
        graft.functions.RF.roundBin(
          coalesce($"ncov", lit(0L)).cast("double") / $"ntok", 4).as("cov"))
  }

  /** Exact substring-span REMOVAL (ExactSubstr, Lee et al. 2022): excise
    * every word n-gram span occurring in ≥ `minDocs` distinct documents
    * from the surviving text, instead of dropping whole documents
    * (`Decontam.clean`) or merely measuring coverage
    * (`dupSpanCoverage`). Overlapping flagged grams merge into maximal
    * spans; the uncovered tokens are re-joined with ' '.
    *
    * EXACTNESS BOUND vs Lee et al.'s suffix-array construction
    * (PropertySpec pins each clause): at token granularity the census
    * is EXACT for cross-document duplication — a token is excised iff
    * it lies inside an n-token window shared by ≥ `minDocs` distinct
    * documents, so every maximal cross-doc duplicated span of length
    * ≥ n is excised in full (each of its n-subgrams is shared), and
    * nothing else is (modulo clause 3). The three divergences:
    *  1. duplicated spans SHORTER than n tokens are missed entirely —
    *     the same role as Lee et al.'s 50-char threshold, but measured
    *     in whole tokens, not characters;
    *  2. a substring repeated ≥ 2 times WITHIN one document but
    *     nowhere else is NOT excised by THIS form (the census counts
    *     distinct documents; the suffix array counts raw occurrences) —
    *     [[dupSpanRemoveFull]] closes this clause with a row-local
    *     repeat scan, leaving only clauses 1 and 3;
    *  3. grams travel as i64 hashes, so a hash collision can
    *     false-positive a span (~2⁻⁶⁴ per gram pair — negligible, and
    *     the failure mode is over-removal, never retention).
    *
    * Output per document: (id, ntok, nspans, tok_removed, clean_text,
    * chars_removed) — token count, maximal merged span count, covered
    * token count, the cleaned text, characters dropped.
    *
    * 100 TB shape: identical to `dupSpanCoverage` — ONE census shuffle
    * over (hash, partial-count) pairs with map-side combine (grams are
    * i64 hashes, never strings), the frequent set is a heavy-hitter
    * broadcast (bounded by total-grams / minDocs), and the only other
    * shuffle groups flagged START positions per document (≤ ntok ints
    * per doc — positions never pair up across documents). The span
    * merge + text rebuild is one codegen pass per row
    * (`functions.SpanExcise`), O(ntok + n·|starts|). */
  /** @param minSpanTokens ExactSubstr's span-length floor: merged spans
    *        shorter than this many tokens are left in place (Lee et al.
    *        excise only LONG repeated substrings; short frequent grams
    *        are ordinary language). 0 = excise every flagged span. */
  def dupSpanRemove(corpus: DataFrame, idCol: String, textCol: String,
                    n: Int, minDocs: Int, minSpanTokens: Int = 0): DataFrame =
    dupSpanRemoveWithFreq(corpus, idCol, textCol, n,
      frequentGrams(corpus, idCol, textCol, n, minDocs), minSpanTokens)

  /** The corpus-frequent gram set: hashes of word n-grams occurring in
    * ≥ `minDocs` distinct documents (column `g`) — the heavy-hitter
    * artifact the excise pass probes. Computed once per reference
    * corpus; at scale this is the thing you persist and reuse (the
    * streaming form cleans a live feed against a STATIC set). */
  def frequentGrams(corpus: DataFrame, idCol: String, textCol: String,
                    n: Int, minDocs: Int): DataFrame = {
    import graft.functions.NgramHashExpr.ngramHashes
    corpus
      .select(col(idCol).as("id"),
        explode(ngramHashes(col(textCol), n)).as("g"))
      .groupBy($"g")
      .agg(countDistinct($"id").as("nd"))
      .filter($"nd" >= minDocs)
      .select($"g")
  }

  /** FULL ExactSubstr (Lee et al. 2022 semantics for BOTH duplication
    * cases): [[dupSpanRemove]]'s cross-document excision composed with
    * WITHIN-document repeated spans — positions whose n-gram already
    * occurred earlier in the SAME document (keep-first: the first
    * occurrence survives unless it is itself corpus-frequent; the
    * suffix array likewise keeps one copy). This closes divergence
    * clause 2 of [[dupSpanRemove]]'s exactness bound: with this form
    * only spans SHORTER than n tokens are missed (plus the 2⁻⁶⁴ hash
    * collision clause).
    *
    * 100 TB shape: the within-doc half is `functions.RepeatStarts` —
    * entirely row-local (one hash-set pass per doc, NO extra shuffle);
    * the cross-doc half is unchanged (one census shuffle + heavy-hitter
    * broadcast). Output adds `n_within` (flagged within-doc start
    * count) to the [[dupSpanRemove]] columns. */
  def dupSpanRemoveFull(corpus: DataFrame, idCol: String, textCol: String,
                        n: Int, minDocs: Int,
                        minSpanTokens: Int = 0): DataFrame = {
    import graft.functions.NgramHashExpr.{ngramHashes, repeatStarts}
    import graft.functions.SpanExciseExpr.excise
    val grams = corpus.select(col(idCol).as("id"),
      posexplode(ngramHashes(col(textCol), n)).as(Seq("i", "g")))
    val freq = frequentGrams(corpus, idCol, textCol, n, minDocs)
    val flagged = grams.join(broadcast(freq), Seq("g"))
      .groupBy($"id").agg(collect_set($"i").as("starts"))
    corpus
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .join(flagged, Seq("id"), "left")
      .withColumn("wstarts", repeatStarts(ngramHashes($"text", n)))
      .withColumn("allstarts", array_distinct(concat(
        coalesce($"starts", array().cast("array<int>")), $"wstarts")))
      .withColumn("x", excise($"text", $"allstarts", n, minSpanTokens))
      .select($"id",
        size(split($"text", " ")).cast("long").as("ntok"),
        size($"wstarts").cast("long").as("n_within"),
        $"x".getField("nspans").cast("long").as("nspans"),
        $"x".getField("removed").cast("long").as("tok_removed"),
        $"x".getField("clean").as("clean_text"),
        (length($"text") - length($"x".getField("clean")))
          .cast("long").as("chars_removed"))
  }

  /** [[dupSpanRemove]] against a PRE-COMPUTED frequent-gram set (one
    * `g` column) — the production split: census over the reference
    * corpus once, excise any number of corpora / stream micro-batches
    * against the broadcast set. */
  def dupSpanRemoveWithFreq(corpus: DataFrame, idCol: String,
                            textCol: String, n: Int, freq: DataFrame,
                            minSpanTokens: Int = 0): DataFrame = {
    import graft.functions.NgramHashExpr.ngramHashes
    import graft.functions.SpanExciseExpr.excise
    val grams = corpus.select(col(idCol).as("id"),
      posexplode(ngramHashes(col(textCol), n)).as(Seq("i", "g")))
    val flagged = grams.join(broadcast(freq.select(col("g"))), Seq("g"))
      .groupBy($"id").agg(collect_set($"i").as("starts"))
    corpus
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .join(flagged, Seq("id"), "left")
      .withColumn("x", excise($"text",
        coalesce($"starts", array().cast("array<int>")), n, minSpanTokens))
      .select($"id",
        size(split($"text", " ")).cast("long").as("ntok"),
        $"x".getField("nspans").cast("long").as("nspans"),
        $"x".getField("removed").cast("long").as("tok_removed"),
        $"x".getField("clean").as("clean_text"),
        (length($"text") - length($"x".getField("clean")))
          .cast("long").as("chars_removed"))
  }

  /** LINE-level boilerplate removal (the RefinedWeb / CCNet line-dedup
    * stage): a line whose corpus DOCUMENT frequency exceeds `maxDf` is
    * boilerplate (cookie banners, nav bars, footers) and is dropped
    * from every document; surviving lines reassemble in original
    * order. Distinct-per-doc first, so a line repeated inside ONE
    * document counts once toward df.
    *
    * 100 TB shape: one line explode + ONE line census shuffle
    * (map-side combined); the frequent-line set is BOUNDED by
    * counting (≤ total_lines / maxDf rows can exceed df > maxDf), so
    * it broadcasts back as a left-anti drop filter — the t24
    * frequent-gram probe pattern, never a corpus-vs-corpus join.
    * Reassembly is a row-local array sort.
    *
    * Line splitting uses split(_, "\n", -1): Spark's default split
    * DROPS trailing empty strings while DuckDB keeps them — the -1
    * limit keeps the two engines identical on texts ending in
    * newlines.
    *
    * Returns (idCol, n_lines, n_kept, clean) — `clean` is the
    * reassembled text ('' when every line was boilerplate). */
  def lineDedup(corpus: DataFrame, idCol: String, textCol: String,
                maxDf: Int, sep: String = "\n"): DataFrame =
    lineDedupWithFreq(corpus, idCol, textCol,
      frequentLines(corpus, idCol, textCol, maxDf, sep), sep)

  /** PARAGRAPH-scope [[lineDedup]] — RefinedWeb dedups lines AND
    * paragraphs; a paragraph is a blank-line-separated block, so the
    * same census machinery runs with sep = "\n\n". Multi-line
    * boilerplate (a whole cookie banner, a footer block) that
    * line-dedup would only remove line-by-line drops as a unit here. */
  def paragraphDedup(corpus: DataFrame, idCol: String, textCol: String,
                     maxDf: Int): DataFrame =
    lineDedup(corpus, idCol, textCol, maxDf, sep = "\n\n")

  /** The corpus-frequent (boilerplate) line set: df > maxDf — bounded
    * by counting (≤ total_lines / maxDf rows). `sep` is a Java regex
    * for the Spark split (the defaults "\n" / "\n\n" have no
    * metacharacters, so the DuckDB literal string_split replays them
    * exactly). */
  def frequentLines(corpus: DataFrame, idCol: String, textCol: String,
                    maxDf: Int, sep: String = "\n"): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    corpus.select(col(idCol),
        explode(split(col(textCol), sep, -1)).as("line"))
      .distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("line"))
  }

  /** Driver-side frequent-line set for the STREAMING scoring form
    * (t71): bounded pull under an explicit gate (the maxAppendBatch
    * rule — the set is counting-bounded but a tiny maxDf over a huge
    * corpus could still blow the driver). */
  def collectFrequentLines(corpus: DataFrame, idCol: String,
                           textCol: String, maxDf: Int,
                           maxCollect: Int = 1 << 20,
                           sep: String = "\n"): Seq[String] = {
    val pulled = frequentLines(corpus, idCol, textCol, maxDf, sep)
      .limit(maxCollect + 1).collect().map(_.getString(0)).toSeq
    require(pulled.length <= maxCollect,
      s"frequent-line set exceeds maxCollect=$maxCollect — raise maxDf " +
        s"or keep the set distributed (bounded driver-pull gate)")
    pulled
  }

  /** [[lineDedup]] against a PRE-COMPUTED frequent-line set — the
    * streaming scoring form: new batches clean against the persisted
    * boilerplate set without re-running the census (the
    * dupSpanRemoveWithFreq split). */
  def lineDedupWithFreq(corpus: DataFrame, idCol: String, textCol: String,
                        frequent: DataFrame,
                        sep: String = "\n"): DataFrame = {
    val lines = corpus.select(col(idCol),
      posexplode(split(col(textCol), sep, -1)).as(Seq("pos", "line")))
    val kept = lines.join(broadcast(frequent), Seq("line"), "left_anti")
    val re = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(sep,
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line"))).as("clean"))
    corpus.select(col(idCol),
        size(split(col(textCol), sep, -1)).cast("long").as("n_lines"))
      .join(re, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean"), lit("")).as("clean"))
  }

  /** Flesch–Kincaid readability card in EXACT integers. Words = runs of
    * non-space (`[^ ]+`, the corpus space-token convention); sentences =
    * runs of `[.!?]+` (floored at 1); syllables = vowel groups
    * (`[aeiouy]+` over the lowercased text — groups never span a space,
    * so the whole-text count equals the per-word sum) plus one for each
    * word with no vowel at all (`[^ ]*[aeiouy][^ ]*` counts exactly one
    * match per word containing a vowel — leftmost-first greedy in both
    * Java regex and RE2). The FK grade 0.39·W/S + 11.8·Syl/W − 15.59 is
    * carried as the exact integer pair (fk_num, fk_den) with
    * fk_num = 39·W² + 1180·Syl·S − 1559·S·W and fk_den = 100·S·W — no
    * float ever computes, so band cuts are cross-multiplied integer
    * comparisons and the card replays bit-for-bit in any engine.
    * ONE narrow codegen pass, no explode, no shuffle. */
  def readability(corpus: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val lt = lower(col(textCol))
    val w = regexp_count(col(textCol), lit("[^ ]+")).cast("long")
    val s = greatest(
      regexp_count(col(textCol), lit("[.!?]+")).cast("long"), lit(1L))
    val vg = regexp_count(lt, lit("[aeiouy]+")).cast("long")
    val vt = regexp_count(lt, lit("[^ ]*[aeiouy][^ ]*")).cast("long")
    corpus
      .select(col(idCol), w.as("n_words"), s.as("n_sents"),
        (vg + w - vt).as("n_syll"))
      .select(col(idCol), $"n_words", $"n_sents", $"n_syll",
        greatest($"n_words", lit(1L)).as("w1"))
      .select(col(idCol), $"n_words", $"n_sents", $"n_syll",
        (lit(39L) * $"w1" * $"w1" + lit(1180L) * $"n_syll" * $"n_sents"
          - lit(1559L) * $"n_sents" * $"w1").as("fk_num"),
        (lit(100L) * $"n_sents" * $"w1").as("fk_den"))
      .select(col(idCol), $"n_words", $"n_sents", $"n_syll",
        $"fk_num", $"fk_den",
        when($"fk_num" < lit(8L) * $"fk_den", "easy")
          .when($"fk_num" < lit(13L) * $"fk_den", "medium")
          .otherwise("hard").as("band"))
  }

  /** Encoding-anomaly (mojibake) census — the crawl-hygiene signal for
    * text that survived a broken decode: U+FFFD replacement characters,
    * raw C1 controls (U+0080–U+009F — never legitimate in clean text),
    * and the UTF-8-read-as-Latin-1 signature Ã (U+00C3) followed by a
    * continuation-range code point (U+0080–U+00BF, the second byte of a
    * 2-byte UTF-8 sequence mis-decoded). Patterns are spelled as
    * ASCII-only `\x{hhhh}` escapes — identical syntax and semantics in
    * Java regex and RE2, and immune to the source-transit NFC trap
    * (CLAUDE.md round-16 tooling lesson). ONE narrow codegen pass. */
  def encodingAnomalies(corpus: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    corpus.select(col(idCol),
        regexp_count(col(textCol), lit("\\x{FFFD}"))
          .cast("long").as("n_fffd"),
        regexp_count(col(textCol), lit("[\\x{0080}-\\x{009F}]"))
          .cast("long").as("n_c1"),
        regexp_count(col(textCol), lit("\\x{00C3}[\\x{0080}-\\x{00BF}]"))
          .cast("long").as("n_moji"))
      .select(col(idCol), $"n_fffd", $"n_c1", $"n_moji",
        ($"n_fffd" + $"n_c1" + $"n_moji" > 0L).cast("int").as("flagged"))

  /** Vocabulary-growth (Heaps' law) card: distinct-type and token-mass
    * accumulation over doc_id-ordered corpus prefixes — the dataset-
    * scaling diagnostic (does vocabulary keep growing, i.e. is the
    * corpus still contributing novelty, or has it saturated?). Shape:
    * one (word → min bucket) census assigns each type to its FIRST
    * bucket, so cumulative vocabulary is a plain cumsum over the
    * BUCKET census (≤ a few hundred rows at any corpus size) — the
    * single-partition window runs over bucket rows, never corpus rows;
    * the heavy lifting is two ordinary hash aggregations. */
  def vocabGrowth(corpus: DataFrame, idCol: String, textCol: String,
                  bucketSize: Long): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive: $bucketSize")
    val toks = corpus
      .select(expr(s"`$idCol` div ${bucketSize}L").as("bucket"),
        explode(split(col(textCol), " ")).as("word"))
      .filter($"word" =!= "")
    val perBucket = toks.groupBy($"bucket")
      .agg(count(lit(1)).as("n_tokens"))
    val firstB = toks.groupBy($"word").agg(min($"bucket").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("new_vocab"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"bucket")
    perBucket.join(firstB, Seq("bucket"), "left")
      .select($"bucket", $"n_tokens",
        coalesce($"new_vocab", lit(0L)).as("new_vocab"))
      .select($"bucket", $"n_tokens",
        sum($"n_tokens").over(w).as("tokens_cum"),
        $"new_vocab",
        sum($"new_vocab").over(w).as("vocab_cum"))
  }

  /** Leave-one-out n-gram novelty: per document, how many of its
    * DISTINCT word n-gram hashes appear in NO other document. The
    * standard memorization/diversity card (novel-gram rate of a corpus
    * slice). Shape: THREE corpus-sized exchanges — the (doc_id, g)
    * distinct, the census groupBy(g) on its output, and the join
    * back's re-shuffle of the pair side by g (the distinct leaves data
    * partitioned on (doc_id, g), NOT g — don't trust this join to
    * reuse that exchange) — then the per-doc fold. Grams travel as i64
    * hashes throughout (`functions.NgramHashes`, the t09/t14
    * convention). Never all-pairs; 100 TB-safe by construction. */
  def ngramNovelty(corpus: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    import graft.functions.NgramHashExpr.ngramHashes
    val grams = corpus
      .select(col(idCol), explode(ngramHashes(col(textCol), n)).as("g"))
      .distinct()
    val census = grams.groupBy($"g").agg(count(lit(1)).as("df"))
    grams.join(census, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"df" === 1L, 1L).otherwise(0L)).as("n_novel"))
  }

  /** Character-entropy quality card: per document the exact rational
    * entropy (ent_num, ent_den = 64·n) of the code-point distribution
    * in 1/64-bit integers ([[graft.functions.CharEntropy64]]) plus a
    * three-way band — 'low' below `lowBits64`/64 bits per char (the
    * gibberish/degenerate-repetition gate), 'high' above
    * `highBits64`/64 (symbol soup / binary-as-text), 'mid' between.
    * Cuts are cross-multiplied integer comparisons; no float ever
    * computes. ONE narrow codegen pass, no shuffle. */
  def charEntropy(corpus: DataFrame, idCol: String, textCol: String,
                  lowBits64: Long, highBits64: Long): DataFrame = {
    require(0 <= lowBits64 && lowBits64 <= highBits64,
      s"need 0 <= lowBits64 <= highBits64, got $lowBits64, $highBits64")
    import graft.functions.EntropyExpr.charEntropy64
    corpus
      .select(col(idCol), length(col(textCol)).cast("long").as("n_cp"),
        charEntropy64(col(textCol)).as("ent_num"))
      .select(col(idCol), $"n_cp", $"ent_num",
        (lit(64L) * greatest($"n_cp", lit(1L))).as("ent_den"))
      .select(col(idCol), $"n_cp", $"ent_num", $"ent_den",
        when($"ent_num" * 64L < lit(lowBits64) * $"ent_den", "low")
          .when($"ent_num" * 64L > lit(highBits64) * $"ent_den", "high")
          .otherwise("mid").as("band"))
  }

  /** Compression-ratio quality card (the Gopher "compresses too well"
    * gate, engine-exact): per document the LZW phrase count
    * ([[graft.functions.LzwPhrases]]) and a flag for documents whose
    * phrases-per-code-point ratio falls below flagNum/flagDen —
    * repetitive/templated text parses into few long phrases. The gate
    * is a cross-multiplied integer comparison. ONE codegen pass. */
  def compressionRatio(corpus: DataFrame, idCol: String, textCol: String,
                       flagNum: Long, flagDen: Long): DataFrame = {
    require(flagDen > 0 && flagNum >= 0,
      s"need flagDen > 0, flagNum >= 0, got $flagNum/$flagDen")
    import graft.functions.EntropyExpr.lzwPhrases
    corpus
      .select(col(idCol), length(col(textCol)).cast("long").as("n_cp"),
        lzwPhrases(col(textCol)).as("n_phrases"))
      .select(col(idCol), $"n_cp", $"n_phrases",
        ($"n_phrases" * flagDen < $"n_cp" * flagNum)
          .cast("int").as("flagged"))
  }

  /** The composed keep/drop GATE STACK (t98): entropy ≥ entMin64/64
    * bits, blocklist hits < blockMax, language-ID margin ≥
    * langMinPerGram64/64 bit per vocab gram, quality ≥ qMin — per-doc
    * reason flags plus keep = the conjunction, ALL FOUR gates in ONE
    * narrow codegen pass (the langid model rides in the folded kernel,
    * not a join — plan-pinned in PlanShapeSpec). One home shared by
    * the t98 query and its streaming twin. */
  def gateStack(corpus: DataFrame, idCol: String, textCol: String,
                kernel: graft.functions.LangNbKernel,
                phrases: Seq[String], entMin64: Long, blockMax: Long,
                langMinPerGram64: Long, qMin: Double): DataFrame = {
    require(kernel.langs.length >= 2,
      s"gate stack needs >= 2 languages, kernel has ${kernel.langs.length}")
    val p = phrases.size
    corpus
      .select(col(idCol),
        graft.functions.EntropyExpr.charEntropy64(col(textCol))
          .as("ent_num"),
        (lit(64L) * greatest(length(col(textCol)).cast("long"), lit(1L)))
          .as("ent_den"),
        element_at(
          graft.functions.AcCounts.acCounts(col(textCol), phrases), p + 1)
          .as("n_hits"),
        coalesce(graft.functions.LangNbScore.stats(col(textCol), kernel),
          typedLit(Seq(-1L, 0L, 0L))).as("st"),
        graft.functions.QualityExpr.qualityScore(col(textCol)).as("q"))
      .select(col(idCol),
        ($"ent_num" * 64L >= lit(entMin64) * $"ent_den")
          .cast("int").as("ent_ok"),
        ($"n_hits" < blockMax).cast("int").as("block_ok"),
        (element_at($"st", 3) > 0L &&
          element_at($"st", 2) >= lit(langMinPerGram64) * element_at($"st", 3))
          .cast("int").as("lang_ok"),
        ($"q" >= qMin).cast("int").as("q_ok"))
      .select(col(idCol), $"ent_ok", $"block_ok", $"lang_ok", $"q_ok",
        ($"ent_ok" * $"block_ok" * $"lang_ok" * $"q_ok").as("keep"))
  }

  /** Zipf rank-frequency card: token frequencies at OCTAVE ranks
    * (1, 2, 4, … ≤ maxRank) plus the per-octave slope in 1/64-bit
    * integers — slope64(o) = s64(f(2^{o−1})) − s64(f(2^o)), which IS
    * the local Zipf exponent ·64 because the rank axis steps exactly
    * one binary order of magnitude per octave (log2(2^o/2^{o−1}) = 1 —
    * no division, no float, ever). A healthy natural-language corpus
    * reads slope64 ≈ 64 (exponent ≈ 1); templated/synthetic slices
    * flatten or cliff. The heavy work is ONE word census shuffle; the
    * octave probe runs over ≤ log2(maxRank) rank rows (top-maxRank
    * folds to TakeOrderedAndProject — no global sort). Ties rank by
    * (cnt DESC, word ASC) — the total order every census card uses. */
  def zipfCard(corpus: DataFrame, idCol: String, textCol: String,
               maxRank: Int): DataFrame = {
    require(maxRank >= 1, s"maxRank must be >= 1: $maxRank")
    import graft.operators.NgramLm.surprisal64
    val cen = corpus
      .select(explode(split(col(textCol), " ", -1)).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"word".asc)
      .limit(maxRank)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"cnt".desc, $"word".asc)
    val ranked = cen
      .select($"word", $"cnt", row_number().over(w).cast("long").as("rank"))
      .filter(expr("rank & (rank - 1)") === 0L) // octave ranks only
    val lagW = org.apache.spark.sql.expressions.Window.orderBy($"rank")
    ranked
      .select($"rank", $"word", $"cnt", surprisal64($"cnt").as("s64f"))
      .select($"rank", $"word", $"cnt",
        (lag($"s64f", 1).over(lagW) - $"s64f").as("slope64"))
  }

  /** Per-source unigram KL divergence vs the whole corpus — the
    * distribution-drift card for mixture design (which slice's token
    * distribution has wandered from the blend, the DSIR §2 signal at
    * slice granularity). ENTIRELY in 1/64-bit integer surprisal:
    * with c = count(word|src), d = count(word), Ns = Σc, M = Σd,
    *
    *   kl_num(src) = Σ_w c·(s64(c·M) − s64(d·Ns)),  kl_den = 64·Ns
    *
    * ≈ 64·Ns·KL(p_src ‖ p_corpus) bits — every source word is a corpus
    * word, so d ≥ c ≥ 1 and no smoothing is needed. s64's ±0.086-bit
    * interpolation error can push near-zero divergences slightly
    * NEGATIVE — fine for a card; cuts are cross-multiplied on the
    * exact rational. `drifted` flags slices above driftNum/driftDen
    * bits.
    *
    * Shape: ONE corpus-sized exchange (the (src, word) census, map-side
    * combined); the per-word totals, per-source totals and the KL join
    * all run over the vocab×sources census, which is localCheckpoint'd
    * first — the t13 lesson: three derived groupings over a lazy census
    * would re-run the corpus explode three times. Overflow guard (the
    * KN runtime-operand rule): both s64 arguments are bounded by
    * max(d)·M, checked in BigInt against the 2^57 shift limit. */
  def sourceKl(corpus: DataFrame, srcCol: String, textCol: String,
               driftNum: Long, driftDen: Long): DataFrame = {
    require(driftDen > 0 && driftNum >= 0,
      s"need driftDen > 0, driftNum >= 0, got $driftNum/$driftDen")
    import graft.operators.NgramLm.surprisal64
    val toks = corpus
      .select(col(srcCol).as("src"),
        explode(split(col(textCol), " ", -1)).as("word"))
      .filter($"word" =!= "")
    val cen = toks.groupBy($"src", $"word").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val d = cen.groupBy($"word").agg(sum($"c").as("d"))
    val ns = cen.groupBy($"src").agg(sum($"c").as("n_tokens"))
    // fail fast on a token-less corpus: sum/max of an empty agg is
    // NULL and getLong would NPE (the stageTimeOrderedFeed lesson).
    // M = Σc ≡ Σd exactly, so ONE action over the word census yields
    // both guards (r19: was two driver jobs per call)
    val gRow = d.agg(sum($"d"), max($"d")).collect()(0)
    require(!gRow.isNullAt(0),
      "sourceKl needs at least one non-empty token in the corpus")
    val m = gRow.getLong(0)
    val maxD = gRow.getLong(1)
    require(BigInt(maxD) * BigInt(m) < (BigInt(1) << 57),
      s"sourceKl surprisal operand overflow: max(d)*M = $maxD*$m >= 2^57" +
        " — shard the corpus or hash-bucket the vocabulary first")
    cen.join(d, Seq("word")).join(ns, Seq("src"))
      .select($"src", $"n_tokens",
        ($"c" * (surprisal64($"c" * m) -
          surprisal64($"d" * $"n_tokens"))).as("term"))
      .groupBy($"src", $"n_tokens")
      .agg(sum($"term").as("kl_num"))
      .select($"src", $"n_tokens", $"kl_num",
        (lit(64L) * $"n_tokens").as("kl_den"))
      .select($"src", $"n_tokens", $"kl_num", $"kl_den",
        ($"kl_num" * driftDen > lit(driftNum) * $"kl_den")
          .cast("int").as("drifted"))
  }

  /** Per-source token-mass concentration card (the corpus-balance
    * governance view: is one source's mass carried by a few huge
    * documents?): Gini coefficient over per-document token counts
    * within each source, plus the top-document share.
    *
    *   gini = Σ_i (2i − n − 1)·x_(i) / (n·Σx)   (x sorted ascending)
    *
    * The numerator folds to 2·Σ(rank·x) − (n+1)·Σx, so the engine
    * needs ONE window (rank within source by (wc, doc_id) — ties
    * permute equal x values, which leaves the sum invariant, so the
    * tie-break only buys determinism) and one aggregation. Σ(rank·x)
    * rides in DECIMAL(38,0) (rank ≤ n and x can both be corpus-scale —
    * the q68 moments discipline); only the two reported ratios divide,
    * through an identical fixed-order chain + 6-dp roundBin both
    * engines. wc counts split(" ") CELLS (empties included — the t69
    * rule), so wc ≥ 1 and no denominator can be zero. */
  def concentrationCard(corpus: DataFrame, srcCol: String, idCol: String,
                        textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.RF
    val wc = corpus.select(col(srcCol).as("src"), col(idCol).as("id"),
      size(split(col(textCol), " ", -1)).cast("long").as("wc"))
    val w = Window.partitionBy($"src").orderBy($"wc", $"id")
    wc.withColumn("rk", row_number().over(w))
      .groupBy($"src")
      .agg(count(lit(1)).as("n_docs"),
        sum($"wc").as("total_tokens"),
        sum($"rk".cast("decimal(38,0)") * $"wc").as("srx"),
        max($"wc").as("max_wc"))
      .select($"src", $"n_docs", $"total_tokens",
        RF.roundBin(
          (lit(2).cast("decimal(38,0)") * $"srx" -
            ($"n_docs" + 1).cast("decimal(38,0)") * $"total_tokens")
            .cast("double")
            / $"n_docs".cast("double") / $"total_tokens".cast("double"),
          6).as("gini"),
        RF.roundBin(
          $"max_wc".cast("double") / $"total_tokens".cast("double"), 6)
          .as("top1_share"))
  }

  /** Blocklist census (the C4/RefinedWeb banned-wordlist gate): per
    * document the total occurrence count over `phrases` (ALL matches,
    * overlapping included), the number of distinct phrases present, the
    * most-frequent phrase (ties → first in list order; NULL when
    * clean), and a flag at ≥ `flagMin` total hits. The whole scan is
    * ONE Aho–Corasick codegen pass ([[graft.functions.AcCounts]]) —
    * the automaton is a bounded broadcast-free model artifact riding in
    * the generated code, so the corpus side has no per-phrase regex
    * passes, no explode, no join, no shuffle. */
  def blocklistCensus(corpus: DataFrame, idCol: String, textCol: String,
                      phrases: Seq[String], flagMin: Long): DataFrame = {
    require(flagMin >= 1, s"flagMin must be >= 1, got $flagMin")
    import graft.functions.AcCounts.acCounts
    val p = phrases.size
    val names = array(phrases.map(lit): _*)
    corpus
      .select(col(idCol), acCounts(col(textCol), phrases).as("cnts"))
      .select(col(idCol),
        element_at($"cnts", p + 1).as("n_hits"),
        element_at($"cnts", p + 2).as("n_phr"),
        element_at($"cnts", p + 3).as("top_idx"))
      .select(col(idCol), $"n_hits", $"n_phr",
        when($"top_idx" >= 0L,
          element_at(names, ($"top_idx" + 1L).cast("int"))).as("top_phrase"),
        ($"n_hits" >= flagMin).cast("int").as("flagged"))
  }

}
