package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, MinHash /
  * SimHash building blocks. All pure `Column` expressions (codegen'd,
  * no UDFs), each with a DuckDB-expressible equivalent so the driver's
  * oracle can hash-match.
  *
  * Cross-engine determinism: engines share no built-in 64-bit hash, so
  * token hashing uses an explicit character polynomial (`tokenCodeSql`)
  * both Spark and DuckDB evaluate identically.
  */
object Text {

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(c, " ")

  /** Lowercase alphabetic tokens via regex (BPE-ish word pieces). */
  def alphaTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+"), lit(0))

  /** Whitespace-normalized md5 fingerprint (document identity for exact
    * dedup; the rolling-hash analog that is portable across engines). */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(c, "\\s+", " ")))

  /** PII redaction for training corpora: emails, IPv4 addresses,
    * Luhn-valid card numbers ([[PiiExpr.RedactCards]] — the one
    * NON-regex stage, a checksum needs code), formatted phone numbers,
    * and long digit runs replaced by typed placeholders, in that
    * order (cards before phones so a card's digit groups can't
    * half-match the phone shape; bare digit runs can never match the
    * phone pattern — its first separator class is mandatory — so they
    * fall through to <NUM>). Patterns restricted to the Java-regex ∩
    * RE2 common subset so the DuckDB oracle replays them
    * identically. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // Leading-boundary prefix alternation (round-15 ADVICE): a match
  // must not START inside a digit run — the unanchored form turned
  // '999555-123-4567' into '999<PHONE>', leaving the leading digits
  // exposed. RE2 has no lookbehind and \b alone rejects the legal
  // '('/'+' starts (non-word on both sides), so each legal start is
  // its own branch: +cc / \b-anchored cc / '(' / bare \b — every
  // digit start crosses \b, and the branches are tried leftmost-first
  // identically in Java and RE2 (the Bpe.preTokRe precedent).
  val phoneRe =
    "(\\+\\d{1,3}[-. ]\\(?|\\b\\d{1,3}[-. ]\\(?|\\(|\\b)" +
      "\\d{3}\\)?[-. ]\\d{3}[-. ]?\\d{4}\\b"
  val longNumRe = "\\b\\d{7,}\\b"

  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        PiiExpr.redactCards(
          regexp_replace(
            regexp_replace(c, emailRe, "<EMAIL>"),
            ipv4Re, "<IP>")),
        phoneRe, "<PHONE>"),
      longNumRe, "<NUM>")

  /** Punctuation character ratio. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(length(regexp_replace(c, "[^.,!?;:]", "")).cast("double") /
        length(c))

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of whitespace tokens that are stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, w => w.isin(stopwords.map(x => x: Any): _*)))
        .cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: length richness + low punctuation
    * + low stopword density (the classic pre-training quality filter).
    * Rounded with RF.roundBin — stopword/punct ratios are tidy rationals
    * that land exactly on .xxxx5 boundaries, where Spark's round and
    * DuckDB's disagree. */
  def qualityScore(c: Column): Column =
    RF.roundBin(lit(0.4) * least(lit(1.0), size(tokens(c)).cast("double") / 100) +
      lit(0.3) * (lit(1.0) - punctRatio(c)) +
      lit(0.3) * (lit(1.0) - stopwordRatio(c)), 4)

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "que", "los", "por"),
    "fr" -> Seq("le", "les", "des", "est", "une"))

  /** Marker-word language ID (n-gram heuristic): vote per language on
    * stopword hits, argmax with fixed priority, 'unknown' when no hits.
    * Deterministic function of the text — intentionally independent of
    * any labeled `lang` column. */
  def langId(c: Column): Column = {
    val toks = tokens(lower(c))
    val votes = langMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, w => w.isin(ms.map(x => x: Any): _*)))
    }
    val best = greatest(votes.map(_._2): _*)
    votes.foldLeft(when(best === 0, "unknown")) { case (acc, (lang, v)) =>
      acc.when(v === best, lang)
    }.otherwise("unknown")
  }

  /** SQL fragment: deterministic small-range integer code of token `w`
    * (character polynomial; identical syntax evaluates in Spark SQL and
    * DuckDB). Range < 2^22 for ordinary tokens, so (a*code+b) stays
    * well inside INT64. The length term multiplies in BIGINT: ascii()
    * and length() are INT-typed, and 29791·length would overflow INT
    * (an ANSI abort) at ~72k chars — a pathological crawl token (a
    * base64 blob) must yield a CODE, not kill the job, and the codegen
    * twins (MinHashExpr/SimHashExpr) already compute 29791L·len in
    * Long, so the SQL form must match them there. */
  def tokenCodeSql(w: String): String =
    s"(ascii(substr($w,1,1)) + 31*ascii(substr($w,2,1)) + " +
      s"961*ascii(substr($w,3,1)) + 29791*CAST(length($w) AS BIGINT))"

  /** Deterministic MinHash seed pairs (a, b) for hash i. Drawn from a
    * fixed-seed PRNG: affine seeds that are themselves an affine function
    * of i (e.g. a_i = c·i + d) give CORRELATED permutations and wreck the
    * Jaccard estimate — the draws must be well mixed. */
  val minhashPrime = 2147483647L
  def minhashSeeds(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(20260812L)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (minhashPrime - 1) + 1,
      math.abs(rnd.nextLong()) % minhashPrime))
  }

  /** One MinHash value: min over tokens of (a*code(w)+b) mod P. */
  def minhashExpr(textCol: String, a: Long, b: Long): Column =
    expr(s"array_min(transform(split($textCol, ' '), " +
      s"w -> (${a}L * CAST(${tokenCodeSql("w")} AS BIGINT) + ${b}L) % ${minhashPrime}L))")

  /** 16-bit SimHash over whitespace tokens: bit j is set when the
    * majority of tokens have bit j set in their code. Token codes are
    * materialized ONCE into an int array, then the 16 bit-majority
    * votes scan that array — not the strings (16× cheaper). */
  def simhash16Expr(textCol: String): Column = {
    val codes = s"transform(split($textCol, ' '), w -> ${tokenCodeSql("w")})"
    // single pass over the tokens: fold the 16 per-bit counts as an array
    // accumulator, then assemble the signature in the finish lambda
    expr(
      s"""aggregate(
         |  $codes,
         |  array_repeat(0L, 16),
         |  (acc, c) -> zip_with(acc, sequence(0, 15),
         |    (a, j) -> a + (shiftright(c, j) & 1)),
         |  acc -> aggregate(
         |    zip_with(acc, sequence(0, 15),
         |      (a, j) -> IF(2 * a > size(split($textCol, ' ')),
         |        shiftleft(1, j), 0)),
         |    0L, (s, x) -> s + x))""".stripMargin)
  }

  /** DuckDB equivalents of the above, for oracle construction. */
  object duck {
    /** Hash of the word n-gram starting at 1-based list index `i` of
      * token list `w` — replays `functions.NgramHashes` exactly:
      * XOR of position-keyed token-code products. */
    def ngramHashSql(w: String, i: String, n: Int): String =
      (0 until n).map { j =>
        s"(CAST(${tokenCodeSql(s"$w[$i + $j]")} AS BIGINT) * " +
          s"${graft.functions.NgramHashes.keys(j)})"
      }.reduce((a, b) => s"xor($a, $b)")

    def minhashSql(textCol: String, a: Long, b: Long): String =
      s"list_min(list_transform(string_split($textCol, ' '), " +
        s"w -> ($a * ${tokenCodeSql("w")} + $b) % $minhashPrime))"

    def simhash16Sql(textCol: String): String = {
      val toks = s"string_split($textCol, ' ')"
      s"CAST(list_sum(list_transform(range(0, 16), j -> CASE WHEN " +
        s"2 * len(list_filter($toks, w -> ((${tokenCodeSql("w")} >> j) & 1) = 1)) " +
        s"> len($toks) THEN (1 << j) ELSE 0 END)) AS BIGINT)"
    }

    /** 64-bit-space token code (63 active bits): four 16-bit polynomial
      * lanes, multipliers 31/37/41/43, lane 3 held to 15 bits so the
      * packed BIGINT never goes negative (mirrors
      * functions.SimHash64.tokenCode64 exactly). */
    def tokenCode64Sql(w: String): String = {
      val lanes = Seq(31L, 37L, 41L, 43L).zipWithIndex.map { case (m, k) =>
        val mod = if (k == 3) 32768L else 65536L
        s"(((ascii(substr($w,1,1)) + $m*ascii(substr($w,2,1)) + " +
          s"${m * m}*ascii(substr($w,3,1)) + ${m * m * m}*length($w)) % $mod) " +
          s"* ${1L << (16 * k)})"
      }
      lanes.mkString("(", " + ", ")")
    }

    /** 64-bit-space SimHash (63 active bits — bit 63 constantly 0 on
      * both engines; see functions.SimHash64). */
    def simhash64Sql(textCol: String): String = {
      val toks = s"string_split($textCol, ' ')"
      s"CAST(list_sum(list_transform(range(0, 63), j -> CASE WHEN " +
        s"2 * len(list_filter($toks, w -> ((${tokenCode64Sql("w")} >> j) & 1) = 1)) " +
        s"> len($toks) THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT)"
    }
  }
}
