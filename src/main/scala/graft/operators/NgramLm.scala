package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Perplexity-style n-gram language-model quality filter — the CCNet
  * pipeline stage (Wenzek et al. 2020): fit a small LM on an in-domain
  * reference corpus (CCNet uses Wikipedia), score every crawl document
  * by bits-per-token under that model, and keep the low-perplexity
  * (in-domain, fluent) slice. Here the model is a bigram LM with
  * add-one (Laplace) smoothing over a bounded vocabulary:
  *
  *   p(w₂ | w₁) = (c(w₁,w₂) + 1) / (c_prefix(w₁) + V')
  *
  * with `c_prefix(w₁) = Σ_w c(w₁,w)` and V' = |vocab| + 1 (the OOV
  * class — tokens outside the top-V vocabulary map to a single UNK
  * sentinel, the standard open-vocabulary treatment).
  *
  * CROSS-ENGINE DETERMINISM — the whole surprisal chain is integer
  * arithmetic (the t13/t26 convention: a drop decision must never
  * depend on libm rounding):
  *
  *  1. `log`/`exp` are out, so per-bigram surprisal is computed in
  *     1/64-bit steps from the integer odds q = (c_prefix + V') div
  *     (c + 1):  s64 = 64·b + ((q << 6) >> b) − 64  with
  *     b = floor(log₂ q) = length(bin(q)) − 1.  This is floor-log₂
  *     plus the standard mantissa-linear interpolation — monotone in
  *     q, pure integer shifts and string length of the binary repr,
  *     bit-identical in Spark and DuckDB (both have `bin`, `<<`/
  *     `shiftleft`). Note floor(log₂(a/b)) = floor(log₂(a div b))
  *     whenever a ≥ b, which holds here since c ≤ c_prefix.
  *  2. The keep gate is the cross-multiplied rational
  *     s64 · keepDen ≤ keepNum · 64 · n_bigrams  (bits-per-token ≤
  *     keepNum/keepDen) — integer comparison, never a float threshold.
  *  3. The only float column, `bpt` = s64 / (64·n_bigrams), is ONE
  *     correctly-rounded IEEE division of two integers.
  *
  * 100 TB shape: the model is fit on the REFERENCE corpus (small by
  * construction — that is the CCNet design) and applied to the crawl as
  * pure narrow work: per-doc bigram pairs are built array-side before
  * the explode (no positional self-join), the vocabulary map and both
  * model lookups are hash joins that are BROADCAST only under the
  * bounded-vocab gate (the TfIdf/Bpe gate pattern — an uncapped
  * vocabulary shuffle-joins instead of OOMing the driver), and the only
  * shuffle is the per-doc (id, partial-sum) aggregate with map-side
  * combine. Reference capability family: text quality scoring over the
  * documents table (SURVEY §2 text-analysis rows).
  */
object NgramLm {

  /** OOV sentinel — a control char that whitespace tokenization of
    * normal text never yields (documented collision caveat: a corpus
    * that legitimately contains U+0001 tokens would alias with UNK). */
  val Unk = "\u0001"

  /** Same broadcast budget as [[TfIdf.maxBroadcastVocab]]: a top-V cap
    * at or under this licenses broadcasting the vocab and model tables;
    * above it (or uncapped) every model join is a shuffle join. */
  val maxBroadcastVocab: Int = 4 << 20

  /** A fit bigram LM: `vocab` (tok), `bigrams` (m1, m2, cbi) over
    * vocab-mapped tokens, `prefix` (m1, cpre = Σ cbi), V' = |vocab|+1,
    * and whether the bounded size licenses broadcast joins. */
  case class BigramLm(vocab: DataFrame, bigrams: DataFrame,
                      prefix: DataFrame, vPrime: Long, hinted: Boolean) {
    /** Release a `fit(cacheModel = true)` model's cached tables. */
    def unpersist(): Unit = { vocab.unpersist(); bigrams.unpersist() }
  }

  /** Adjacent-token pair array of `textCol` (whitespace-tokenized):
    * array<struct<w1,w2>>, empty for single-token docs. Built
    * array-side so bigram formation never needs a positional join.
    *
    * MEASURED COST NOTE (graft.TimeLm on the 500k-doc replica): the
    * string-struct pair explode is 6.0s where the same corpus's i64
    * gram-hash explode (`NgramHashes`, the t09/t14 convention) is
    * 1.1s — the pair STRINGS are ~4.5s of per-row materialization. If
    * LM scoring ever dominates a pipeline, the next step is hash-space
    * scoring: vocab and model tables keyed by token hashes, pairs as
    * (i64, i64) — same shape, ~4× cheaper scan side, at the price of
    * hash-collision aliasing in the model (standard at crawl scale). */
  private def pairArr(textCol: Column): Column = {
    val ws = split(textCol, " ")
    val m = greatest(size(ws) - 1, lit(0))
    arrays_zip(slice(ws, lit(1), m).as("w1"), slice(ws, lit(2), m).as("w2"))
  }

  /** Map w1/w2 to the bounded vocabulary (OOV → [[Unk]]) via two
    * left joins against `vocab` — broadcast under the gate. Null w1/w2
    * (the explode_outer row of a bigram-less doc) stays null. */
  private def mapToks(pairs: DataFrame, vocab: DataFrame,
                      hinted: Boolean): DataFrame = {
    def side(n: Int) = {
      val v = vocab.select($"tok".as(s"v${n}t"))
      if (hinted) broadcast(v) else v
    }
    pairs
      .join(side(1), pairs("w1") === col("v1t"), "left")
      .join(side(2), pairs("w2") === col("v2t"), "left")
      .withColumn("m1", when($"v1t".isNotNull, $"w1")
        .when($"w1".isNotNull, lit(Unk)))
      .withColumn("m2", when($"v2t".isNotNull, $"w2")
        .when($"w2".isNotNull, lit(Unk)))
      .drop("v1t", "v2t")
  }

  /** Fit the bigram LM on `train` (the in-domain reference corpus).
    * Vocabulary = top-`maxVocab` tokens by (count DESC, tok ASC) — the
    * deterministic cap both engines replay; counts are exact integer
    * aggregates, so the model is bit-reproducible on any layout.
    *
    * `cacheModel` persists the vocab + bigram tables: the score plan
    * references the vocab four times and the bigram table twice, so an
    * uncached model re-runs the train-corpus shuffles per reference —
    * cache (or [[saveModel]]) any model that scores more than once,
    * and `unpersist()` it when done. */
  def fit(train: DataFrame, textCol: String,
          maxVocab: Int = 1 << 16, cacheModel: Boolean = false): BigramLm = {
    require(maxVocab > 0, "maxVocab must be positive (the cap is what " +
      "bounds the model; an unbounded bigram table is not a crawl-safe " +
      "artifact)")
    val uni = train
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
    // top-V folds to TakeOrderedAndProject — no global sort
    val vocab0 = uni.orderBy($"cnt".desc, $"tok".asc).limit(maxVocab)
      .select($"tok")
    val vocab = if (cacheModel) vocab0.persist() else vocab0
    val hinted = maxVocab <= maxBroadcastVocab
    val pairs = train.select(explode(pairArr(col(textCol))).as("pr"))
      .select($"pr.w1".as("w1"), $"pr.w2".as("w2"))
    val bigrams0 = mapToks(pairs, vocab, hinted)
      .groupBy($"m1", $"m2").agg(count(lit(1)).as("cbi"))
    val bigrams = if (cacheModel) bigrams0.persist() else bigrams0
    val prefix = bigrams.groupBy($"m1")
      .agg(sum($"cbi").as("cpre"))
    BigramLm(vocab, bigrams, prefix, vocab.count() + 1L, hinted)
  }

  /** A Kneser-Ney discounted bigram LM (the production smoothing —
    * Kneser & Ney 1995 / Chen & Goodman 1998) derived from a fit
    * [[BigramLm]]'s bigram table: `prefix2` (m1, cpre, n1 = distinct
    * continuations of m1), `cont` (m2, bplus = distinct predecessors
    * of m2), `cTypes` = distinct bigram types.
    *
    * With discount d = ½ and the ADD-ONE-smoothed continuation
    * distribution p_cont(w₂) = (B(w₂)+1)/(C+V'), the model is an
    * EXACTLY proper distribution (Σ_w₂ p = 1 — the discounted mass
    * ½·N₁(w₁)/c₁ is redistributed by p_cont, which itself sums to 1),
    * and every probability is a ratio of integers:
    *
    *   seen prefix:  p = [(2c₁₂−1)⁺·(C+V') + N₁·(B+1)] / [2c₁·(C+V')]
    *   unseen:       p = (B+1)/(C+V')
    *
    * so per-bigram surprisal decomposes TERM-BY-TERM through
    * [[surprisal64]] — s = s64(2c₁) + s64(C+V') − s64(D) with
    * D = (2c₁₂−1)⁺·(C+V') + N₁·(B+1) — never forming the full
    * numerator product (overflow bound: D ≤ 2·c_max·(C+V'), fine below
    * ~10⁹ types × 10⁹ counts; document corpora beyond that shard the
    * model). Bit-identical in DuckDB: integer products, shifts, bin(). */
  case class KnBigramLm(vocab: DataFrame, bigrams: DataFrame,
                        prefix2: DataFrame, cont: DataFrame,
                        cTypes: Long, vPrime: Long, hinted: Boolean,
                        cpreMax: Long)

  /** Derive the KN model from a fit (ideally cached) [[BigramLm]] —
    * three bounded aggregations of the model's own bigram table plus
    * two stats actions; the corpus is not re-read. Fails fast when the
    * model's counts would overflow the integer surprisal chain: every
    * [[scoreKn]] surprisal operand — 2·c₁ (= 2·cpre), C+V', and
    * D = (2c₁₂−1)⁺·(C+V') + N₁·(B+1) — must stay under
    * [[surprisal64]]'s 2^57 shift bound. The tight per-term bound is
    * D ≤ 2·cpre·(C+V') (order-2 properness: the D terms over a prefix
    * sum to exactly that), so the guard uses the RUNTIME operand
    * max(cpre) — a max over per-bigram counts alone is unsound, the
    * prefix sum exceeds it by the branching factor. Breach it →
    * shard the model (fit per corpus shard, score against each,
    * combine) rather than widening the shift. */
  def fitKn(lm: BigramLm): KnBigramLm = {
    val prefix2 = lm.bigrams.groupBy($"m1")
      .agg(sum($"cbi").as("cpre"), count(lit(1)).as("n1"))
    val cont = lm.bigrams.groupBy($"m2")
      .agg(count(lit(1)).as("bplus"))
    // ONE action: bigram type count (= Σ n1) + the runtime operand max
    val stats = prefix2
      .agg(coalesce(sum($"n1"), lit(0L)), coalesce(max($"cpre"), lit(0L)))
      .collect().head
    val (cTypes, cpreMax) = (stats.getLong(0), stats.getLong(1))
    val cv = cTypes + lm.vPrime
    // D ≤ 2·cpre_max·(C+V') by properness; covers 2·cpre and C+V' too
    val dMax = 2 * BigInt(cpreMax).max(1) * BigInt(cv)
    require(dMax <= (BigInt(1) << 57),
      s"KN model counts overflow the integer surprisal chain: " +
        s"2*max(cpre)*(C+V') = 2*$cpreMax*$cv " +
        s"exceeds 2^57 — shard the model (fit per corpus shard and " +
        s"combine scores)")
    KnBigramLm(lm.vocab, lm.bigrams, prefix2, cont,
      cTypes, lm.vPrime, lm.hinted, cpreMax)
  }

  /** Score `corpus` under the KN model — same output shape and keep
    * gate as [[score]]: (idCol, n_tok, n_big, s64, bpt, keep). */
  def scoreKn(corpus: DataFrame, idCol: String, textCol: String,
              m: KnBigramLm, keepNum: Long, keepDen: Long): DataFrame = {
    require(keepDen > 0, "keepDen must be positive")
    val pairs = corpus
      .select(col(idCol), col(textCol),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .select(col(idCol), $"n_tok",
        explode_outer(pairArr(col(textCol))).as("pr"))
      .select(col(idCol), $"n_tok",
        $"pr.w1".as("w1"), $"pr.w2".as("w2"))
    def model(df: DataFrame) = if (m.hinted) broadcast(df) else df
    val joined = mapToks(pairs, m.vocab, m.hinted)
      .join(model(m.bigrams), Seq("m1", "m2"), "left")
      .join(model(m.prefix2), Seq("m1"), "left")
      .join(model(m.cont), Seq("m2"), "left")
    val cv = lit(m.cTypes + m.vPrime)
    val bp1 = coalesce($"bplus", lit(0L)) + lit(1L)
    val d = greatest(lit(2L) * coalesce($"cbi", lit(0L)) - 1L, lit(0L)) *
      cv + $"n1" * bp1
    val s = when($"cpre".isNull, surprisal64(cv) - surprisal64(bp1))
      .otherwise(surprisal64(lit(2L) * $"cpre") + surprisal64(cv) -
        surprisal64(d))
    joined
      .withColumn("s1", when($"w1".isNotNull, s))
      .groupBy(col(idCol), $"n_tok")
      .agg(count($"w1").as("n_big"),
        coalesce(sum($"s1"), lit(0L)).as("s64"))
      .select(col(idCol), $"n_tok", $"n_big", $"s64",
        when($"n_big" > 0L,
          $"s64".cast("double") / ($"n_big" * 64L).cast("double"))
          .as("bpt"),
        when($"n_big" > 0L &&
          $"s64" * lit(keepDen) <= lit(keepNum) * lit(64L) * $"n_big",
          1L).otherwise(0L).as("keep"))
  }

  /** Adjacent-token TRIPLE array of `textCol` — [[pairArr]] one order
    * up: array<struct<w1,w2,w3>>, empty for docs under 3 tokens. */
  private def tripleArr(textCol: Column): Column = {
    val ws = split(textCol, " ")
    val m = greatest(size(ws) - 2, lit(0))
    arrays_zip(slice(ws, lit(1), m).as("w1"),
      slice(ws, lit(2), m).as("w2"), slice(ws, lit(3), m).as("w3"))
  }

  /** Vocab-map three token sides (OOV → [[Unk]]) — [[mapToks]] at
    * order 3. */
  private def mapToks3(tris: DataFrame, vocab: DataFrame,
                       hinted: Boolean): DataFrame = {
    def side(n: Int) = {
      val v = vocab.select($"tok".as(s"v${n}t"))
      if (hinted) broadcast(v) else v
    }
    tris
      .join(side(1), tris("w1") === col("v1t"), "left")
      .join(side(2), tris("w2") === col("v2t"), "left")
      .join(side(3), tris("w3") === col("v3t"), "left")
      .withColumn("m1", when($"v1t".isNotNull, $"w1")
        .when($"w1".isNotNull, lit(Unk)))
      .withColumn("m2", when($"v2t".isNotNull, $"w2")
        .when($"w2".isNotNull, lit(Unk)))
      .withColumn("m3", when($"v3t".isNotNull, $"w3")
        .when($"w3".isNotNull, lit(Unk)))
      .drop("v1t", "v2t", "v3t")
  }

  /** An interpolated Kneser-Ney TRIGRAM LM (production CCNet filters
    * run 5-gram KenLM; this extends the integer chain one order):
    * d = ½ at the trigram level interpolating into the full bigram-KN
    * distribution [[KnBigramLm]] (which itself interpolates into the
    * add-one continuation distribution):
    *
    *   p₃(w₃|w₁w₂) = [max(2c₁₂₃−1, 0)·Q₂ + N₁₂·P₂] / [2c₁₂·Q₂]
    *
    * with p_KN2(w₃|w₂) = P₂/Q₂ the bigram-KN integer ratio (seen
    * prefix: P₂ = (2c₂₃−1)⁺·(C+V') + N₁(w₂)·(B(w₃)+1), Q₂ =
    * 2c₂(C+V'); unseen: P₂ = B(w₃)+1, Q₂ = C+V') and c₁₂ = Σ_w c₁₂w
    * the trigram-token prefix count, N₁₂ its continuation-type count.
    * EXACTLY proper: Σ_w₃ max(2c₁₂₃−1,0) = 2c₁₂ − N₁₂ and
    * Σ_w₃ P₂ = Q₂ (bigram-KN properness), so the numerators sum to
    * 2c₁₂·Q₂ (NgramLmSpec proves it in exact integers). A trigram
    * context never seen in training backs off to p_KN2 wholesale.
    * Surprisal decomposes term-by-term through [[surprisal64]]:
    * s = s64(2c₁₂) + s64(Q₂) − s64(D₃), D₃ = (2c₁₂₃−1)⁺·Q₂ + N₁₂·P₂ —
    * all operands guarded under the 2^57 shift bound at fit. */
  case class KnTrigramLm(kn: KnBigramLm, trigrams: DataFrame,
                         prefix12: DataFrame, c12max: Long) {
    /** Release a `fitKn3(cacheModel = true)` model's cached trigram
      * table (the bigram tables belong to the underlying [[BigramLm]]). */
    def unpersist(): Unit = { trigrams.unpersist() }
  }

  /** Fit the trigram-KN model: derive the bigram-KN base from `lm`
    * (no corpus re-read), then ONE more corpus pass for the
    * vocab-mapped trigram counts. Fails fast when the composite
    * surprisal operands would breach the 2^57 bound (checked in
    * arbitrary precision — the check itself cannot overflow). */
  def fitKn3(train: DataFrame, textCol: String, lm: BigramLm,
             cacheModel: Boolean = false): KnTrigramLm = {
    val kn = fitKn(lm)
    val tris = train.select(explode(tripleArr(col(textCol))).as("tr"))
      .select($"tr.w1".as("w1"), $"tr.w2".as("w2"), $"tr.w3".as("w3"))
    val trigrams0 = mapToks3(tris, lm.vocab, lm.hinted)
      .groupBy($"m1", $"m2", $"m3").agg(count(lit(1)).as("c123"))
    val trigrams = if (cacheModel) trigrams0.persist() else trigrams0
    val prefix12 = trigrams.groupBy($"m1", $"m2")
      .agg(sum($"c123").as("c12"), count(lit(1)).as("n12"))
    // Tight RUNTIME-operand bound (not per-gram maxima — prefix sums
    // exceed those by the branching factor): Q₂ ≤ 2·max(cpre)·cv,
    // P₂ ≤ Q₂ and D₃ ≤ 2·c₁₂·Q₂ (both by properness), so
    // D₃ ≤ 2·max(c12)·Q₂max dominates every surprisal operand
    // (2·c12, Q₂, D₃) in [[scoreKn3]]. max(cpre) rides on the fit KN2
    // model; ONE new action here (max over the bounded prefix table).
    val c12max = prefix12
      .agg(coalesce(max($"c12"), lit(0L))).collect().head.getLong(0)
    val cv = BigInt(kn.cTypes + kn.vPrime)
    val q2max = 2 * BigInt(kn.cpreMax).max(1) * cv
    val d3max = 2 * BigInt(c12max).max(1) * q2max
    require(d3max <= (BigInt(1) << 57),
      s"trigram-KN counts overflow the integer surprisal chain " +
        s"(worst-case D3 bound $d3max exceeds 2^57) — shard the model " +
        s"(fit per corpus shard and combine scores)")
    KnTrigramLm(kn, trigrams, prefix12, c12max)
  }

  /** Score `corpus` under the trigram-KN model: per document
    * (idCol, n_tok, n_tri, s64, bpt, keep) — the [[score]] shape with
    * trigram events (n_tri = max(n_tok−2, 0); docs under 3 tokens
    * survive with n_tri 0, bpt NULL, keep 0). */
  def scoreKn3(corpus: DataFrame, idCol: String, textCol: String,
               m: KnTrigramLm, keepNum: Long, keepDen: Long): DataFrame = {
    require(keepDen > 0, "keepDen must be positive")
    val tris = corpus
      .select(col(idCol), col(textCol),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .select(col(idCol), $"n_tok",
        explode_outer(tripleArr(col(textCol))).as("tr"))
      .select(col(idCol), $"n_tok",
        $"tr.w1".as("w1"), $"tr.w2".as("w2"), $"tr.w3".as("w3"))
    def model(df: DataFrame) = if (m.kn.hinted) broadcast(df) else df
    // the backoff bigram is (w2, w3) — alias the bigram-level tables
    // to fresh names so the trigram keys m1/m2/m3 stay unambiguous
    val bi2 = m.kn.bigrams.select($"m1".as("b1"), $"m2".as("b2"), $"cbi")
    val pre2 = m.kn.prefix2.select($"m1".as("p1"), $"cpre", $"n1")
    val cont2 = m.kn.cont.select($"m2".as("c2"), $"bplus")
    val joined = mapToks3(tris, m.kn.vocab, m.kn.hinted)
      .join(model(m.trigrams), Seq("m1", "m2", "m3"), "left")
      .join(model(m.prefix12), Seq("m1", "m2"), "left")
      .join(model(bi2), $"m2" === $"b1" && $"m3" === $"b2", "left")
      .join(model(pre2), $"m2" === $"p1", "left")
      .join(model(cont2), $"m3" === $"c2", "left")
    val cv = lit(m.kn.cTypes + m.kn.vPrime)
    val bp1 = coalesce($"bplus", lit(0L)) + lit(1L)
    // the bigram-KN backoff ratio P2/Q2 (integer numerator/denominator)
    val q2 = when($"cpre".isNull, cv)
      .otherwise(lit(2L) * $"cpre" * cv)
    val p2 = when($"cpre".isNull, bp1)
      .otherwise(
        greatest(lit(2L) * coalesce($"cbi", lit(0L)) - 1L, lit(0L)) * cv +
          $"n1" * bp1)
    val d3 =
      greatest(lit(2L) * coalesce($"c123", lit(0L)) - 1L, lit(0L)) * q2 +
        $"n12" * p2
    val s = when($"c12".isNull, surprisal64(q2) - surprisal64(p2))
      .otherwise(surprisal64(lit(2L) * $"c12") + surprisal64(q2) -
        surprisal64(d3))
    joined
      .withColumn("s1", when($"w1".isNotNull, s))
      .groupBy(col(idCol), $"n_tok")
      .agg(count($"w1").as("n_tri"),
        coalesce(sum($"s1"), lit(0L)).as("s64"))
      .select(col(idCol), $"n_tok", $"n_tri", $"s64",
        when($"n_tri" > 0L,
          $"s64".cast("double") / ($"n_tri" * 64L).cast("double"))
          .as("bpt"),
        when($"n_tri" > 0L &&
          $"s64" * lit(keepDen) <= lit(keepNum) * lit(64L) * $"n_tri",
          1L).otherwise(0L).as("keep"))
  }

  /** Adjacent-token QUADRUPLE array — [[tripleArr]] one order up. */
  private def quadArr(textCol: Column): Column = {
    val ws = split(textCol, " ")
    val m = greatest(size(ws) - 3, lit(0))
    arrays_zip(slice(ws, lit(1), m).as("w1"), slice(ws, lit(2), m).as("w2"),
      slice(ws, lit(3), m).as("w3"), slice(ws, lit(4), m).as("w4"))
  }

  /** Vocab-map four token sides (OOV → [[Unk]]) — [[mapToks3]] at
    * order 4. */
  private def mapToks4(quads: DataFrame, vocab: DataFrame,
                       hinted: Boolean): DataFrame = {
    def side(n: Int) = {
      val v = vocab.select($"tok".as(s"v${n}t"))
      if (hinted) broadcast(v) else v
    }
    (1 to 4).foldLeft(quads) { (df, n) =>
      df.join(side(n), quads(s"w$n") === col(s"v${n}t"), "left")
    }
      .withColumn("m1", when($"v1t".isNotNull, $"w1")
        .when($"w1".isNotNull, lit(Unk)))
      .withColumn("m2", when($"v2t".isNotNull, $"w2")
        .when($"w2".isNotNull, lit(Unk)))
      .withColumn("m3", when($"v3t".isNotNull, $"w3")
        .when($"w3".isNotNull, lit(Unk)))
      .withColumn("m4", when($"v4t".isNotNull, $"w4")
        .when($"w4".isNotNull, lit(Unk)))
      .drop("v1t", "v2t", "v3t", "v4t")
  }

  /** An interpolated Kneser-Ney 4-GRAM LM — [[KnTrigramLm]]'s recursion
    * one order up (production CCNet runs 5-gram KenLM; each added order
    * is the SAME integer step, so this is the order-n template):
    *
    *   p₄(w₄|w₁w₂w₃) = [(2c₁₂₃₄−1)⁺·Q₃ + N₁₂₃·P₃] / [2c₁₂₃·Q₃]
    *
    * with P₃/Q₃ the trigram-KN integer ratio over context (w₂,w₃)
    * (seen: P₃ = (2c₂₃₄−1)⁺·Q₂ + N₂₃·P₂, Q₃ = 2c₂₃·Q₂; unseen trigram
    * context backs off to P₂/Q₂ wholesale — the [[scoreKn3]] rule one
    * level down), and an unseen 4-gram context (w₁w₂w₃) backs off to
    * P₃/Q₃ wholesale. EXACTLY proper at order 4:
    * Σ_w₄ (2c₁₂₃₄−1)⁺ = 2c₁₂₃ − N₁₂₃ and Σ_w₄ P₃ = Q₃ (order-3
    * properness), so numerators sum to 2c₁₂₃·Q₃ (NgramLmSpec proves it
    * in exact integers). Surprisal stays term-by-term:
    * s = s64(2c₁₂₃) + s64(Q₃) − s64(D₄),
    * D₄ = (2c₁₂₃₄−1)⁺·Q₃ + N₁₂₃·P₃ — operands guarded under the 2^57
    * shift bound at fit (BigInt, cannot itself overflow). */
  case class KnQuadLm(kn3: KnTrigramLm, quads: DataFrame,
                      prefix123: DataFrame, c123pMax: Long) {
    def unpersist(): Unit = { quads.unpersist(); kn3.unpersist() }
  }

  /** Fit the 4-gram-KN model: derive the trigram-KN base from `lm`,
    * then ONE more corpus pass for the vocab-mapped 4-gram counts. */
  def fitKn4(train: DataFrame, textCol: String, lm: BigramLm,
             cacheModel: Boolean = false): KnQuadLm = {
    val kn3 = fitKn3(train, textCol, lm, cacheModel)
    val qs = train.select(explode(quadArr(col(textCol))).as("qd"))
      .select($"qd.w1".as("w1"), $"qd.w2".as("w2"), $"qd.w3".as("w3"),
        $"qd.w4".as("w4"))
    val quads0 = mapToks4(qs, lm.vocab, lm.hinted)
      .groupBy($"m1", $"m2", $"m3", $"m4").agg(count(lit(1)).as("c1234"))
    val quads = if (cacheModel) quads0.persist() else quads0
    val prefix123 = quads.groupBy($"m1", $"m2", $"m3")
      .agg(sum($"c1234").as("c123p"), count(lit(1)).as("n123"))
    // Tight RUNTIME-operand bound (the fitKn3 rule one order up):
    // Q₂ ≤ 2·max(cpre)·cv, Q₃ ≤ 2·max(c12)·Q₂max, and by order-4
    // properness D₄ ≤ 2·c₁₂₃·Q₃ ≤ 2·max(c123p)·Q₃max — dominating
    // every [[scoreKn4]] surprisal operand (2·c123p, Q₃, D₄).
    // max(cpre)/max(c12) ride on the fit lower-order models; ONE new
    // action here (max over the bounded prefix table).
    val c123pMax = prefix123
      .agg(coalesce(max($"c123p"), lit(0L))).collect().head.getLong(0)
    val cv = BigInt(kn3.kn.cTypes + kn3.kn.vPrime)
    val q2max = 2 * BigInt(kn3.kn.cpreMax).max(1) * cv
    val q3max = 2 * BigInt(kn3.c12max).max(1) * q2max
    val d4max = 2 * BigInt(c123pMax).max(1) * q3max
    require(d4max <= (BigInt(1) << 57),
      s"4-gram-KN counts overflow the integer surprisal chain " +
        s"(worst-case D4 bound $d4max exceeds 2^57) — shard the model " +
        s"(fit per corpus shard and combine scores)")
    KnQuadLm(kn3, quads, prefix123, c123pMax)
  }

  /** Score `corpus` under the 4-gram-KN model: per document
    * (idCol, n_tok, n_quad, s64, bpt, keep); n_quad = max(n_tok−3, 0). */
  def scoreKn4(corpus: DataFrame, idCol: String, textCol: String,
               m: KnQuadLm, keepNum: Long, keepDen: Long): DataFrame = {
    require(keepDen > 0, "keepDen must be positive")
    val quads = corpus
      .select(col(idCol), col(textCol),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .select(col(idCol), $"n_tok",
        explode_outer(quadArr(col(textCol))).as("qd"))
      .select(col(idCol), $"n_tok", $"qd.w1".as("w1"), $"qd.w2".as("w2"),
        $"qd.w3".as("w3"), $"qd.w4".as("w4"))
    def model(df: DataFrame) = if (m.kn3.kn.hinted) broadcast(df) else df
    // levels alias to fresh names so m1..m4 stay unambiguous:
    // trigram backoff keys (w2,w3,w4); bigram backoff (w3,w4)
    val tri3 = m.kn3.trigrams.select($"m1".as("t1"), $"m2".as("t2"),
      $"m3".as("t3"), $"c123")
    val pre23 = m.kn3.prefix12.select($"m1".as("r1"), $"m2".as("r2"),
      $"c12", $"n12")
    val bi2 = m.kn3.kn.bigrams.select($"m1".as("b1"), $"m2".as("b2"), $"cbi")
    val pre2 = m.kn3.kn.prefix2.select($"m1".as("p1"), $"cpre", $"n1")
    val cont2 = m.kn3.kn.cont.select($"m2".as("c2"), $"bplus")
    val joined = mapToks4(quads, m.kn3.kn.vocab, m.kn3.kn.hinted)
      .join(model(m.quads), Seq("m1", "m2", "m3", "m4"), "left")
      .join(model(m.prefix123), Seq("m1", "m2", "m3"), "left")
      .join(model(tri3), $"m2" === $"t1" && $"m3" === $"t2" &&
        $"m4" === $"t3", "left")
      .join(model(pre23), $"m2" === $"r1" && $"m3" === $"r2", "left")
      .join(model(bi2), $"m3" === $"b1" && $"m4" === $"b2", "left")
      .join(model(pre2), $"m3" === $"p1", "left")
      .join(model(cont2), $"m4" === $"c2", "left")
    val cv = lit(m.kn3.kn.cTypes + m.kn3.kn.vPrime)
    val bp1 = coalesce($"bplus", lit(0L)) + lit(1L)
    val q2 = when($"cpre".isNull, cv).otherwise(lit(2L) * $"cpre" * cv)
    val p2 = when($"cpre".isNull, bp1)
      .otherwise(
        greatest(lit(2L) * coalesce($"cbi", lit(0L)) - 1L, lit(0L)) * cv +
          $"n1" * bp1)
    val q3 = when($"c12".isNull, q2).otherwise(lit(2L) * $"c12" * q2)
    val p3 = when($"c12".isNull, p2)
      .otherwise(
        greatest(lit(2L) * coalesce($"c123", lit(0L)) - 1L, lit(0L)) * q2 +
          $"n12" * p2)
    val d4 =
      greatest(lit(2L) * coalesce($"c1234", lit(0L)) - 1L, lit(0L)) * q3 +
        $"n123" * p3
    val s = when($"c123p".isNull, surprisal64(q3) - surprisal64(p3))
      .otherwise(surprisal64(lit(2L) * $"c123p") + surprisal64(q3) -
        surprisal64(d4))
    joined
      .withColumn("s1", when($"w1".isNotNull, s))
      .groupBy(col(idCol), $"n_tok")
      .agg(count($"w1").as("n_quad"),
        coalesce(sum($"s1"), lit(0L)).as("s64"))
      .select(col(idCol), $"n_tok", $"n_quad", $"s64",
        when($"n_quad" > 0L,
          $"s64".cast("double") / ($"n_quad" * 64L).cast("double"))
          .as("bpt"),
        when($"n_quad" > 0L &&
          $"s64" * lit(keepDen) <= lit(keepNum) * lit(64L) * $"n_quad",
          1L).otherwise(0L).as("keep"))
  }

  /** Adjacent-token QUINTUPLE array — [[quadArr]] one order up. */
  private def quintArr(textCol: Column): Column = {
    val ws = split(textCol, " ")
    val m = greatest(size(ws) - 4, lit(0))
    arrays_zip(slice(ws, lit(1), m).as("w1"), slice(ws, lit(2), m).as("w2"),
      slice(ws, lit(3), m).as("w3"), slice(ws, lit(4), m).as("w4"),
      slice(ws, lit(5), m).as("w5"))
  }

  /** Vocab-map five token sides (OOV → [[Unk]]) — [[mapToks4]] at
    * order 5. */
  private def mapToks5(quints: DataFrame, vocab: DataFrame,
                       hinted: Boolean): DataFrame = {
    def side(n: Int) = {
      val v = vocab.select($"tok".as(s"v${n}t"))
      if (hinted) broadcast(v) else v
    }
    val joined = (1 to 5).foldLeft(quints) { (df, n) =>
      df.join(side(n), quints(s"w$n") === col(s"v${n}t"), "left")
    }
    (1 to 5).foldLeft(joined) { (df, n) =>
      df.withColumn(s"m$n", when(col(s"v${n}t").isNotNull, col(s"w$n"))
        .when(col(s"w$n").isNotNull, lit(Unk)))
    }.drop((1 to 5).map(n => s"v${n}t"): _*)
  }

  /** An interpolated Kneser-Ney 5-GRAM LM — [[KnQuadLm]]'s recursion
    * one order up, KenLM's DEFAULT order (the production CCNet
    * perplexity model):
    *
    *   p₅(w₅|w₁..w₄) = [(2c₁₂₃₄₅−1)⁺·Q₄ + N₁₂₃₄·P₄] / [2c₁₂₃₄·Q₄]
    *
    * with P₄/Q₄ the 4-gram-KN integer ratio over context (w₂,w₃,w₄)
    * and wholesale backoff on an unseen 5-gram context — the SAME
    * integer step as every lower order, EXACTLY proper at order 5
    * (Σ_w₅ numerators = 2c₁₂₃₄·Q₄; NgramLmSpec proves it in exact
    * arithmetic). Surprisal stays term-by-term:
    * s = s64(2c₁₂₃₄) + s64(Q₄) − s64(D₅), operands guarded under the
    * 2^57 shift bound at fit with the tight runtime-operand chain. */
  case class KnPentaLm(kn4: KnQuadLm, quints: DataFrame,
                       prefix1234: DataFrame) {
    def unpersist(): Unit = { quints.unpersist(); kn4.unpersist() }
  }

  /** Fit the 5-gram-KN model: derive the 4-gram-KN base from `lm`,
    * then ONE more corpus pass for the vocab-mapped 5-gram counts. */
  def fitKn5(train: DataFrame, textCol: String, lm: BigramLm,
             cacheModel: Boolean = false): KnPentaLm = {
    val kn4 = fitKn4(train, textCol, lm, cacheModel)
    val qs = train.select(explode(quintArr(col(textCol))).as("qt"))
      .select($"qt.w1".as("w1"), $"qt.w2".as("w2"), $"qt.w3".as("w3"),
        $"qt.w4".as("w4"), $"qt.w5".as("w5"))
    val quints0 = mapToks5(qs, lm.vocab, lm.hinted)
      .groupBy($"m1", $"m2", $"m3", $"m4", $"m5")
      .agg(count(lit(1)).as("c12345"))
    val quints = if (cacheModel) quints0.persist() else quints0
    val prefix1234 = quints.groupBy($"m1", $"m2", $"m3", $"m4")
      .agg(sum($"c12345").as("c1234p"), count(lit(1)).as("n1234"))
    // the fitKn4 runtime-operand chain one order up: Q₄ ≤
    // 2·max(c123p)·Q₃max, D₅ ≤ 2·max(c1234p)·Q₄max (properness)
    val c1234pMax = prefix1234
      .agg(coalesce(max($"c1234p"), lit(0L))).collect().head.getLong(0)
    val cv = BigInt(kn4.kn3.kn.cTypes + kn4.kn3.kn.vPrime)
    val q2max = 2 * BigInt(kn4.kn3.kn.cpreMax).max(1) * cv
    val q3max = 2 * BigInt(kn4.kn3.c12max).max(1) * q2max
    val q4max = 2 * BigInt(kn4.c123pMax).max(1) * q3max
    val d5max = 2 * BigInt(c1234pMax).max(1) * q4max
    require(d5max <= (BigInt(1) << 57),
      s"5-gram-KN counts overflow the integer surprisal chain " +
        s"(worst-case D5 bound $d5max exceeds 2^57) — shard the model " +
        s"(fit per corpus shard and combine scores)")
    KnPentaLm(kn4, quints, prefix1234)
  }

  /** Score `corpus` under the 5-gram-KN model: per document
    * (idCol, n_tok, n_quint, s64, bpt, keep);
    * n_quint = max(n_tok−4, 0). */
  def scoreKn5(corpus: DataFrame, idCol: String, textCol: String,
               m: KnPentaLm, keepNum: Long, keepDen: Long): DataFrame = {
    require(keepDen > 0, "keepDen must be positive")
    val quints = corpus
      .select(col(idCol), col(textCol),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .select(col(idCol), $"n_tok",
        explode_outer(quintArr(col(textCol))).as("qt"))
      .select(col(idCol), $"n_tok", $"qt.w1".as("w1"), $"qt.w2".as("w2"),
        $"qt.w3".as("w3"), $"qt.w4".as("w4"), $"qt.w5".as("w5"))
    val kn3 = m.kn4.kn3
    def model(df: DataFrame) = if (kn3.kn.hinted) broadcast(df) else df
    // every lower-order table aliases to fresh names; backoff keys
    // shift one right per level (quad level keys (w2..w5), trigram
    // (w3,w4,w5), bigram (w4,w5))
    val qua4 = m.kn4.quads.select($"m1".as("a1"), $"m2".as("a2"),
      $"m3".as("a3"), $"m4".as("a4"), $"c1234")
    val pre234 = m.kn4.prefix123.select($"m1".as("z1"), $"m2".as("z2"),
      $"m3".as("z3"), $"c123p", $"n123")
    val tri3 = kn3.trigrams.select($"m1".as("t1"), $"m2".as("t2"),
      $"m3".as("t3"), $"c123")
    val pre23 = kn3.prefix12.select($"m1".as("r1"), $"m2".as("r2"),
      $"c12", $"n12")
    val bi2 = kn3.kn.bigrams.select($"m1".as("b1"), $"m2".as("b2"), $"cbi")
    val pre2 = kn3.kn.prefix2.select($"m1".as("p1"), $"cpre", $"n1")
    val cont2 = kn3.kn.cont.select($"m2".as("c2"), $"bplus")
    val joined = mapToks5(quints, kn3.kn.vocab, kn3.kn.hinted)
      .join(model(m.quints), Seq("m1", "m2", "m3", "m4", "m5"), "left")
      .join(model(m.prefix1234), Seq("m1", "m2", "m3", "m4"), "left")
      .join(model(qua4), $"m2" === $"a1" && $"m3" === $"a2" &&
        $"m4" === $"a3" && $"m5" === $"a4", "left")
      .join(model(pre234), $"m2" === $"z1" && $"m3" === $"z2" &&
        $"m4" === $"z3", "left")
      .join(model(tri3), $"m3" === $"t1" && $"m4" === $"t2" &&
        $"m5" === $"t3", "left")
      .join(model(pre23), $"m3" === $"r1" && $"m4" === $"r2", "left")
      .join(model(bi2), $"m4" === $"b1" && $"m5" === $"b2", "left")
      .join(model(pre2), $"m4" === $"p1", "left")
      .join(model(cont2), $"m5" === $"c2", "left")
    val cv = lit(kn3.kn.cTypes + kn3.kn.vPrime)
    val bp1 = coalesce($"bplus", lit(0L)) + lit(1L)
    val q2 = when($"cpre".isNull, cv).otherwise(lit(2L) * $"cpre" * cv)
    val p2 = when($"cpre".isNull, bp1)
      .otherwise(
        greatest(lit(2L) * coalesce($"cbi", lit(0L)) - 1L, lit(0L)) * cv +
          $"n1" * bp1)
    val q3 = when($"c12".isNull, q2).otherwise(lit(2L) * $"c12" * q2)
    val p3 = when($"c12".isNull, p2)
      .otherwise(
        greatest(lit(2L) * coalesce($"c123", lit(0L)) - 1L, lit(0L)) * q2 +
          $"n12" * p2)
    val q4 = when($"c123p".isNull, q3).otherwise(lit(2L) * $"c123p" * q3)
    val p4 = when($"c123p".isNull, p3)
      .otherwise(
        greatest(lit(2L) * coalesce($"c1234", lit(0L)) - 1L, lit(0L)) * q3 +
          $"n123" * p3)
    val d5 =
      greatest(lit(2L) * coalesce($"c12345", lit(0L)) - 1L, lit(0L)) * q4 +
        $"n1234" * p4
    val s = when($"c1234p".isNull, surprisal64(q4) - surprisal64(p4))
      .otherwise(surprisal64(lit(2L) * $"c1234p") + surprisal64(q4) -
        surprisal64(d5))
    joined
      .withColumn("s1", when($"w1".isNotNull, s))
      .groupBy(col(idCol), $"n_tok")
      .agg(count($"w1").as("n_quint"),
        coalesce(sum($"s1"), lit(0L)).as("s64"))
      .select(col(idCol), $"n_tok", $"n_quint", $"s64",
        when($"n_quint" > 0L,
          $"s64".cast("double") / ($"n_quint" * 64L).cast("double"))
          .as("bpt"),
        when($"n_quint" > 0L &&
          $"s64" * lit(keepDen) <= lit(keepNum) * lit(64L) * $"n_quint",
          1L).otherwise(0L).as("keep"))
  }

  /** Persist a fit model: vocab/bigrams/prefix as parquet plus a
    * one-row meta table — the production split (the IVFADC-index
    * precedent): fit ONCE on the reference corpus, score any number of
    * corpora / stream micro-batches from the stored artifact without
    * re-running the fit chain. */
  def saveModel(lm: BigramLm, path: String): Unit = {
    val spark = lm.vocab.sparkSession
    import spark.implicits._
    lm.vocab.write.mode("overwrite").parquet(s"$path/vocab")
    lm.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    lm.prefix.write.mode("overwrite").parquet(s"$path/prefix")
    Seq((lm.vPrime, lm.hinted)).toDF("vprime", "hinted")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a persisted model (columns by NAME; fails fast on a bad
    * path). Scoring from a loaded model plans exactly like the
    * in-memory one — the broadcast gate state was stored at fit. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): BigramLm = {
    Seq("vocab", "bigrams", "prefix", "meta").foreach { part =>
      require(Similarity.fsDirExists(spark, s"$path/$part"),
        s"no LM model at $path (missing $path/$part — " +
          "saveModel one first)")
    }
    val meta = spark.read.parquet(s"$path/meta")
      .select(col("vprime"), col("hinted")).collect().head
    BigramLm(
      spark.read.parquet(s"$path/vocab").select($"tok"),
      spark.read.parquet(s"$path/bigrams").select($"m1", $"m2", $"cbi"),
      spark.read.parquet(s"$path/prefix").select($"m1", $"cpre"),
      meta.getLong(0), meta.getBoolean(1))
  }

  /** Integer 1/64-bit surprisal of the odds column `q` (≥ 1):
    * 64·floor(log₂ q) + mantissa interpolation. Exact integer shifts;
    * `bin` is the cross-engine floor-log₂.
    *
    * DOMAIN BOUND: `shiftleft(q, 6)` silently wraps for q ≥ 2^57, so
    * the result is wrong (still deterministic, still matched by the
    * DuckDB replay of the same shifts) past that. Callers must keep
    * q < 2^57: the add-one odds q = (cpre+V') div (cbi+1) would need a
    * prefix token with ~1.4·10^17 occurrences, and the KN/DSIR paths
    * guard their composite operands at fit ([[fitKn]]'s `require`).
    * Shard the model before the bound, don't widen the shift. */
  def surprisal64(q: Column): Column = {
    val b = (length(bin(q)) - 1).cast("long")
    // functions.shiftright only takes a literal shift — call the SQL
    // function directly for the column-valued shift amount
    lit(64L) * b +
      call_function("shiftright", shiftleft(q, 6), b.cast("int")) - lit(64L)
  }

  /** Driver-side scalar twin of [[surprisal64]] — THE one Scala home
    * of the bit-level formula (Dsir's K64 constant uses it; a spec
    * pins it equal to the Column form so the copies cannot drift).
    * Same q < 2^57 domain bound. */
  def surprisal64Long(q: Long): Long = {
    require(q >= 1, s"surprisal64 needs q >= 1, got $q")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(q)
    64L * b + ((q << 6) >> b) - 64L
  }

  /** Score `corpus` under the fit model: per document
    * (idCol, n_tok, n_big, s64, bpt, keep) where s64 = Σ surprisal64
    * over the doc's bigrams, bpt = s64/(64·n_big) bits-per-token, and
    * keep = 1 iff n_big > 0 and bpt ≤ keepNum/keepDen (integer
    * cross-multiplied gate). Docs with < 2 tokens survive with
    * n_big = 0, bpt NULL, keep 0. */
  def score(corpus: DataFrame, idCol: String, textCol: String,
            lm: BigramLm, keepNum: Long, keepDen: Long): DataFrame = {
    require(keepDen > 0, "keepDen must be positive")
    // n_tok is materialized BELOW the explode: computed in the same
    // select, Catalyst plans the Project above the Generate and
    // re-splits the full text once per exploded bigram row — O(len²)
    // per doc (measured 5× the whole scoring cost at sf0.1)
    val pairs = corpus
      .select(col(idCol), col(textCol),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .select(col(idCol), $"n_tok",
        explode_outer(pairArr(col(textCol))).as("pr"))
      .select(col(idCol), $"n_tok",
        $"pr.w1".as("w1"), $"pr.w2".as("w2"))
    def model(df: DataFrame) = if (lm.hinted) broadcast(df) else df
    val joined = mapToks(pairs, lm.vocab, lm.hinted)
      .join(model(lm.bigrams), Seq("m1", "m2"), "left")
      .join(model(lm.prefix), Seq("m1"), "left")
    // integer odds q = (c_prefix + V') div (c + 1); floor() on the
    // double quotient is exact here (both operands far below 2^53)
    val q = graft.functions.RF.euclidDiv(
      coalesce($"cpre", lit(0L)) + lit(lm.vPrime),
      coalesce($"cbi", lit(0L)) + lit(1L))
    joined
      .withColumn("s1", when($"w1".isNotNull, surprisal64(q)))
      .groupBy(col(idCol), $"n_tok")
      .agg(count($"w1").as("n_big"),
        coalesce(sum($"s1"), lit(0L)).as("s64"))
      .select(col(idCol), $"n_tok", $"n_big", $"s64",
        when($"n_big" > 0L,
          $"s64".cast("double") / ($"n_big" * 64L).cast("double"))
          .as("bpt"),
        when($"n_big" > 0L &&
          $"s64" * lit(keepDen) <= lit(keepNum) * lit(64L) * $"n_big",
          1L).otherwise(0L).as("keep"))
  }

  // ------------------------------------------------------- hash space
  // The crawl-scale variant of the t33 chain: token identity is the
  // BOUNDED integer code tokenCode mod 2^22 instead of the string, so
  // (a) an adjacent pair packs INJECTIVELY into one i64 key
  // (m1 << 23 | m2 < 2^46) and (b) the whole model — vocab set, bigram
  // and prefix counts — collapses into executor-side open-addressing
  // maps probed by ONE codegen pass per document (functions.LmScore64):
  // no pair explode, no model joins, no per-doc shuffle. Measured at
  // the 100× probe: the string chain is 8.9s, the struct-pair explode
  // alone 2.4s, the folded pass ~2s end-to-end. The price is
  // deterministic ALIASING (tokenCode keys on the first 3 code points
  // + length, then mod 2^22 — "apple"/"apply" share a model row;
  // standard for hashed-feature models, cf. DSIR's buckets) and a
  // vocab-cap tie-break on (cnt DESC, code ASC). Both engines replay
  // the identical chain, so results hash-match; on a collision-free
  // corpus with an untruncated cap the scores equal the exact path
  // bit-for-bit (NgramLmSpec pins it). Above the map-collection gate
  // (a reference corpus with > maxFoldEntries bigram types) scoring
  // falls back to exploded pair keys + gated broadcast joins — same
  // arithmetic, spec-pinned equal.
  import graft.functions.{LmFoldModel, LmScore64, LongLongMap}

  /** OOV sentinel in code space: one past the 22-bit code range. */
  val UnkCode: Long = LmScore64.Unk

  /** Bigram-type rows at or under this collect into the executor-side
    * fold maps (~2×16 bytes each in the open table; ≈ 128 MB at the
    * cap, shipped once per stage via the task-binary broadcast). The
    * CCNet design keeps the reference corpus — and so the model —
    * small; a model past the cap scores through the join path. */
  val maxFoldEntries: Long = 1L << 22

  /** A fit hash-space bigram LM: `vocab` (ck — bounded token code),
    * `bigrams` (k = m1<<23|m2, cbi), `prefix` (m1, cpre), V' =
    * |vocab|+1. `foldModel` materializes the collected probe maps when
    * the bounded sizes license it (None above the gate). */
  case class HashedBigramLm(vocab: DataFrame, bigrams: DataFrame,
                            prefix: DataFrame, vPrime: Long,
                            hinted: Boolean, bigramTypes: Long) {
    def unpersist(): Unit = { vocab.unpersist(); bigrams.unpersist() }
    /** Collected fold maps — once per model instance (callers memoize
      * models; the collect is bounded by the gate). */
    @transient lazy val foldModel: Option[LmFoldModel] =
      if (!hinted || bigramTypes > maxFoldEntries) None
      else {
        val v = vocab.collect().map(_.getLong(0))
        val bi = bigrams.collect()
        val pre = prefix.collect()
        Some(new LmFoldModel(
          LongLongMap.build(v, Array.fill(v.length)(1L)),
          LongLongMap.build(bi.map(_.getLong(0)), bi.map(_.getLong(1))),
          LongLongMap.build(pre.map(_.getLong(0)), pre.map(_.getLong(1))),
          vPrime))
      }
  }

  /** Map h1/h2 (bounded codes) to the vocabulary (OOV → [[UnkCode]])
    * via joins — the fallback [[mapToks]]. */
  private def mapCodes(pairs: DataFrame, vocab: DataFrame,
                       hinted: Boolean): DataFrame = {
    def side(n: Int) = {
      val v = vocab.select($"ck".as(s"v${n}c"))
      if (hinted) broadcast(v) else v
    }
    pairs
      .join(side(1), pairs("h1") === col("v1c"), "left")
      .join(side(2), pairs("h2") === col("v2c"), "left")
      .withColumn("m1", when($"v1c".isNotNull, $"h1")
        .when($"h1".isNotNull, lit(UnkCode)))
      .withColumn("m2", when($"v2c".isNotNull, $"h2")
        .when($"h2".isNotNull, lit(UnkCode)))
      .drop("v1c", "v2c")
  }

  /** Fit the hash-space bigram LM — [[fit]] in bounded-code space;
    * same caching contract. */
  def fitHashed(train: DataFrame, textCol: String,
                maxVocab: Int = 1 << 16,
                cacheModel: Boolean = false): HashedBigramLm = {
    import graft.functions.NgramHashExpr.bigramHashPairs
    require(maxVocab > 0, "maxVocab must be positive (the cap is what " +
      "bounds the model)")
    // per-token bounded codes, flat explode (Text.tokenCodeSql is the
    // same polynomial the pair expression computes natively —
    // spec-pinned equal to MinHashes.tokenCode)
    val uni = train
      .select(explode(expr(
        s"transform(split($textCol, ' '), w -> " +
          s"CAST(${graft.functions.Text.tokenCodeSql("w")} AS BIGINT) % " +
          s"${1L << 22}L)")).as("ck"))
      .groupBy($"ck").agg(count(lit(1)).as("cnt"))
    val vocab0 = uni.orderBy($"cnt".desc, $"ck".asc).limit(maxVocab)
      .select($"ck")
    val vocab = if (cacheModel) vocab0.persist() else vocab0
    val hinted = maxVocab <= maxBroadcastVocab
    val pairs = train
      .select(explode(bigramHashPairs(col(textCol))).as("pr"))
      .select($"pr.h1".as("h1"), $"pr.h2".as("h2"))
    val bigrams0 = mapCodes(pairs, vocab, hinted)
      .select((shiftleft($"m1", 23) + $"m2").as("k"))
      .groupBy($"k").agg(count(lit(1)).as("cbi"))
    val bigrams = if (cacheModel) bigrams0.persist() else bigrams0
    // m1 = k >> 23 exactly (m2 < 2^23): prefix derives from the keys
    val prefix = bigrams.groupBy(shiftright($"k", 23).as("m1"))
      .agg(sum($"cbi").as("cpre"))
    HashedBigramLm(vocab, bigrams, prefix, vocab.count() + 1L, hinted,
      bigrams.count())
  }

  /** Score `corpus` under the hash-space model — same output shape,
    * integer odds and keep gate as [[score]]. The production plan is
    * the FOLDED one-pass expression (narrow map, no shuffle); above
    * the fold gate — or with `forceJoins` (spec parity) — the exploded
    * pair keys join the model tables under the broadcast gate. */
  def scoreHashed(corpus: DataFrame, idCol: String, textCol: String,
                  lm: HashedBigramLm, keepNum: Long, keepDen: Long,
                  forceJoins: Boolean = false): DataFrame = {
    import graft.functions.NgramHashExpr.{bigramHashPairs, lmScore64}
    require(keepDen > 0, "keepDen must be positive")
    val fold = if (forceJoins) None else lm.foldModel
    fold match {
      case Some(fm) =>
        corpus
          .select(col(idCol), lmScore64(col(textCol), fm).as("r"))
          .select(col(idCol), $"r.n_tok".as("n_tok"),
            $"r.n_big".as("n_big"), $"r.s64".as("s64"))
          .select(col(idCol), $"n_tok", $"n_big", $"s64",
            when($"n_big" > 0L,
              $"s64".cast("double") / ($"n_big" * 64L).cast("double"))
              .as("bpt"),
            when($"n_big" > 0L &&
              $"s64" * lit(keepDen) <= lit(keepNum) * lit(64L) * $"n_big",
              1L).otherwise(0L).as("keep"))
      case None =>
        // n_tok below the explode (the pairArr O(len²) lesson)
        val pairs = corpus
          .select(col(idCol), col(textCol),
            size(split(col(textCol), " ")).cast("long").as("n_tok"))
          .select(col(idCol), $"n_tok",
            explode_outer(bigramHashPairs(col(textCol))).as("pr"))
          .select(col(idCol), $"n_tok",
            $"pr.h1".as("h1"), $"pr.h2".as("h2"))
        def model(df: DataFrame) = if (lm.hinted) broadcast(df) else df
        val joined = mapCodes(pairs, lm.vocab, lm.hinted)
          .withColumn("k", shiftleft($"m1", 23) + $"m2")
          .join(model(lm.bigrams), Seq("k"), "left")
          .join(model(lm.prefix), Seq("m1"), "left")
        val q = graft.functions.RF.euclidDiv(
          coalesce($"cpre", lit(0L)) + lit(lm.vPrime),
          coalesce($"cbi", lit(0L)) + lit(1L))
        joined
          .withColumn("s1", when($"m1".isNotNull, surprisal64(q)))
          .groupBy(col(idCol), $"n_tok")
          .agg(count($"m1").as("n_big"),
            coalesce(sum($"s1"), lit(0L)).as("s64"))
          .select(col(idCol), $"n_tok", $"n_big", $"s64",
            when($"n_big" > 0L,
              $"s64".cast("double") / ($"n_big" * 64L).cast("double"))
              .as("bpt"),
            when($"n_big" > 0L &&
              $"s64" * lit(keepDen) <= lit(keepNum) * lit(64L) * $"n_big",
              1L).otherwise(0L).as("keep"))
    }
  }
}
