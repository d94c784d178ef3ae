package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** TRAINED character-trigram language identifier — the production
  * replacement for the marker-word heuristic (`Text.langId` /
  * `LangIdExpr`): a multinomial Naive Bayes over the top-V char
  * trigrams (the langid.py / fastText-input shape), fit by PURE
  * COUNTING on a labeled corpus and scored entirely in the 1/64-bit
  * integer log2 ([[NgramLm.surprisal64]]), so both fit and score are
  * bit-identical in any engine — the DuckDB oracle replays the whole
  * chain (counts → vocab cap → integer weights → per-doc argmax) as
  * generated CTEs, the t26/QualityClassifier deterministic-fit
  * precedent taken multi-class.
  *
  * Score of doc d under language l (uniform priors, add-one smoothing
  * over the capped vocabulary):
  *   score64(d, l) = Σ_{g ∈ d ∩ vocab} s64(c_{g,l} + 1)  −  n_d·s64(T_l + V)
  * where c_{g,l} = train count of gram g in language l (vocab grams
  * only), T_l = Σ_{g∈vocab} c_{g,l}, V = |vocab|, n_d = d's vocab-gram
  * occurrences. Prediction = argmax_l (ties → lang ASC); docs with no
  * vocab gram (under 3 chars, or fully OOV) predict 'unknown'.
  *
  * 100 TB shape: fit = ONE corpus-sized gram shuffle with map-side
  * combine into a (lang × vocab)-bounded count table; the model is a
  * hard-capped broadcast (maxGrams · |langs| rows — the t25 top-V cap
  * rule, never an unbounded vocabulary); scoring is one narrow gram
  * explode + broadcast-hash probes + one (doc, lang) partial
  * aggregation — no corpus-sized join sides anywhere. The gram arrays
  * are built BELOW the explode (the t33 Generate-projection lesson:
  * substr above the explode would copy the full text per gram row)
  * and by the codegen [[graft.functions.CharGrams]] walk (the HOF
  * chain is CodegenFallback and O(len²) on multibyte text).
  *
  * 100× probe (/tmp/sf10, 500k docs): fit 5-7 s; the stage-plan
  * [[predictStages]] reads 44-58 s (bound by ~150M string-gram rows
  * through two broadcast probes) — [[predictFast]] through the folded
  * [[kernel]] reads 0.2-0.5 s (one codegen pass, no explode/joins/
  * window; the t42 full-fold shape, but with an INJECTIVE gram pack so
  * the fold is EXACTLY the string model — spec-pinned bit-equal).
  * [[predict]] routes through the kernel automatically under the fold
  * gate, so the query path scores at kernel speed.
  */
object LangNb {

  /** Char-trigram array of `textCol` via the HOF chain — the
    * REFERENCE form (LangNbSpec pins the codegen [[CharGrams]] path
    * equal to it; the oracle replays the same substr arithmetic). The
    * CASE guards sequence(1, 0), which Spark evaluates as the
    * DESCENDING [1, 0]; substr/length are CHARACTER-indexed in both
    * Spark and DuckDB, so the oracle extracts identical grams. */
  private[graft] def gramArrSql(textCol: String): String =
    s"CASE WHEN length($textCol) >= 3 THEN " +
      s"transform(sequence(1, length($textCol) - 2), " +
      s"i -> substr($textCol, i, 3)) ELSE array() END"

  /** (keyCols..., gram) exploded char trigrams — ONE codegen pass
    * ([[graft.functions.CharGrams]]): the HOF chain is CodegenFallback
    * and re-seeks byte offsets per position, ~20× slower over a
    * 500k-doc corpus. */
  def grams(df: DataFrame, keyCols: Seq[String],
            textCol: String): DataFrame =
    df.select((keyCols.map(col) :+
      explode(graft.functions.CharGrams.charGrams(col(textCol), 3))
        .as("gram")): _*)

  /** Model tables at or under this many rows fold into the serving
    * kernel (the [[NgramLm.maxFoldEntries]] precedent); above it
    * [[predict]] falls back to the distributed stage plan. */
  val maxFoldRows: Int = 1 << 22

  /** The fit artifact: `model` (gram, lang, w64 = s64(c+1)) over the
    * capped vocabulary, `base` (lang, b64 = s64(T_l + V)), `vocab`
    * (gram). All three are bounded by maxGrams · |langs|. */
  final case class Model(model: DataFrame, base: DataFrame,
                         vocab: DataFrame) {
    /** Folded serving kernel when the model fits the fold gate (None
      * above it) — ONE limit-gated collect (the GraphAnn
      * maxAppendBatch limit-before-collect rule), memoized per Model
      * instance; callers memoize models ([[graft.Queries2Lm]]'s
      * SessionMemo), so the fold runs once per (session, corpus). */
    @transient lazy val foldKernel
        : Option[graft.functions.LangNbKernel] = {
      // gate on a COUNT before any collect (the NgramLm.foldModel
      // rule): an over-gate model must never materialize ~4M driver
      // Rows just to learn it doesn't fold
      val n = model.limit(maxFoldRows + 1).count()
      if (n > maxFoldRows) None
      else Some(kernelFromRows(this,
        model.select(col("gram"), col("lang"), col("w64")).collect()))
    }
  }

  /** Fit on a labeled corpus — one gram shuffle, two bounded actions
    * (the vocab count and the overflow-bound max). */
  def fit(train: DataFrame, textCol: String, langCol: String,
          maxGrams: Int = 4096): Model = {
    require(maxGrams > 0, "maxGrams must be positive (the cap is what " +
      "bounds the model — an unbounded gram table is not crawl-safe)")
    val cnt = grams(train, Seq(langCol), textCol)
      .groupBy(col(langCol).as("lang"), $"gram")
      .agg(count(lit(1)).as("c"))
    // top-V grams by total count (gram ASC tie-break — binary order,
    // identical in DuckDB)
    val vocab = cnt.groupBy($"gram").agg(sum($"c").as("s"))
      .orderBy($"s".desc, $"gram".asc).limit(maxGrams)
      .select($"gram")
    val cv = cnt.join(broadcast(vocab), "gram")
    val v = vocab.count()
    val langs = train.select(col(langCol).as("lang")).distinct()
    val tot = langs.join(
        cv.groupBy($"lang").agg(sum($"c").as("t")), Seq("lang"), "left")
      .select($"lang", coalesce($"t", lit(0L)).as("t"))
    // surprisal64's 2^57 shift bound — trivially satisfied below
    // ~10^17 training grams, checked anyway (the NgramLm fit rule)
    val tMax = tot.agg(coalesce(max($"t"), lit(0L))).collect().head.getLong(0)
    require(tMax + v < (1L << 57),
      s"language-ID counts overflow the integer surprisal chain " +
        s"(T+V = ${tMax + v} exceeds 2^57) — shard the model")
    Model(
      cv.select($"gram", $"lang",
        NgramLm.surprisal64($"c" + 1L).as("w64")),
      tot.select($"lang", NgramLm.surprisal64($"t" + lit(v)).as("b64")),
      vocab)
  }

  /** Fold the fit model into the in-process serving kernel (ONE
    * bounded collect — the model is hard-capped at maxGrams·|langs|
    * rows by construction): packed-trigram map + dense slot-major
    * weight block + lang-ASC base costs. The pack is INJECTIVE (3×21
    * bits), so kernel scoring is EXACTLY the string model —
    * [[predictFast]] is spec-pinned bit-equal to [[predict]]. */
  def kernel(m: Model): graft.functions.LangNbKernel = {
    val rows = m.model.select($"gram", $"lang", $"w64").collect()
    require(rows.length <= maxFoldRows,
      s"model too large to fold (${rows.length} rows)")
    kernelFromRows(m, rows)
  }

  private def kernelFromRows(m: Model,
      rows: Array[org.apache.spark.sql.Row])
      : graft.functions.LangNbKernel = {
    val langs = m.base.select($"lang", $"b64").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val nLang = langs.length
    val langIdx = langs.map(_._1).zipWithIndex.toMap
    def packGram(g: String): Long = {
      val cp1 = g.codePointAt(0)
      val o2 = Character.charCount(cp1)
      val cp2 = g.codePointAt(o2)
      val cp3 = g.codePointAt(o2 + Character.charCount(cp2))
      graft.functions.LangNbScore.pack(cp1, cp2, cp3)
    }
    val slots = rows.map(r => packGram(r.getString(0))).distinct.sorted
    val slotOf = slots.zipWithIndex.toMap
    val w64 = new Array[Long](slots.length * nLang)
    rows.foreach { r =>
      w64(slotOf(packGram(r.getString(0))) * nLang +
        langIdx(r.getString(1))) = r.getLong(2)
    }
    new graft.functions.LangNbKernel(
      graft.functions.LongLongMap.build(slots,
        slots.indices.map(_.toLong).toArray),
      w64, langs.map(_._2), langs.map(_._1))
  }

  /** [[predict]] through the folded kernel — one narrow codegen pass,
    * no explode/joins/window (the t42 full-fold shape; 100×: 44-50 s →
    * ~1-2 s over 500k docs). Null text predicts 'unknown' like the
    * stage form. */
  def predictFast(docs: DataFrame, idCol: String, textCol: String,
                  k: graft.functions.LangNbKernel): DataFrame =
    docs.select(col(idCol),
      coalesce(graft.functions.LangNbScore.score(col(textCol), k),
        lit("unknown")).as("lang_pred"))

  /** CCNet-style language-confidence card: (idCol, lang_pred,
    * margin64, n_grams, confident) where margin64 = best − runner-up
    * score BY VALUE (a top tie reads 0) and confident = 1 iff the doc
    * has vocabulary grams AND margin64 ≥ minPerGram64·n_grams — the
    * margin is per vocab gram, cross-multiplied, so the gate is
    * length-invariant and exactly integer. ONE codegen pass through
    * the folded kernel ([[graft.functions.LangNbStats]] — the same
    * walk as [[predictFast]], so the two cannot drift); 'unknown'
    * docs read (0, 0, 0). */
  def confidence(docs: DataFrame, idCol: String, textCol: String,
                 k: graft.functions.LangNbKernel,
                 minPerGram64: Long): DataFrame = {
    require(k.langs.length >= 2,
      s"confidence margin needs >= 2 languages, kernel has ${k.langs.length}")
    require(minPerGram64 >= 0, s"minPerGram64 must be >= 0: $minPerGram64")
    val langArr = array(k.langs.map(lit).toSeq: _*)
    docs
      .select(col(idCol),
        coalesce(graft.functions.LangNbScore.stats(col(textCol), k),
          typedLit(Seq(-1L, 0L, 0L))).as("st"))
      .select(col(idCol),
        element_at($"st", 1).as("bi"),
        element_at($"st", 2).as("margin64"),
        element_at($"st", 3).as("n_grams"))
      .select(col(idCol),
        when($"bi" >= 0L, element_at(langArr, ($"bi" + 1L).cast("int")))
          .otherwise("unknown").as("lang_pred"),
        $"margin64", $"n_grams",
        ($"n_grams" > 0L &&
          $"margin64" >= lit(minPerGram64) * $"n_grams")
          .cast("int").as("confident"))
  }

  /** Predict (idCol, lang_pred) for every row of `docs` — 'unknown'
    * when the doc has no vocabulary gram. Routes through the folded
    * kernel ([[predictFast]]) when the model fits the fold gate — ONE
    * narrow codegen pass, spec-pinned bit-equal to the stage plan
    * (LangNbSpec); falls back to [[predictStages]] above the gate
    * (the [[NgramLm]] foldModel precedent). */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              m: Model): DataFrame = m.foldKernel match {
    case Some(k) => predictFast(docs, idCol, textCol, k)
    case None    => predictStages(docs, idCol, textCol, m)
  }

  /** The distributed stage-form predict — the fallback above the fold
    * gate and the parity reference the kernel is spec-pinned against:
    * gram explode → broadcast vocab/model probes → per-doc argmax
    * window. Correct at any model size, but ~100× the kernel's cost
    * at the 100× probe (44-50 s vs 0.2-0.5 s / 500k docs). */
  def predictStages(docs: DataFrame, idCol: String, textCol: String,
                    m: Model): DataFrame = {
    val dg = grams(docs.select(col(idCol), col(textCol)), Seq(idCol),
        textCol)
      .join(broadcast(m.vocab), "gram")
    val nv = dg.groupBy(col(idCol)).agg(count(lit(1)).as("nv"))
    val hits = dg.join(broadcast(m.model), Seq("gram"))
      .groupBy(col(idCol), $"lang").agg(sum($"w64").as("sw"))
    val scores = nv.crossJoin(broadcast(m.base))
      .join(hits, Seq(idCol, "lang"), "left")
      .select(col(idCol), $"lang",
        (coalesce($"sw", lit(0L)) - $"nv" * $"b64").as("score64"))
    val w = Window.partitionBy(col(idCol))
      .orderBy($"score64".desc, $"lang".asc)
    val pred = scores.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select(col(idCol), $"lang".as("lang_pred"))
    docs.select(col(idCol)).join(pred, Seq(idCol), "left")
      .select(col(idCol),
        coalesce($"lang_pred", lit("unknown")).as("lang_pred"))
  }

  /** Persist the fitted model (the NgramLm/Dsir lifecycle: fit ONCE on
    * the labeled reference corpus, identify language anywhere — the
    * most re-applied model in a crawl pipeline). Three bounded parquet
    * parts; everything downstream (fold gate included) reloads from
    * them bit-identically. */
  def saveModel(m: Model, path: String): Unit = {
    m.model.select($"gram", $"lang", $"w64")
      .write.mode("overwrite").parquet(s"$path/model")
    m.base.select($"lang", $"b64")
      .write.mode("overwrite").parquet(s"$path/base")
    m.vocab.select($"gram")
      .write.mode("overwrite").parquet(s"$path/vocab")
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model = {
    Seq("model", "base", "vocab").foreach { part =>
      require(Similarity.fsDirExists(spark, s"$path/$part"),
        s"no language-ID model at $path (missing $path/$part — " +
          "saveModel one first)")
    }
    Model(
      spark.read.parquet(s"$path/model").select($"gram", $"lang", $"w64"),
      spark.read.parquet(s"$path/base").select($"lang", $"b64"),
      spark.read.parquet(s"$path/vocab").select($"gram"))
  }

}
