package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * select the raw-corpus slice that looks most like a target (in-domain)
  * corpus under hashed-n-gram bag-of-words models. The standard
  * pretraining-data selection stage when a quality/domain reference set
  * exists but a trained classifier is unwanted.
  *
  * Model: hashed n-gram features — every word n-gram hashes into one of
  * `buckets` buckets (the paper's 10k-bucket hashed unigram+bigram
  * model). Laplace-smoothed per-bucket probabilities on the target and
  * raw corpora give each document a log importance weight
  *
  *   log w(d) = Σ_g [ log p̂_t(b(g)) − log p̂_r(b(g)) ]
  *            = Σ_g [ log(c_t+1) − log(c_r+1) ] + |grams|·K,
  *   K = log(N_r + B) − log(N_t + B)
  *
  * and the selected slice is the top-k by weight (the paper resamples
  * with Gumbel noise; the deterministic top-k variant drops the noise —
  * documented divergence, engine randomness cannot hash-replay).
  *
  * CROSS-ENGINE DETERMINISM (the t33 convention): every log is the
  * integer 1/64-bit surprisal [[NgramLm.surprisal64]] of a POSITIVE
  * integer — log w is decomposed term-by-term (never a product that
  * could overflow: each operand is ≤ max(corpus grams, buckets)+1,
  * far below 2^63) — so the weight is a BIGINT and the top-k order is
  * an integer sort with doc-id tie-break, bit-identical in DuckDB.
  *
  * 100 TB shape: gram hashing is one codegen pass per doc (grams never
  * travel as strings); the two count tables are `buckets`-bounded BY
  * CONSTRUCTION, so they broadcast under the same cap as the TfIdf/
  * NgramLm gate (an over-cap bucket count shuffle-joins); the per-doc
  * weight is ONE (id, partial-sum) shuffle with map-side combine; the
  * global top-k folds to TakeOrderedAndProject — no global sort, no
  * rank window. */
object Dsir {

  /** Per-bucket gram counts of `df`: (b, c) with b = pmod(hash, buckets)
    * — at most `buckets` rows by construction. */
  def bucketCounts(df: DataFrame, textCol: String, n: Int,
                   buckets: Int): DataFrame = {
    import graft.functions.NgramHashExpr.ngramHashes
    require(buckets > 0, "buckets must be positive")
    df.select(explode(ngramHashes(col(textCol), n)).as("g"))
      .select(pmod($"g", lit(buckets.toLong)).as("b"))
      .groupBy($"b").agg(count(lit(1)).as("c"))
  }

  /** The fitted importance model: target/raw bucket-count tables, their
    * gram totals, and the constant surprisal offset K64 =
    * surp64(N_r + B) − surp64(N_t + B) (1/64-bit steps). */
  case class Model(target: DataFrame, raw: DataFrame,
                   nTarget: Long, nRaw: Long, buckets: Int, n: Int) {
    /** Release a `fit(cacheModel = true)` model's cached tables. */
    def unpersist(): Unit = { target.unpersist(); raw.unpersist() }
    def k64: Long =
      NgramLm.surprisal64Long(nRaw + buckets) -
        NgramLm.surprisal64Long(nTarget + buckets)
  }

  /** Fit the hashed-n-gram importance model (two bounded count tables +
    * two exact totals). `target` is the in-domain reference corpus,
    * `raw` the corpus to select from. */
  /** `cacheModel` persists the two count tables (the selection plan
    * references each once per action, and the totals are separate
    * actions — uncached, the corpus gram scans run twice per fit and
    * again per selection); `unpersist()` releases them. */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
          n: Int = 2, buckets: Int = 1 << 16,
          cacheModel: Boolean = false): Model = {
    def counts(df: DataFrame) = {
      val c = bucketCounts(df, textCol, n, buckets)
      if (cacheModel) c.persist() else c
    }
    val t = counts(target)
    val r = counts(raw)
    def total(c: DataFrame): Long =
      c.agg(coalesce(sum($"c"), lit(0L))).collect().head.getLong(0)
    Model(t, r, total(t), total(r), buckets, n)
  }

  /** Persist a fit model: the two bounded bucket-count tables plus a
    * one-row meta (totals, buckets, n) — same production split as
    * [[NgramLm.saveModel]]. */
  def saveModel(m: Model, path: String): Unit = {
    val spark = m.target.sparkSession
    import spark.implicits._
    m.target.write.mode("overwrite").parquet(s"$path/target")
    m.raw.write.mode("overwrite").parquet(s"$path/raw")
    Seq((m.nTarget, m.nRaw, m.buckets, m.n)).toDF(
      "ntarget", "nraw", "buckets", "n")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a persisted model (columns by NAME; fails fast). */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model = {
    Seq("target", "raw", "meta").foreach { part =>
      require(Similarity.fsDirExists(spark, s"$path/$part"),
        s"no DSIR model at $path (missing $path/$part — " +
          "saveModel one first)")
    }
    // memoized per (session, path, model-file stamp) — ArtifactMemo;
    // the DataFrame members are lazy plans, never results
    ArtifactMemo.cached(spark, path, Seq("meta", "target", "raw")) {
      val meta = spark.read.parquet(s"$path/meta")
        .select(col("ntarget"), col("nraw"), col("buckets"), col("n"))
        .collect().head
      Model(
        spark.read.parquet(s"$path/target").select($"b", $"c"),
        spark.read.parquet(s"$path/raw").select($"b", $"c"),
        meta.getLong(0), meta.getLong(1), meta.getInt(2), meta.getInt(3))
    }
  }

  /** Every document's integer log importance weight: (idCol, n_gram,
    * lw64) — the full scored corpus (streaming micro-batches score
    * through this; [[selectTopK]] is the batch selection form).
    * Count-table joins broadcast only under the bounded-bucket gate. */
  def scoreAll(corpus: DataFrame, idCol: String,
               textCol: String, m: Model): DataFrame = {
    import graft.functions.NgramHashExpr.ngramHashes
    def side(df: DataFrame, cName: String) = {
      val r = df.select($"b", $"c".as(cName))
      if (m.buckets <= NgramLm.maxBroadcastVocab) broadcast(r) else r
    }
    val grams = corpus
      .select(col(idCol),
        explode_outer(ngramHashes(col(textCol), m.n)).as("g"))
      .select(col(idCol), pmod($"g", lit(m.buckets.toLong)).as("b"))
    val term = NgramLm.surprisal64(coalesce($"ct", lit(0L)) + 1L) -
      NgramLm.surprisal64(coalesce($"cr", lit(0L)) + 1L)
    grams
      .join(side(m.target, "ct"), Seq("b"), "left")
      .join(side(m.raw, "cr"), Seq("b"), "left")
      .withColumn("t64", when($"b".isNotNull, term))
      .groupBy(col(idCol))
      .agg(count($"b").as("n_gram"),
        coalesce(sum($"t64"), lit(0L)).as("s"))
      .select(col(idCol), $"n_gram",
        ($"s" + $"n_gram" * lit(m.k64)).as("lw64"))
  }

  /** Top-`k` documents of `corpus` by integer log importance weight:
    * (idCol, n_gram, lw64) ordered by (lw64 DESC, id ASC) — lw64 in
    * 1/64-bit log₂ steps; folds to TakeOrderedAndProject. */
  def selectTopK(corpus: DataFrame, idCol: String, textCol: String,
                 m: Model, k: Int): DataFrame =
    scoreAll(corpus, idCol, textCol, m)
      .orderBy($"lw64".desc, col(idCol).asc)
      .limit(k)

  /** Seeded REPLAYABLE Gumbel key for importance RESAMPLING — the
    * paper's §2 resample step done in exact integers (closing the
    * deterministic-top-k divergence when sampling fidelity is wanted):
    * drawing k docs without replacement with probability ∝ exp₂(lw) is
    * the exponential race's arg-top-k of lw − log(−log u) (Gumbel-top-k,
    * Vieira 2014 / Kool et al. 2019). With every quantity in 1/64-bit
    * log₂ units and common constants dropped,
    *
    *   key64 = lw64 − s64(m),  m = 2048 − s64(h) = 64·(−log₂ u),
    *
    * where h = decisionHash(id XOR seed) is the 32-bit draw u = h/2³²
    * (clamped to [1, 2³²−1] so both logs exist; m ∈ [1, 2048]). A pure
    * function of (id, seed): rerun, engine, and layout invariant, and
    * the s64 interpolation error (≤ 0.086 bits) is SHARED by both
    * engines, so the sampled set hash-replays exactly. */
  def gumbelKey64(id: Column, lw64: Column, seed: Long): Column = {
    val h = greatest(
      Sampling.decisionHash(id.cast("long").bitwiseXOR(lit(seed))), lit(1L))
    val m = lit(2048L) - NgramLm.surprisal64(h)
    lw64 - NgramLm.surprisal64(m)
  }

  /** [[selectTopK]] with seeded Gumbel resampling: the k documents by
    * (key64 DESC, id ASC) — selection odds ∝ the importance weight
    * instead of a hard cutoff, still a TakeOrderedAndProject. */
  def selectGumbelTopK(corpus: DataFrame, idCol: String, textCol: String,
                       m: Model, k: Int, seed: Long): DataFrame =
    scoreAll(corpus, idCol, textCol, m)
      .withColumn("key64", gumbelKey64(col(idCol), $"lw64", seed))
      .orderBy($"key64".desc, col(idCol).asc)
      .limit(k)
}
