package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Trained linear (logistic-family) document-quality classifier — the
  * standard model-based quality-filter shape (a linear model over
  * handcrafted text signals, the public fastText/CCNet-style pipeline
  * stage), fit IN-REPO over the rule-based signals this engine already
  * computes (t02 quality ratios, t11 repetition signals, t21 Gopher
  * rules as weak labels).
  *
  * Cross-engine determinism, the two usual traps and their fixes:
  *
  *  1. `exp`/`ln` are libm calls with no cross-engine rounding
  *     guarantee, so the link is the ALGEBRAIC sigmoid
  *     σ̃(z) = 0.5 + z / (2·(1+|z|)) — abs/add/mul/div only, every op
  *     correctly-rounded IEEE, bit-identical in Spark and DuckDB.
  *     σ̃ is a strictly monotone (0,1) squash with σ̃(0)=0.5, so
  *     decision thresholds and rankings behave like the logistic's.
  *  2. A distributed float SUM is order-dependent (partition race), so
  *     the gradient accumulations are DECIMAL-routed: each per-row
  *     contribution rounds once to DECIMAL(30,15) and the sum is exact
  *     integer arithmetic — the fit is bit-reproducible on any cluster
  *     layout. (The same dsum/Lloyd-decimal-mean convention as the s03
  *     and s07 fits.)
  *
  * Features (all exact rationals of integer counts — engine-portable):
  * bias, saturating length min(wc,200)/200, punctuation ratio, stopword
  * ratio, duplicate-bigram fraction, top-bigram share, distinct-word
  * fraction.
  *
  * 100 TB shape: each GD iteration is ONE map + one 7-column decimal
  * aggregate over the corpus (map-side partial combine, no shuffle of
  * rows) — gradient descent over a corpus is embarrassingly parallel;
  * scoring is a pure narrow map (codegen'd count expressions, no
  * exchange).
  */
object QualityClassifier {

  val featureNames: Seq[String] =
    Seq("bias", "len_sat", "punct", "stop", "dup_big", "top_big", "uniq")

  /** Weights fit in-repo by QualityClassifierSpec (sf0.001 documents,
    * Gopher keep labels at minWords=20, balanced fit, 48 iterations,
    * lr=2.0) — the spec pins `fit` to EXACTLY these values, so any
    * change to the fit arithmetic is caught as a golden diff. The f2
    * (punctuation) weight is exactly 0: the synthetic corpus carries no
    * punctuation, so that gradient is identically zero — kept as a
    * feature because real crawls do. */
  val defaultWeights: Array[Double] = Array(
    -0.32459452485282314, -1.6636683885450623, 0.0,
    0.5731071764527409, -0.24631582466369478, -0.03405780849009068,
    1.2947221002030727)

  /** The feature columns over `textCol`: (idCol, f0..f6) with f0 = 1. */
  def features(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.{QualityExpr, RepStatsExpr}
    val words = split(col(textCol), " ")
    val wc = size(words).cast("long")
    val uniq = size(array_distinct(words)).cast("long")
    df.select(col(idCol),
      lit(1.0).as("f0"),
      least(wc.cast("double") / 200d, lit(1.0)).as("f1"),
      QualityExpr.punctRatio(col(textCol)).as("f2"),
      QualityExpr.stopwordRatio(col(textCol)).as("f3"),
      RepStatsExpr.dupBigramFrac(col(textCol)).as("f4"),
      RepStatsExpr.topBigramFrac(col(textCol)).as("f5"),
      (uniq.cast("double") / wc).as("f6"))
  }

  /** Algebraic sigmoid column: 0.5 + z / (2·(1+|z|)). */
  def sigmoidA(z: Column): Column = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  private def sigmoidALocal(z: Double): Double = 0.5 + z / (2.0 * (1.0 + math.abs(z)))

  /** Deterministic batch gradient descent: `iters` passes, each ONE
    * decimal-summed aggregate of the 7 per-row gradient contributions
    * ω_y·(σ̃(w·x) − y)·x_j. Returns the weight vector. `labelCol` must
    * be 0/1. Class-BALANCED by default (ω₁ = n/2n₁, ω₀ = n/2n₀ — the
    * standard re-weighting; quality labels are usually heavily skewed
    * and an unweighted fit converges to the majority bias).
    * Bit-reproducible: per-row doubles are fixed chains, the class
    * weights derive from exact counts, and the only cross-row reduction
    * is an exact DECIMAL sum. */
  def fit(feats0: DataFrame, labelCol: String,
          iters: Int = 48, lr: Double = 2.0,
          balanced: Boolean = true): Array[Double] = {
    val k = featureNames.length
    val y = col(labelCol).cast("double")
    // the feature plan (split/regex/bigram kernels over raw text) would
    // otherwise re-execute on every gradient pass — compute it once
    val feats = feats0.persist()
    try fitCached(feats, labelCol, iters, lr, balanced, k, y)
    finally feats.unpersist()
  }

  private def fitCached(feats: DataFrame, labelCol: String, iters: Int,
                        lr: Double, balanced: Boolean, k: Int,
                        y: Column): Array[Double] = {
    val n = feats.count().toDouble
    val n1 = feats.filter(col(labelCol) === 1).count().toDouble
    require(n1 > 0 && n1 < n, s"labels are degenerate ($n1 of $n positive)")
    val (w1, w0) =
      if (balanced) (n / (2.0 * n1), n / (2.0 * (n - n1))) else (1.0, 1.0)
    var w = new Array[Double](k)
    val fcols = (0 until k).map(j => col(s"f$j"))
    for (_ <- 1 to iters) {
      // z in the SAME left-assoc order as score(): w0*f0 + w1*f1 + …
      val z = (0 until k).map(j => lit(w(j)) * fcols(j)).reduce(_ + _)
      val omega = when(col(labelCol) === 1, lit(w1)).otherwise(lit(w0))
      val err = omega * (sigmoidA(z) - y)
      val grads = (0 until k).map(j =>
        sum((err * fcols(j)).cast("decimal(30,15)")).as(s"g$j"))
      val row = feats.agg(grads.head, grads.tail: _*).collect().head
      val w2 = new Array[Double](k)
      var j = 0
      while (j < k) {
        w2(j) = w(j) - lr * row.getDecimal(j).doubleValue() / n
        j += 1
      }
      w = w2
    }
    w
  }

  /** Score documents with a weight vector: (idCol, z, score, pred) —
    * z the linear term (left-assoc, the fit's order), score = σ̃(z),
    * pred = 1 iff z ≥ 0 (σ̃ ≥ 0.5). A narrow codegen map — no shuffle. */
  def score(df: DataFrame, idCol: String, textCol: String,
            weights: Array[Double] = defaultWeights): DataFrame = {
    require(weights.length == featureNames.length,
      s"expected ${featureNames.length} weights, got ${weights.length}")
    val f = features(df, idCol, textCol)
    val z = weights.zipWithIndex
      .map { case (wj, j) => lit(wj) * col(s"f$j") }
      .reduce(_ + _)
    f.select(col(idCol), z.as("z"))
      .select(col(idCol), $"z", sigmoidA($"z").as("score"),
        when($"z" >= 0d, 1L).otherwise(0L).as("pred"))
  }

  /** Persist a fitted weight vector (the model-artifact lifecycle:
    * fit once on the labeled slice, score any corpus/feed). Doubles
    * round-trip exactly through parquet, so a loaded model scores
    * bit-identically. */
  def saveWeights(spark: org.apache.spark.sql.SparkSession,
                  weights: Array[Double], path: String): Unit = {
    require(weights.length == featureNames.length,
      s"expected ${featureNames.length} weights, got ${weights.length}")
    import spark.implicits._
    weights.zipWithIndex.map { case (v, j) => (j, v) }.toSeq
      .toDF("j", "w").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadWeights(spark: org.apache.spark.sql.SparkSession,
                  path: String): Array[Double] = {
    require(Similarity.fsDirExists(spark, path),
      s"no quality-classifier weights at $path — saveWeights one first")
    val w = spark.read.parquet(path).orderBy(col("j"))
      .collect().map(_.getDouble(1))
    require(w.length == featureNames.length,
      s"stored weight vector has ${w.length} entries, " +
        s"expected ${featureNames.length}")
    w
  }
}
