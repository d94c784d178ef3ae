package graft

import org.apache.spark.sql.functions._
import graft.operators.{QualityClassifier, QualityRules}

/** The trained linear quality classifier: deterministic in-repo fit
  * (decimal-summed gradients + algebraic sigmoid — no libm, no
  * order-dependent float reduction), pinned weights, and agreement with
  * the Gopher weak labels it was trained against. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  // Gopher keep at the relaxed minWords=20 window (the 35-70 bench
  // window leaves 10% positives — learnable but degenerate); the
  // conjunction label is still ~14% positive, hence the balanced fit.
  private lazy val labeled = {
    val labels = QualityRules.gopher(docs, "doc_id", "text", minWords = 20)
      .select($"doc_id", $"keep")
    QualityClassifier.features(docs, "doc_id", "text")
      .join(labels, "doc_id")
  }

  test("fit is bit-reproducible and returns the pinned weights " +
      "(the t26 constants — any arithmetic drift is a golden diff)") {
    val w1 = QualityClassifier.fit(labeled, "keep")
    val w2 = QualityClassifier.fit(
      labeled.repartition(7), "keep") // layout must not change the fit
    assert(w1.toSeq == w2.toSeq, "fit depends on partition layout")
    assert(w1.toSeq == QualityClassifier.defaultWeights.toSeq,
      s"refit drifted from the pinned weights:\n  got ${w1.mkString(", ")}")
  }

  test("the fitted model separates its Gopher training labels: balanced " +
      "accuracy well above chance, scores ordered across the boundary") {
    val scored = QualityClassifier.score(docs, "doc_id", "text")
      .join(labeled.select($"doc_id", $"keep"), "doc_id")
    def rate(k: Long): Double = {
      val cls = scored.filter($"keep" === k)
      cls.filter($"pred" === k).count().toDouble / cls.count()
    }
    val (tpr, tnr) = (rate(1L), rate(0L))
    val balAcc = (tpr + tnr) / 2
    assert(balAcc > 0.75,
      f"balanced accuracy $balAcc%.3f (tpr $tpr%.3f tnr $tnr%.3f) under 0.75")
    // kept docs score higher on average than dropped docs
    val means = scored.groupBy($"keep").agg(avg($"score").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(means(1L) > means(0L),
      s"keep-mean ${means(1L)} not above drop-mean ${means(0L)}")
  }

  test("persisted weights: save/load round-trips doubles exactly, a " +
      "loaded model scores bit-identically, the streaming twin equals " +
      "batch and replays as a no-op; malformed stores fail fast") {
    val base = java.nio.file.Files.createTempDirectory("qcw").toString
    val w = QualityClassifier.defaultWeights
    QualityClassifier.saveWeights(spark, w, s"$base/weights")
    val loaded = QualityClassifier.loadWeights(spark, s"$base/weights")
    assert(loaded.toSeq == w.toSeq, "doubles must round-trip exactly")
    val small = docs.limit(50)
    def scores(ws: Array[Double]) =
      QualityClassifier.score(small, "doc_id", "text", ws)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getLong(3))).sortBy(_._1).toSeq
    assert(scores(loaded) == scores(w))
    intercept[IllegalArgumentException](
      QualityClassifier.loadWeights(spark, s"$base/nope"))
    // malformed store: wrong arity
    import spark.implicits._
    Seq((0, 1.0), (1, 2.0)).toDF("j", "w")
      .write.parquet(s"$base/bad")
    intercept[IllegalArgumentException](
      QualityClassifier.loadWeights(spark, s"$base/bad"))
    // streaming twin
    small.select($"doc_id", $"text").write.parquet(s"$base/feed")
    def run() = streaming.Streams.qualityScoreStream(spark, s"$base/feed",
      small.select($"doc_id", $"text"), "doc_id", "text",
      s"$base/weights", s"$base/out", s"$base/ckpt")
    val streamed = run().collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(streamed == scores(w), "stream must equal batch")
    assert(run().count() == 50L, "drained replay must append nothing")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("score applies the exact linear+algebraic-sigmoid chain " +
      "(left-assoc, the DuckDB-replayable form)") {
    val row = QualityClassifier.features(docs, "doc_id", "text")
      .orderBy($"doc_id").limit(1)
      .join(QualityClassifier.score(docs, "doc_id", "text"), "doc_id")
      .collect().head
    val f = (0 until 7).map(j => row.getDouble(row.fieldIndex(s"f$j")))
    val w = QualityClassifier.defaultWeights
    var z = 0.0
    (0 until 7).foreach(j => z += w(j) * f(j)) // same left-assoc order
    assert(row.getDouble(row.fieldIndex("z")) == z)
    assert(row.getDouble(row.fieldIndex("score")) ==
      0.5 + z / (2.0 * (1.0 + math.abs(z))))
    assert(row.getLong(row.fieldIndex("pred")) == (if (z >= 0) 1L else 0L))
  }
}
