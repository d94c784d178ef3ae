package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  *  - `cosine`: pure-expression dot/norms via `zip_with` + `aggregate`
  *    (codegen'd; double math so results are engine-portable).
  *  - brute-force top-k: broadcast the query row, scan once,
  *    TakeOrderedAndProject — the exact baseline, one pass over the data.
  *  - LSH top-k: random-hyperplane signature buckets (the scale path —
  *    candidates come only from the query's bucket, trading recall for a
  *    ~buckets× smaller scan; rerank exactly within the bucket).
  */
object Similarity {

  /** Cosine similarity of two double-array columns (left-to-right
    * summation — deterministic and identical in DuckDB's
    * list_cosine_similarity). Uses the codegen'd DotProduct expression:
    * zip_with/aggregate are CodegenFallback and interpret a lambda per
    * element, which dominates large similarity scans. */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VectorExprs.dot
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k by cosine against a single query row (self-excluding).
    * The 1-row query side is broadcast; orderBy+limit folds to
    * TakeOrderedAndProject, so no global sort materializes. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val q = v.filter(col("id") === queryId)
      .select(col("id").as("qid"), col("v").as("qv"))
    v.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("id"), round(cosine(col("v"), col("qv")), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed) for LSH. */
  private def hyperplanes(dim: Int, nBits: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the dot
    * product). Vectors in the same bucket are likely neighbors. */
  def lshBucket(vec: Column, dim: Int, nBits: Int): Column =
    hyperplanes(dim, nBits).zipWithIndex.map { case (h, i) =>
      val planeLit = array(h.map(lit): _*)
      when(aggregate(zip_with(vec, planeLit, (x, y) => x * y),
        lit(0.0), _ + _) > 0, shiftleft(lit(1), i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Approximate top-k: candidates restricted to the query's LSH bucket,
    * exact cosine rerank inside it. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, dim: Int, nBits: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("bkt", lshBucket(col("v"), dim, nBits))
    val q = v.filter(col("id") === queryId)
      .select(col("id").as("qid"), col("v").as("qv"), col("bkt").as("qbkt"))
    v.join(broadcast(q), col("bkt") === col("qbkt"))
      .filter(col("id") =!= col("qid"))
      .select(col("id"), round(cosine(col("v"), col("qv")), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
