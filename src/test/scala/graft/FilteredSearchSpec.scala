package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** Predicate pushdown into PERSISTED ANN search (round-17 verdict item
  * 4): the three index searches take a `where` over persisted payload
  * columns, applied AT the partition-pruned scan — the predicate rides
  * the parquet scan as a pushed filter, non-qualifying rows are never
  * scored, and the top-k is k QUALIFYING rows. */
class FilteredSearchSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    s"/tmp/graft_fsspec/${tag}_${System.nanoTime()}"
  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("searchIvfIndex(where): scoped search == brute-force top-k over " +
      "the label-restricted corpus; the predicate is a PUSHED parquet " +
      "filter below the rerank") {
    val base = tmp("ivf")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", nCells = 2,
      base, payloadCols = Seq("label"))
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"), $"label")
      .collect().head
    val (qv, lab) = (q.getSeq[Double](0), q.getInt(1))
    // nProbe = nCells → the scoped search is EXACT over the label set
    val got = Similarity.searchIvfIndex(spark, base, qv, k = 5,
        nProbe = 2, excludeId = 0L, where = Some(s"label = $lab"))
    val p = got.queryExecution.explainString(FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(label"),
      s"label must reach the scan as a pushed filter:\n${p.take(1500)}")
    val want = Similarity.bruteForceTopK(
      emb.filter($"label" === lab), "vec_id", "embedding",
      queryId = 0L, k = 5)
      .select($"id", $"score").collect().map(_.toString).toSeq
    assert(got.select($"id", $"score").collect().map(_.toString).toSeq
      == want, "scoped search != label-restricted exact top-k")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("payload columns survive DELETE (IVF) and REBALANCE (IVFADC) — " +
      "scoped search still works after maintenance (round-18 " +
      "self-review: both paths silently dropped them)") {
    val base = tmp("pay")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", nCells = 2,
      s"$base/ivf", payloadCols = Seq("label"))
    Similarity.deleteFromIvfIndex(spark,
      emb.filter($"vec_id" % 11 === 5), "vec_id", s"$base/ivf")
    assert(spark.read.parquet(s"$base/ivf/vectors")
      .columns.contains("label"), "IVF delete dropped payload columns")
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"), $"label").collect().head
    val (qv, lab) = (q.getSeq[Double](0), q.getInt(1))
    assert(Similarity.searchIvfIndex(spark, s"$base/ivf", qv, k = 3,
      nProbe = 2, excludeId = 0L, where = Some(s"label = $lab"))
      .count() == 3L)
    Pq.buildIvfPqIndex(emb.filter($"vec_id" % 2 === 0), "vec_id",
      "embedding", nCells = 2, m = 4, kSub = 8, s"$base/pq",
      payloadCols = Seq("label"))
    Pq.appendToIvfPqIndex(emb.filter($"vec_id" % 2 =!= 0), "vec_id",
      "embedding", s"$base/pq")
    Pq.rebalanceIvfPqIndex(emb, "vec_id", "embedding", nCells = 2, m = 4,
      kSub = 8, s"$base/pq")
    assert(spark.read.parquet(s"$base/pq/codes")
      .columns.contains("label"), "IVFADC rebalance dropped payloads")
    assert(Pq.searchIvfPqIndex(spark, s"$base/pq", qv, k = 3, nProbe = 2,
      excludeId = 0L, where = Some(s"label = $lab")).count() == 3L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("searchBinaryIndex(where) == an unscoped search over an index " +
      "holding only the label rows (+ queries from the full store, so " +
      "a query outside its own scope still searches)") {
    val base = tmp("bin")
    Similarity.buildBinaryIndex(emb, "vec_id", "embedding", s"$base/full",
      payloadCols = Seq("label"))
    // query 0's label scopes; query 0 itself qualifies (same label)
    val lab = emb.filter($"vec_id" === 0).select($"label")
      .collect().head.getInt(0)
    Similarity.buildBinaryIndex(emb.filter($"label" === lab),
      "vec_id", "embedding", s"$base/scoped")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val got = snap(Similarity.searchBinaryIndex(spark, s"$base/full",
      queryIds = Seq(0L), k = 3, shortlist = 16,
      where = Some(s"label = $lab")))
    val want = snap(Similarity.searchBinaryIndex(spark, s"$base/scoped",
      queryIds = Seq(0L), k = 3, shortlist = 16))
    assert(got == want && got.nonEmpty, s"got $got want $want")
    // a query whose own label differs still searches (qv from the
    // full store): scope to a label the query does NOT carry
    val other = emb.filter($"label" =!= lab).select($"label")
      .collect().head.getInt(0)
    val cross = Similarity.searchBinaryIndex(spark, s"$base/full",
      queryIds = Seq(0L), k = 3, shortlist = 16,
      where = Some(s"label = $other"))
      .join(emb.select($"vec_id".as("id"), $"label"), "id")
      .collect()
    assert(cross.nonEmpty && cross.forall(_.getAs[Int]("label") == other),
      "cross-scope query must return only in-scope rows")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("searchIvfPqIndex(where) == ivfPqTopK over the label-restricted " +
      "corpus under the SAME stored model (encode is per-row, so " +
      "scoping moves candidates, never codes)") {
    val base = tmp("ivfpq")
    Pq.buildIvfPqIndex(emb, "vec_id", "embedding", nCells = 2, m = 4,
      kSub = 8, base, payloadCols = Seq("label"))
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"), $"label")
      .collect().head
    val (qv, lab) = (q.getSeq[Double](0), q.getInt(1))
    val got = Pq.searchIvfPqIndex(spark, base, qv, k = 5, nProbe = 2,
        excludeId = 0L, where = Some(s"label = $lab"))
      .select($"id").collect().map(_.getLong(0)).toSeq
    val ix = Pq.loadIvfPqModel(spark, base)
    val want = Pq.ivfPqTopK(emb.filter($"label" === lab),
        "vec_id", "embedding", queryId = 0L, k = 5, nProbe = 2, ix)
      .select($"id").collect().map(_.getLong(0)).toSeq
    assert(got == want && got.nonEmpty, s"got $got want $want")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
