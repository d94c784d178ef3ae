package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, GraphAnn, Pq, Similarity}

/** The DELETE/takedown half of every persisted index and store
  * (round-17 verdict item 1): delete(X) ≡ rebuild-without-X where the
  * artifact is per-row pure (LSH buckets, signature chunks, binary
  * codes), delete + rebalance ≡ rebuild-on-survivors where a fitted
  * model is kept (IVF, IVFADC, graph), EXACT retraction for the
  * batch-stamped count stores, and unknown-id/batch fail-fasts
  * everywhere (a takedown must never silently half-apply). */
class DeleteLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    s"/tmp/graft_delspec/${tag}_${System.nanoTime()}"

  private def snap(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("deleteFromLshIndex: delete(X) == build-on-survivors bit-for-bit " +
      "on the buckets table; unknown ids fail fast") {
    val base = tmp("lsh")
    val del = docs.filter($"doc_id" % 8 === 1)
    Dedup.buildLshIndex(docs, "doc_id", "text", 16, 2, s"$base/a")
    Dedup.deleteFromLshIndex(spark, del, "doc_id", s"$base/a")
    Dedup.buildLshIndex(docs.filter($"doc_id" % 8 =!= 1), "doc_id", "text",
      16, 2, s"$base/b")
    assert(snap(spark.read.parquet(s"$base/a/buckets")) ==
      snap(spark.read.parquet(s"$base/b/buckets")),
      "deleted index != rebuilt-on-survivors")
    // replaying the SAME delete: the ids are gone -> loud abort, not a
    // silent "success" (the takedown-typo guard)
    val e = intercept[IllegalArgumentException] {
      Dedup.deleteFromLshIndex(spark, del, "doc_id", s"$base/a")
    }
    assert(e.getMessage.contains("not in the store"), e.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("takedownIngest: the streamed takedown feed == the batch delete " +
      "bit-for-bit; ensure-absent skips already-gone and never-indexed " +
      "ids (no deadlock on redelivery); drained replay is a no-op") {
    val base = tmp("tdstream")
    val sub = docs.filter($"doc_id" % 4 < 2)
    Dedup.buildLshIndex(sub, "doc_id", "text", 16, 2, s"$base/st")
    Dedup.buildLshIndex(sub, "doc_id", "text", 16, 2, s"$base/ba")
    // three feed batches: (0) some indexed ids; (1) REDELIVERY of batch
    // 0's ids + fresh ones + a NEVER-indexed id (9_999_999); (2) only
    // already-absent ids — an all-absent batch
    val b0 = sub.filter($"doc_id" % 8 === 1).select($"doc_id")
    val b1 = sub.filter(($"doc_id" % 8).isin(1L, 5L)).select($"doc_id")
      .union(Seq(9999999L).toDF("doc_id"))
    graft.streaming.Streams.stageFeedChunks(Seq(b0, b1, b0),
      s"$base/feed")
    graft.streaming.Streams.takedownIngest(spark, s"$base/feed",
      docs.select($"doc_id"), "doc_id", s"$base/st", s"$base/ckpt")
    // batch API equivalent: one strict delete of the union of INDEXED ids
    Dedup.deleteFromLshIndex(spark,
      sub.filter(($"doc_id" % 8).isin(1L, 5L)), "doc_id", s"$base/ba")
    assert(snap(spark.read.parquet(s"$base/st/buckets")) ==
      snap(spark.read.parquet(s"$base/ba/buckets")),
      "streamed takedown != batch delete")
    // drained replay: same checkpoint, no new files -> nothing happens
    val before = snap(spark.read.parquet(s"$base/st/buckets"))
    graft.streaming.Streams.takedownIngest(spark, s"$base/feed",
      docs.select($"doc_id"), "doc_id", s"$base/st", s"$base/ckpt")
    assert(snap(spark.read.parquet(s"$base/st/buckets")) == before,
      "drained replay changed the index")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("deleteFromSigIndex: delete == build-on-survivors bit-for-bit; " +
      "partial-overlap delete lists abort before touching the store") {
    val base = tmp("sig")
    val sig = docs.limit(40)
      .select($"doc_id".as("id"), ($"doc_id" * 7919L % 100000L).as("sh"))
    Dedup.buildSigIndex(sig, "k", s"$base/a")
    Dedup.deleteFromSigIndex(spark, sig.filter($"id" % 5 === 0), "id",
      s"$base/a")
    Dedup.buildSigIndex(sig.filter($"id" % 5 =!= 0), "k", s"$base/b")
    assert(snap(spark.read.parquet(s"$base/a/chunks")) ==
      snap(spark.read.parquet(s"$base/b/chunks")))
    val before = snap(spark.read.parquet(s"$base/a/chunks"))
    val e = intercept[IllegalArgumentException] {
      // one known survivor + one already-deleted id -> abort whole
      Dedup.deleteFromSigIndex(spark,
        Seq(1L, 5L).toDF("id"), "id", s"$base/a")
    }
    assert(e.getMessage.contains("not in the store"), e.getMessage)
    assert(snap(spark.read.parquet(s"$base/a/chunks")) == before,
      "an aborted delete must leave the store untouched")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("takedownIngestSig: the streamed feed == the batch sig delete " +
      "bit-for-bit through the shared ensure-absent core") {
    val base = tmp("tdsig")
    val sig = docs.limit(40)
      .select($"doc_id".as("id"), ($"doc_id" * 7919L % 100000L).as("sh"))
    Dedup.buildSigIndex(sig, "k", s"$base/st")
    Dedup.buildSigIndex(sig, "k", s"$base/ba")
    // batch 0 deletes %5==0; batch 1 redelivers them + a never-indexed id
    graft.streaming.Streams.stageFeedChunks(Seq(
      sig.filter($"id" % 5 === 0).select($"id"),
      sig.filter($"id" % 5 === 0).select($"id")
        .union(Seq(424242L).toDF("id"))),
      s"$base/feed")
    graft.streaming.Streams.takedownIngestSig(spark, s"$base/feed",
      sig.select($"id"), "id", s"$base/st", s"$base/ckpt")
    Dedup.deleteFromSigIndex(spark, sig.filter($"id" % 5 === 0), "id",
      s"$base/ba")
    assert(snap(spark.read.parquet(s"$base/st/chunks")) ==
      snap(spark.read.parquet(s"$base/ba/chunks")),
      "streamed sig takedown != batch delete")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("takedownIngestBinary: the streamed feed == the batch binary " +
      "delete bit-for-bit through the shared ensure-absent core") {
    val base = tmp("tdbin")
    Similarity.buildBinaryIndex(emb, "vec_id", "embedding", s"$base/st")
    Similarity.buildBinaryIndex(emb, "vec_id", "embedding", s"$base/ba")
    graft.streaming.Streams.stageFeedChunks(Seq(
      emb.filter($"vec_id" % 9 === 2).select($"vec_id"),
      emb.filter($"vec_id" % 9 === 2).select($"vec_id")
        .union(Seq(8888888L).toDF("vec_id"))),
      s"$base/feed")
    graft.streaming.Streams.takedownIngestBinary(spark, s"$base/feed",
      emb.select($"vec_id"), "vec_id", s"$base/st", s"$base/ckpt")
    Similarity.deleteFromBinaryIndex(spark,
      emb.filter($"vec_id" % 9 === 2), "vec_id", s"$base/ba")
    assert(snap(spark.read.parquet(s"$base/st/codes")) ==
      snap(spark.read.parquet(s"$base/ba/codes")),
      "streamed binary takedown != batch delete")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("deleteFromBinaryIndex: delete == build-on-survivors bit-for-bit " +
      "(codes are per-row pure)") {
    val base = tmp("bin")
    Similarity.buildBinaryIndex(emb, "vec_id", "embedding", s"$base/a")
    Similarity.deleteFromBinaryIndex(spark,
      emb.filter($"vec_id" % 7 === 0), "vec_id", s"$base/a")
    Similarity.buildBinaryIndex(emb.filter($"vec_id" % 7 =!= 0),
      "vec_id", "embedding", s"$base/b")
    assert(snap(spark.read.parquet(s"$base/a/codes")) ==
      snap(spark.read.parquet(s"$base/b/codes")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("deleteFromIvfIndex: vectors == stored minus X, centroids KEPT " +
      "(the append maintenance contract), searches never return a " +
      "deleted id, and delete+rebalance == build-on-survivors") {
    val base = tmp("ivf")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", 4, s"$base/a")
    val centsBefore = snap(spark.read.parquet(s"$base/a/centroids"))
    val vecsBefore = spark.read.parquet(s"$base/a/vectors")
      .filter($"id" % 5 =!= 3)
    val wantVecs = snap(vecsBefore)
    Similarity.deleteFromIvfIndex(spark,
      emb.filter($"vec_id" % 5 === 3), "vec_id", s"$base/a")
    assert(snap(spark.read.parquet(s"$base/a/centroids")) == centsBefore,
      "delete must not touch the fitted centroids")
    assert(snap(spark.read.parquet(s"$base/a/vectors")) == wantVecs,
      "vectors != stored minus X")
    val qv = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .collect().head.getSeq[Double](0)
    val hits = Similarity.searchIvfIndex(spark, s"$base/a", qv, 50, 4)
      .select($"id").collect().map(_.getLong(0))
    assert(hits.forall(_ % 5 != 3), "a deleted id surfaced in search")
    // the restore path: rebalance refits deterministically, so
    // delete-then-rebalance == a from-scratch build on the survivors
    Similarity.rebalanceIvfIndex(spark, s"$base/a", 4)
    Similarity.buildIvfIndex(emb.filter($"vec_id" % 5 =!= 3),
      "vec_id", "embedding", 4, s"$base/b")
    assert(snap(spark.read.parquet(s"$base/a/centroids")) ==
      snap(spark.read.parquet(s"$base/b/centroids")))
    assert(snap(spark.read.parquet(s"$base/a/vectors")) ==
      snap(spark.read.parquet(s"$base/b/vectors")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("deleteFromIvfPqIndex: codes == stored minus X under the KEPT " +
      "model, and delete+rebalance(survivors) == build-on-survivors") {
    val base = tmp("ivfpq")
    Pq.buildIvfPqIndex(emb, "vec_id", "embedding", 4, 4, 8, s"$base/a")
    val coarseBefore = snap(spark.read.parquet(s"$base/a/coarse"))
    val booksBefore = snap(spark.read.parquet(s"$base/a/books"))
    val want = snap(spark.read.parquet(s"$base/a/codes")
      .filter($"id" % 6 =!= 2))
    Pq.deleteFromIvfPqIndex(spark, emb.filter($"vec_id" % 6 === 2),
      "vec_id", s"$base/a")
    assert(snap(spark.read.parquet(s"$base/a/coarse")) == coarseBefore &&
      snap(spark.read.parquet(s"$base/a/books")) == booksBefore,
      "delete must not touch the fitted model")
    assert(snap(spark.read.parquet(s"$base/a/codes")) == want)
    val survivors = emb.filter($"vec_id" % 6 =!= 2)
    Pq.rebalanceIvfPqIndex(survivors, "vec_id", "embedding", 4, 4, 8,
      s"$base/a")
    Pq.buildIvfPqIndex(survivors, "vec_id", "embedding", 4, 4, 8,
      s"$base/b")
    Seq("coarse", "books", "codes").foreach { part =>
      assert(snap(spark.read.parquet(s"$base/a/$part")) ==
        snap(spark.read.parquet(s"$base/b/$part")), s"$part diverged")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("deleteFromGraphIndex: nodes minus X, NO surviving edge touches " +
      "a deleted id, searches never return one, and rebalance restores " +
      "the full rebuild (delete is prune-only by contract)") {
    val base = tmp("graph")
    GraphAnn.buildGraphIndex(emb, "vec_id", "embedding", k = 4,
      nBuckets = 8, iters = 2, s"$base/a")
    GraphAnn.deleteFromGraphIndex(spark,
      emb.filter($"vec_id" % 9 === 4), "vec_id", s"$base/a")
    val nodes = spark.read.parquet(s"$base/a/nodes")
      .select($"id").collect().map(_.getLong(0))
    assert(nodes.nonEmpty && nodes.forall(_ % 9 != 4))
    val edges = spark.read.parquet(s"$base/a/edges")
      .select($"id", $"nbr").collect()
    assert(edges.forall(r => r.getLong(0) % 9 != 4 && r.getLong(1) % 9 != 4),
      "an edge still touches a deleted id")
    val got = GraphAnn.searchGraphFast(
      spark.read.parquet(s"$base/a/edges"),
      spark.read.parquet(s"$base/a/nodes"), "id", "v",
      queryIds = nodes.take(3).toSeq, k = 3, beamWidth = 8, hops = 3,
      nSeeds = 4)
      .select($"id").collect().map(_.getLong(0))
    assert(got.forall(_ % 9 != 4), "a deleted id surfaced in search")
    GraphAnn.rebalanceGraphIndex(spark, s"$base/a")
    GraphAnn.buildGraphIndex(emb.filter($"vec_id" % 9 =!= 4),
      "vec_id", "embedding", k = 4, nBuckets = 8, iters = 2, s"$base/b")
    Seq("nodes", "edges").foreach { part =>
      assert(snap(spark.read.parquet(s"$base/a/$part")) ==
        snap(spark.read.parquet(s"$base/b/$part")), s"$part diverged")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("retractFromClusterState: retract == rebuild-without-X EXACTLY, " +
      "including the BRIDGE SPLIT no label-only rewrite can compute") {
    val base = tmp("cluster")
    // A(1)-B(2)-C(3): B bridges; 4 is a singleton
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    Dedup.buildClusterState(nodes, "id", pairs, s"$base/st")
    // pre-retract: one {1,2,3} cluster labeled 1
    val before = spark.read.parquet(s"$base/st/clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L), before)
    Dedup.retractFromClusterState(Seq(2L).toDF("id"), "id", pairs,
      s"$base/st")
    val after = spark.read.parquet(s"$base/st/clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the bridge is gone: 1 and 3 SPLIT into their own components
    assert(after == Map(1L -> 1L, 3L -> 3L, 4L -> 4L), after.toString)
    val e = intercept[IllegalArgumentException] {
      Dedup.retractFromClusterState(Seq(99L).toDF("id"), "id", pairs,
        s"$base/st")
    }
    assert(e.getMessage.contains("not in the store"), e.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("retractCensusBatch / retractCmsBatch: retract == a store that " +
      "never ingested the batch, bit-for-bit on cells; unknown batch " +
      "ids fail fast") {
    val base = tmp("counts")
    val li = Tables.load(spark, sf, "lineitem")
    operators.Quantiles.buildCensusStore(li.filter($"l_orderkey" % 2 === 0),
      Seq("l_returnflag"), "l_quantity", s"$base/qa")
    operators.Quantiles.appendToCensusStore(
      li.filter($"l_orderkey" % 2 === 1), s"$base/qa", batchId = 1L)
    operators.Quantiles.retractCensusBatch(spark, s"$base/qa", 1L)
    operators.Quantiles.buildCensusStore(li.filter($"l_orderkey" % 2 === 0),
      Seq("l_returnflag"), "l_quantity", s"$base/qb")
    assert(snap(spark.read.parquet(s"$base/qa/cells")) ==
      snap(spark.read.parquet(s"$base/qb/cells")))
    val eq = intercept[IllegalArgumentException] {
      operators.Quantiles.retractCensusBatch(spark, s"$base/qa", 7L)
    }
    assert(eq.getMessage.contains("never ingested"), eq.getMessage)
    val d = docs.limit(60)
    operators.Cms.buildCmsStore(d.filter($"doc_id" % 2 === 0), "text",
      4, 16, s"$base/ca")
    operators.Cms.appendToCmsStore(d.filter($"doc_id" % 2 === 1), "text",
      s"$base/ca", batchId = 1L)
    operators.Cms.retractCmsBatch(spark, s"$base/ca", 1L)
    operators.Cms.buildCmsStore(d.filter($"doc_id" % 2 === 0), "text",
      4, 16, s"$base/cb")
    assert(snap(spark.read.parquet(s"$base/ca/cells")) ==
      snap(spark.read.parquet(s"$base/cb/cells")))
    val ec = intercept[IllegalArgumentException] {
      operators.Cms.retractCmsBatch(spark, s"$base/ca", 7L)
    }
    assert(ec.getMessage.contains("never ingested"), ec.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
