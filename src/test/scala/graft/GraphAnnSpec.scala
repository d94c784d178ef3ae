package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphAnn, Similarity}

/** s14 graph ANN: exactness pins (full-beam ≡ brute force — the s11
  * nProbe=nCells precedent), recall on the planted-cluster fixture,
  * layout invariance of the deterministic construction, and the
  * persisted build/append/search lifecycle. */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  // 8 well-separated clusters of 32 vectors each (the JL fixture shape,
  // but with a WIDER in-cluster spread: cos ≈ 0.998-0.9999 in-cluster vs
  // exactly 0 cross-cluster — the 0.02-scale original collapsed every
  // in-cluster sim to 1.000000 at the 6-dp rounding, making top-k pure
  // id tie-breaks)
  private def cvec(c: Int, i: Long): Seq[Double] = {
    val v = Array.fill(64)(0.0)
    (8 * c until 8 * c + 8).foreach(d => v(d) = 1.0)
    v((8 * c + (i % 8)).toInt) += 0.2 * (((i * 7) % 13) - 6) / 13.0
    v.toSeq
  }
  private lazy val clustered = (0L until 256L).map(i =>
    (i, cvec((i % 8).toInt, i))).toDF("vec_id", "embedding")

  test("full beam (nSeeds = beamWidth = n) == exact knnJoin bit-for-bit") {
    val emb = Tables.load(spark, sf, "embeddings")
    val n = emb.count().toInt
    val qids = (0L until 5L).toSeq
    val edges = GraphAnn.knnGraph(emb, "vec_id", "embedding",
      k = 4, nBuckets = 8, iters = 1)
    val got = GraphAnn.searchGraph(edges, emb, "vec_id", "embedding",
      qids, k = 5, beamWidth = n, hops = 1, nSeeds = n)
      .orderBy($"qid", $"rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exact = Similarity.knnJoin(emb, "vec_id", "embedding", qids, 5)
      .orderBy($"qid", $"rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == exact.toSeq)
  }

  test("recall@10 >= 0.9 on the planted-cluster fixture at a " +
      "production-shaped beam (12 << n), and the graph respects the " +
      "degree bound") {
    val edges = GraphAnn.knnGraph(clustered, "vec_id", "embedding",
      k = 8, nBuckets = 16, iters = 2)
    val deg = edges.groupBy($"id").count().agg(max($"count")).head.getLong(0)
    assert(deg <= 8, s"degree $deg exceeds k")
    val qids = (0L until 8L).toSeq // one query per cluster
    val got = GraphAnn.searchGraph(edges, clustered, "vec_id", "embedding",
      qids, k = 10, beamWidth = 12, hops = 3, nSeeds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val recalls = qids.map { q =>
      val exact = Similarity.bruteForceTopK(clustered, "vec_id", "embedding",
        q, 10).collect().map(_.getLong(0)).toSet
      got(q).intersect(exact).size.toDouble / exact.size
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"avg recall $avg (per-query: $recalls)")
  }

  test("searchGraphFast kernel == stage-form searchGraph bit-for-bit " +
      "(clustered fixture AND the real embeddings table), and falls " +
      "back over the broadcast gate with identical results") {
    val emb = Tables.load(spark, sf, "embeddings")
    for ((df, qn) <- Seq((clustered, 6), (emb, 4))) {
      val edges = GraphAnn.knnGraph(df, "vec_id", "embedding",
        k = 6, nBuckets = 16, iters = 2)
      val qids = (0L until qn.toLong).toSeq
      def run(fast: Boolean, gate: Long) =
        (if (fast) GraphAnn.searchGraphFast(edges, df, "vec_id", "embedding",
            qids, 5, 12, 3, 8, maxKernelElems = gate)
         else GraphAnn.searchGraph(edges, df, "vec_id", "embedding",
            qids, 5, 12, 3, 8))
          .orderBy($"qid", $"rk").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
          .toSeq
      val stage = run(fast = false, 0)
      assert(run(fast = true, 1L << 25) == stage, "kernel != stage form")
      // a gate of 1 forces the distributed fallback
      assert(run(fast = true, 1) == stage, "fallback != stage form")
    }
  }

  test("construction is layout-invariant: knnGraph on a repartitioned " +
      "input yields the identical edge set") {
    val e1 = GraphAnn.knnGraph(clustered, "vec_id", "embedding",
      k = 6, nBuckets = 16, iters = 1)
      .orderBy($"id", $"nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val e2 = GraphAnn.knnGraph(clustered.repartition(7), "vec_id",
      "embedding", k = 6, nBuckets = 16, iters = 1)
      .orderBy($"id", $"nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(e1 == e2)
  }

  test("streaming ingest: a streamed batch's points become searchable " +
      "and find their planted twins; a checkpointed replay appends " +
      "nothing observable") {
    val base = s"/tmp/graft_graphann_stream/${System.nanoTime()}"
    GraphAnn.buildGraphIndex(clustered, "vec_id", "embedding",
      k = 8, nBuckets = 16, iters = 2, path = s"$base/idx")
    val batch = Seq(1000L, 1001L).map { id =>
      val v = Array.fill(64)(0.0)
      (24 until 32).foreach(d => v(d) = 1.0)
      v(24) += 0.4
      v(24 + (id % 8).toInt) += 0.001
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
    batch.write.parquet(s"$base/feed")
    streaming.Streams.graphAnnIngest(spark, s"$base/feed", batch,
      "vec_id", "embedding", s"$base/idx", s"$base/ckpt")
    def search() = GraphAnn.searchGraphIndex(spark, s"$base/idx",
      Seq(1000L), k = 5, beamWidth = 12, hops = 3, nSeeds = 8)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val got = search()
    assert(got.map(_._2).contains(1001L), s"twin not found: $got")
    // checkpointed replay: the drained feed appends nothing observable
    streaming.Streams.graphAnnIngest(spark, s"$base/feed", batch,
      "vec_id", "embedding", s"$base/idx", s"$base/ckpt")
    assert(search() == got)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("persisted lifecycle: search == in-memory; appended points are " +
      "immediately searchable and find their planted twin; a replayed " +
      "append changes nothing; missing index fails fast") {
    val base = s"/tmp/graft_graphann_spec/${System.nanoTime()}"
    GraphAnn.buildGraphIndex(clustered, "vec_id", "embedding",
      k = 8, nBuckets = 16, iters = 2, path = s"$base/idx")
    val qids = (0L until 4L).toSeq
    def stored() = GraphAnn.searchGraphIndex(spark, s"$base/idx", qids,
      k = 5, beamWidth = 12, hops = 3, nSeeds = 8)
      .orderBy($"qid", $"rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val mem = {
      val edges = GraphAnn.knnGraph(clustered, "vec_id", "embedding",
        k = 8, nBuckets = 16, iters = 2)
      GraphAnn.searchGraph(edges, clustered, "vec_id", "embedding", qids,
        k = 5, beamWidth = 12, hops = 3, nSeeds = 8)
        .orderBy($"qid", $"rk").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    }
    assert(stored() == mem)
    // planted twins near cluster 3: a shared +0.4 offset keeps the pair
    // distinctly closer to each other (cos ≈ 1.0) than to any cluster-3
    // member (cos ≈ 0.992) at 6-dp rounding
    val batch = Seq(1000L, 1001L).map { id =>
      val v = Array.fill(64)(0.0)
      (24 until 32).foreach(d => v(d) = 1.0)
      v(24) += 0.4
      v(24 + (id % 8).toInt) += 0.001
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
    GraphAnn.appendToGraphIndex(batch, "vec_id", "embedding", s"$base/idx")
    val after = GraphAnn.searchGraphIndex(spark, s"$base/idx", Seq(1000L),
      k = 5, beamWidth = 12, hops = 3, nSeeds = 8).collect()
      .map(r => r.getLong(2)).toSet
    assert(after.contains(1001L),
      s"planted twin not found from appended node: $after")
    // the twin pair sits in cluster 3 — its neighbors should too
    assert(after.forall(id => id == 1001L || id % 8 == 3), after.toString)
    // replayed append: a BYTE-LEVEL no-op (the batch anti-joins against
    // stored node ids, so nothing is searched, appended, or self-looped)
    val before = stored()
    val nodesBefore = spark.read.parquet(s"$base/idx/nodes").count()
    val edgesBefore = spark.read.parquet(s"$base/idx/edges").count()
    GraphAnn.appendToGraphIndex(batch, "vec_id", "embedding", s"$base/idx")
    assert(spark.read.parquet(s"$base/idx/nodes").count() == nodesBefore,
      "replayed append re-wrote node rows")
    assert(spark.read.parquet(s"$base/idx/edges").count() == edgesBefore,
      "replayed append re-wrote edge rows")
    val selfLoops = spark.read.parquet(s"$base/idx/edges")
      .filter($"id" === $"nbr").count()
    assert(selfLoops == 0, s"$selfLoops self-loop edges in the store")
    assert(stored() == before)
    val err = intercept[IllegalArgumentException] {
      GraphAnn.searchGraphIndex(spark, s"$base/nowhere", Seq(0L), 5, 12, 3, 8)
    }
    assert(err.getMessage.contains("buildGraphIndex"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("rebalanceGraphIndex: a fresh descent over the accumulated set " +
      "equals a from-scratch build bit-for-bit, and restores the " +
      "in-mode edges an appended mode cannot have") {
    val base = s"/tmp/graft_graphann_rb/${System.nanoTime()}"
    GraphAnn.buildGraphIndex(clustered, "vec_id", "embedding",
      k = 8, nBuckets = 16, iters = 2, path = s"$base/idx")
    // an appended MODE the build never saw: overlaps clusters 0 and 4
    // (cos ≈ 0.5 to each) while in-mode cos ≈ 1
    def dvec(i: Long): Seq[Double] = {
      val v = Array.fill(64)(0.0)
      (0 until 4).foreach(d => v(d) = 1.0)
      (32 until 36).foreach(d => v(d) = 1.0)
      v((i % 4).toInt) += 0.2 * (((i * 7) % 13) - 6) / 13.0
      v.toSeq
    }
    val drift = (1000L until 1024L).map(i => (i, dvec(i)))
      .toDF("vec_id", "embedding")
    GraphAnn.appendToGraphIndex(drift, "vec_id", "embedding", s"$base/idx")
    // every appended point's edges were beam-found over the graph AS IT
    // WAS (base nodes only) — the mode has ZERO in-mode edges, the
    // drift this operator exists to repair
    assert(spark.read.parquet(s"$base/idx/edges")
      .filter($"id" >= 1000L && $"nbr" >= 1000L).count() == 0L)
    val all = clustered.union(drift)
    def inModeRecall(): Double = {
      val qids = (1000L until 1008L).toSeq
      val got = GraphAnn.searchGraphIndex(spark, s"$base/idx", qids,
        k = 10, beamWidth = 12, hops = 3, nSeeds = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(2))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
      val rs = qids.map { q =>
        val exact = Similarity.bruteForceTopK(all, "vec_id", "embedding",
          q, 10).collect().map(_.getLong(0)).toSet
        got.getOrElse(q, Set.empty[Long]).intersect(exact).size.toDouble / 10.0
      }
      rs.sum / rs.size
    }
    val pre = inModeRecall()
    info(s"pre-rebalance in-mode recall@10: $pre")
    GraphAnn.rebalanceGraphIndex(spark, s"$base/idx")
    // rebalance ≡ from-scratch build on the accumulated set (knnGraph
    // is layout-invariant — pinned above)
    GraphAnn.buildGraphIndex(all, "vec_id", "embedding",
      k = 8, nBuckets = 16, iters = 2, path = s"$base/fresh")
    def snap(p: String) = (
      spark.read.parquet(s"$p/nodes").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq,
      spark.read.parquet(s"$p/edges").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq)
    assert(snap(s"$base/idx") == snap(s"$base/fresh"),
      "rebalance must equal a from-scratch build on the same set")
    // the fresh descent gives the mode its own neighborhood
    assert(spark.read.parquet(s"$base/idx/edges")
      .filter($"id" >= 1000L && $"nbr" >= 1000L).count() > 0L)
    val post = inModeRecall()
    info(s"post-rebalance in-mode recall@10: $post")
    assert(post >= 0.9 && post >= pre,
      s"rebalance must restore in-mode recall: $pre -> $post")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("repairGraphIndex: LOCAL descent around the appended mode " +
      "restores in-mode recall >= 0.9 (the drift fixture), rewires " +
      "ONLY the frontier — every non-frontier node's adjacency is " +
      "byte-untouched — and fails fast on unknown ids") {
    val base = s"/tmp/graft_graphann_rep/${System.nanoTime()}"
    GraphAnn.buildGraphIndex(clustered, "vec_id", "embedding",
      k = 8, nBuckets = 16, iters = 2, path = s"$base/idx")
    def dvec(i: Long): Seq[Double] = {
      val v = Array.fill(64)(0.0)
      (0 until 4).foreach(d => v(d) = 1.0)
      (32 until 36).foreach(d => v(d) = 1.0)
      v((i % 4).toInt) += 0.2 * (((i * 7) % 13) - 6) / 13.0
      v.toSeq
    }
    val drift = (1000L until 1024L).map(i => (i, dvec(i)))
      .toDF("vec_id", "embedding")
    GraphAnn.appendToGraphIndex(drift, "vec_id", "embedding", s"$base/idx")
    assert(spark.read.parquet(s"$base/idx/edges")
      .filter($"id" >= 1000L && $"nbr" >= 1000L).count() == 0L)
    val all = clustered.union(drift)
    def inModeRecall(): Double = {
      val qids = (1000L until 1008L).toSeq
      val got = GraphAnn.searchGraphIndex(spark, s"$base/idx", qids,
        k = 10, beamWidth = 12, hops = 3, nSeeds = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(2))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
      val rs = qids.map { q =>
        val exact = Similarity.bruteForceTopK(all, "vec_id", "embedding",
          q, 10).collect().map(_.getLong(0)).toSet
        got.getOrElse(q, Set.empty[Long]).intersect(exact).size.toDouble / 10.0
      }
      rs.sum / rs.size
    }
    val pre = inModeRecall()
    // the frontier = mode + its stored 1-hop neighborhood; capture a
    // NON-frontier node's adjacency to prove repair never touches it
    val edges0 = spark.read.parquet(s"$base/idx/edges")
    val frontierIds = edges0
      .filter($"id" >= 1000L || $"nbr" >= 1000L)
      .select(explode(array($"id", $"nbr")).as("f"))
      .distinct().collect().map(_.getLong(0)).toSet
    val outsider = (0L until 1000L).find(!frontierIds.contains(_)).get
    def adjOf(id: Long) = spark.read.parquet(s"$base/idx/edges")
      .filter($"id" === id).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val adjBefore = adjOf(outsider)
    GraphAnn.repairGraphIndex(spark, s"$base/idx", drift.select($"vec_id"),
      "vec_id")
    assert(adjOf(outsider) == adjBefore,
      s"repair rewired non-frontier node $outsider")
    // the localized descent gives the mode its own neighborhood
    assert(spark.read.parquet(s"$base/idx/edges")
      .filter($"id" >= 1000L && $"nbr" >= 1000L).count() > 0L)
    val post = inModeRecall()
    info(s"repair in-mode recall@10: $pre -> $post")
    assert(post >= 0.9 && post >= pre,
      s"local repair must restore in-mode recall: $pre -> $post")
    val e = intercept[IllegalArgumentException] {
      GraphAnn.repairGraphIndex(spark, s"$base/idx",
        Seq(424242L).toDF("vec_id"), "vec_id")
    }
    assert(e.getMessage.contains("not in the store"), e.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("appendToGraphIndex fails fast over maxAppendBatch — the " +
      "bounded driver-pull gate (the limit caps the pull itself)") {
    val base = s"/tmp/graft_graphann_gate/${System.nanoTime()}"
    GraphAnn.buildGraphIndex(clustered, "vec_id", "embedding",
      k = 4, nBuckets = 8, iters = 1, path = s"$base/idx")
    val big = spark.range(10000L, 10000L + GraphAnn.maxAppendBatch + 1L)
      .select($"id".as("vec_id"),
        array(lit(1.0), lit(2.0)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      GraphAnn.appendToGraphIndex(big, "vec_id", "embedding", s"$base/idx")
    }
    assert(e.getMessage.contains("maxAppendBatch"), e.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("degenerate zero-norm vector: REJECTED on both paths — the " +
      "stage form aborts in the ANSI cosine (divide-by-zero), the " +
      "kernel build fails fast naming the id (never a " +
      "NumberFormatException mid-traversal)") {
    val withZero = clustered
      .union(Seq((999L, Seq.fill(64)(0.0))).toDF("vec_id", "embedding"))
    // stage form: construction aborts in the cosine's ANSI division
    intercept[Exception] {
      GraphAnn.knnGraph(withZero, "vec_id", "embedding",
        k = 6, nBuckets = 16, iters = 1).collect()
    }
    // kernel build: explicit fail-fast with the offending id
    val edges = GraphAnn.knnGraph(clustered, "vec_id", "embedding",
      k = 6, nBuckets = 16, iters = 1)
    val e = intercept[IllegalArgumentException] {
      GraphAnn.kernelIndex(edges, withZero, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("zero-norm") &&
      e.getMessage.contains("999"), e.getMessage)
  }
}
