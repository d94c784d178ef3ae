package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** Product quantization: codebook fit, encoding, ADC scoring.
  * Pins the s07 semantics — per-subspace L2 Lloyd codebooks, argmin
  * codes with the lowest-index tie rule, and the ADC distance as the
  * exact left-associated table-lookup sum. */
class PqSpec extends SparkSpec {

  private val M = 4; private val KSub = 8; private val Iters = 2

  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private lazy val books =
    Pq.fitCodebooks(emb, "vec_id", "embedding", M, KSub, Iters)
  private lazy val encoded = Pq.encode(emb, "vec_id", "embedding", books)
    .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getSeq[Int](2)))

  test("codebooks: m subspaces of kSub centroids, dsub dims each") {
    assert(books.length == M)
    books.foreach { b =>
      assert(b.length == KSub)
      assert(b.map(_._1).toSeq == (0 until KSub))
      b.foreach { case (_, cv) => assert(cv.length == 64 / M) }
    }
  }

  test("codes match a local argmin-L2 recompute (lowest index on ties)") {
    val dsub = 64 / M
    assert(encoded.nonEmpty)
    encoded.foreach { case (_, v, codes) =>
      assert(codes.length == M)
      codes.zipWithIndex.foreach { case (c, s) =>
        val sub = v.slice(s * dsub, (s + 1) * dsub)
        val dists = books(s).map { case (_, cv) => Pq.dist2Local(sub, cv) }
        val want = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        assert(c == want, s"subspace $s")
        assert(c >= 0 && c < KSub)
      }
    }
  }

  test("ADC distance is exactly the per-subspace table-lookup sum") {
    val dsub = 64 / M
    val qv = encoded.find(_._1 == 0L).get._2
    val adc = Pq.encode(emb, "vec_id", "embedding", books)
      .select(col("id"), Pq.adcDistance(col("codes"), qv, books).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    encoded.foreach { case (id, _, codes) =>
      val want = (0 until M).map { s =>
        Pq.dist2Local(qv.slice(s * dsub, (s + 1) * dsub), books(s)(codes(s))._2)
      }.reduceLeft(_ + _)
      assert(adc(id) == want, s"id $id") // bitwise: same IEEE chain
    }
  }

  test("ADC approximates the true distance within quantization error") {
    // ADC(x) = d²(q, reconstruction(x)); it must correlate with the true
    // distance: over all rows, |adc - d²(q,v)| is bounded by the worst
    // reconstruction error (loose structural sanity, not a tight bound)
    val qv = encoded.find(_._1 == 0L).get._2
    val dsub = 64 / M
    val errs = encoded.filter(_._1 != 0L).map { case (_, v, codes) =>
      val recon = (0 until M).flatMap(s => books(s)(codes(s))._2)
      val adc = (0 until M).map { s =>
        Pq.dist2Local(qv.slice(s * dsub, (s + 1) * dsub), books(s)(codes(s))._2)
      }.sum
      val reconD = Pq.dist2Local(qv, recon)
      math.abs(adc - reconD)
    }
    // ADC distance IS the distance to the reconstruction (up to FP
    // association) — the defining PQ identity
    assert(errs.max < 1e-9)
  }

  test("ADC shortlist recall, and shortlist+rerank recovers the exact " +
      "top-k (the production search shape)") {
    val k = 10
    val qv = encoded.find(_._1 == 0L).get._2
    val exact = encoded.filter(_._1 != 0L)
      .map { case (id, v, _) => (id, Pq.dist2Local(qv, v)) }
      .sortBy { case (d1, d2) => (d2, d1) }.take(k).map(_._1).toSet
    // pure ADC ordering is distortion-bounded — its value is the
    // SHORTLIST: the top-50 ADC candidates must hold a usable share of
    // the true neighbors even under the coarse 4x8 oracle codebook
    // (measured 0.5 on this corpus; floor leaves regeneration margin)
    val short50 = Pq.adcTopK(emb, "vec_id", "embedding", 0L, 50, M, KSub,
        Iters, Some(books)).collect().map(_.getLong(0)).toSet
    val sRecall = (exact & short50).size.toDouble / k
    info(s"shortlist@50 recall of exact top-$k = $sRecall")
    assert(sRecall >= 0.3, s"shortlist recall $sRecall")
    // the deployment form: finer m=8 codebook, ADC shortlist@100 →
    // exact rerank → near-exact top-k reading only 100 float vectors
    // (measured: shortlist@100 holds 10/10 true neighbors here)
    val books8 = Pq.fitCodebooks(emb, "vec_id", "embedding", 8, 8, Iters)
    val rer = Pq.adcRerankTopK(emb, "vec_id", "embedding", 0L, k,
        shortlist = 100, m = 8, kSub = 8, Iters, Some(books8))
      .collect().map(_.getLong(0)).toSet
    val rRecall = (exact & rer).size.toDouble / k
    info(s"rerank recall@$k = $rRecall")
    assert(rRecall >= 0.8, s"rerank recall $rRecall")
  }

  test("appending the full vector path is never read by ADC scoring") {
    // the ADC score column depends only on `codes` — projecting it away
    // from the float vector must still resolve (the 100 TB contract:
    // PQ scans codes, not floats)
    val qv = encoded.find(_._1 == 0L).get._2
    val codesOnly = Pq.encode(emb, "vec_id", "embedding", books)
      .select(col("id"), col("codes"))
    val scored = codesOnly
      .select(col("id"), Pq.adcDistance(col("codes"), qv, books).as("adc"))
    assert(scored.count() == encoded.length)
  }

  test("fitCodebooks rejects a dimension not divisible by m") {
    intercept[IllegalArgumentException] {
      Pq.fitCodebooks(emb, "vec_id", "embedding", m = 7, KSub, 0)
    }
  }

  test("ivfPq: encode emits (id, cell, codes) only — floats never " +
      "persist — with every code and cell in range") {
    val ix = Pq.fitIvfPq(emb, "vec_id", "embedding",
      nCells = 8, m = M, kSub = KSub)
    val enc = Pq.encodeIvfPq(emb, "vec_id", "embedding", ix)
    assert(enc.columns.toSeq == Seq("id", "cell", "codes"))
    val rows = enc.collect()
    assert(rows.length == encoded.length)
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < 8)
      val cs = r.getSeq[Int](2)
      assert(cs.length == M && cs.forall(c => c >= 0 && c < KSub))
    }
  }

  test("ivfPq: residual quantization distorts no more than raw PQ, and " +
      "the probed search returns k ranked rows without the query") {
    val ix = Pq.fitIvfPq(emb, "vec_id", "embedding",
      nCells = 8, m = M, kSub = KSub)
    val qv = encoded.find(_._1 == 0L).get._2
    val dsub = 64 / M
    val coarseMap = ix.coarse.toMap
    def adcErr(v: Seq[Double]): Double = {
      val cell = ix.coarse.map { case (c, cv) => (c, Pq.dist2Local(v, cv)) }
        .minBy { case (c, d) => (d, c) }._1
      val r = v.zip(coarseMap(cell)).map { case (a, b) => a - b }
      val qr = qv.zip(coarseMap(cell)).map { case (a, b) => a - b }
      val adc = (0 until M).map { s =>
        val sub = r.slice(s * dsub, (s + 1) * dsub)
        val code = ix.books(s).map { case (_, cv) => Pq.dist2Local(sub, cv) }
          .zipWithIndex.minBy { case (d, i) => (d, i) }._2
        Pq.dist2Local(qr.slice(s * dsub, (s + 1) * dsub), ix.books(s)(code)._2)
      }.sum
      math.abs(adc - Pq.dist2Local(qv, v))
    }
    def rawErr(v: Seq[Double], codes: Seq[Int]): Double = {
      val adc = (0 until M).map { s =>
        Pq.dist2Local(qv.slice(s * dsub, (s + 1) * dsub), books(s)(codes(s))._2)
      }.sum
      math.abs(adc - Pq.dist2Local(qv, v))
    }
    val others = encoded.filter(_._1 != 0L)
    val ivfMean = others.map { case (_, v, _) => adcErr(v) }.sum / others.length
    val rawMean = others.map { case (_, v, c) => rawErr(v, c) }.sum / others.length
    info(f"mean |ADC - d²| raw=$rawMean%.4f ivfpq=$ivfMean%.4f")
    assert(ivfMean <= rawMean * 1.1,
      s"residual PQ distortion $ivfMean worse than raw $rawMean")
    val top = Pq.ivfPqTopK(emb, "vec_id", "embedding", 0L, 10, 2, ix).collect()
    assert(top.length == 10)
    assert(!top.map(_.getLong(0)).contains(0L))
    assert(top.map(_.getDouble(1)).toSeq == top.map(_.getDouble(1)).sorted.toSeq)
  }

  test("adcKnnJoin: the batched join equals per-query adcTopK bit for " +
      "bit, k rows per query, map-side rank limit in the plan") {
    import org.apache.spark.sql.functions.col
    val qids = Seq(0L, 7L, 42L)
    val joined = Pq.adcKnnJoin(emb, "vec_id", "embedding",
      qids, k = 5, M, KSub, Iters, Some(books))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank limit must prune map-side:\n${plan.take(600)}")
    val rows = joined.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    qids.foreach { qid =>
      val got = rows.filter(_._1 == qid).sortBy(_._2).map(t => (t._3, t._4))
      val single = Pq.adcTopK(emb, "vec_id", "embedding", qid, 5, M, KSub,
          Iters, Some(books))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.toSeq == single, s"query $qid")
    }
  }

  test("persisted IVFADC index: search equals the in-memory model bit " +
      "for bit, the codes scan partition-prunes, and append is " +
      "immediately searchable") {
    import org.apache.spark.sql.functions.col
    val path = s"/tmp/graft_ivfpq_spec/${System.nanoTime()}"
    Pq.buildIvfPqIndex(emb, "vec_id", "embedding",
      nCells = 8, m = M, kSub = KSub, path)
    val qv = encoded.find(_._1 == 0L).get._2
    val viaIndex = Pq.searchIvfPqIndex(spark, path, qv, k = 10, nProbe = 2,
      excludeId = 0L)
    // the codes scan must prune to the probed cells before any IO
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      plan.take(600))
    // the fit is exact-decimal deterministic, so an independent
    // in-memory fit IS the persisted model — answers must match exactly
    val ix = Pq.fitIvfPq(emb, "vec_id", "embedding", 8, M, KSub)
    val direct = Pq.ivfPqTopK(emb, "vec_id", "embedding", 0L, 10, 2, ix)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == direct)
    // append a twin of vector 0 under a fresh id: with all cells probed
    // it must surface with the same ADC distance as any exact-duplicate
    val twin = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    Pq.appendToIvfPqIndex(twin, "vec_id", "embedding", path)
    // the twin's codes minimize every subspace distance to q's residual,
    // so its ADC is the global minimum (ties with any vector sharing
    // q's exact codes — membership in the minimal-ADC set is the law)
    val after = Pq.searchIvfPqIndex(spark, path, qv, k = 10, nProbe = 8,
      excludeId = 0L).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val twinAdc = after.collectFirst { case (100000L, a) => a }
    assert(twinAdc.isDefined, s"appended twin not in top-10: ${after.toSeq}")
    assert(twinAdc.get == after.map(_._2).min,
      s"twin ADC ${twinAdc.get} not minimal: ${after.toSeq}")
    // delete only THIS run's nanoTime-suffixed index — removing the
    // shared parent could race a concurrent test invocation's index
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
  }

  test("streaming ingest keeps the persisted IVFADC index current, and " +
      "a checkpoint replay of completed batches appends nothing") {
    import org.apache.spark.sql.functions.col
    val base = s"/tmp/graft_ivfpq_stream/${System.nanoTime()}"
    val (idxPath, feed, ckpt) = (s"$base/index", s"$base/feed", s"$base/ckpt")
    val first = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    Pq.buildIvfPqIndex(first, "vec_id", "embedding",
      nCells = 8, m = M, kSub = KSub, idxPath)
    rest.write.parquet(feed)
    streaming.Streams.ivfPqIngest(spark, feed, rest,
      "vec_id", "embedding", idxPath, ckpt)
    val codes = spark.read.parquet(s"$idxPath/codes")
    assert(codes.count() == emb.count(), "ingest appended exactly the feed")
    // an ingested vector is immediately searchable: querying with its own
    // floats over all cells, it must sit in the minimal-ADC set
    val qv300 = encoded.find(_._1 == 300L).get._2
    val res = Pq.searchIvfPqIndex(spark, idxPath, qv300, k = 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val own = res.collectFirst { case (300L, a) => a }
    assert(own.isDefined, s"ingested vector not searchable: ${res.toSeq}")
    assert(own.get == res.map(_._2).min)
    // replaying the drained feed against the same checkpoint appends
    // nothing — completed batch ids are skipped (NOTE: this is the
    // planned-restart half of the contract; a crash BETWEEN the append
    // and the checkpoint commit re-executes that batch — at-least-once,
    // per the operator's scaladoc)
    streaming.Streams.ivfPqIngest(spark, feed, rest,
      "vec_id", "embedding", idxPath, ckpt)
    assert(spark.read.parquet(s"$idxPath/codes").count() == emb.count(),
      "checkpoint replay duplicated rows")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("rebalanceIvfPqIndex: refit on the accumulated set equals a " +
      "from-scratch rebuild on coarse+books+codes, restores low-nProbe " +
      "recall after drift, and fail-fasts on a wrong corpus") {
    import spark.implicits._
    // 8 tight clusters on distinct 8-dim-spaced axes of the 64-dim
    // space, cluster pattern coprime with the 16-id seed stride (the
    // separable-clusters lesson above)
    def vec(c: Int, i: Long): Seq[Double] = {
      val v = Array.fill(64)(0.0)
      v(c * 8) = 1.0
      v(c * 8 + 1) = 0.01 * (((i * 7) % 13) - 6) / 13.0
      v.toSeq
    }
    val baseRows = (0L until 512L).map(i => (i, vec(((i % 13) % 8).toInt, i)))
    val base = baseRows.toDF("vec_id", "embedding")
    val path = s"/tmp/graft_ivfpq_rb_spec/${System.nanoTime()}"
    Pq.buildIvfPqIndex(base, "vec_id", "embedding",
      nCells = 8, m = M, kSub = KSub, path, coarseIters = 3)
    // drifted mode the fit never saw, ON THE BISECTOR of clusters 0
    // and 1: a ±1e-4 lean splits coarse assignment across the two
    // fitted cells while the TRUE neighbor order is decided by an
    // orthogonal jitter dim mixed across both halves — so one probe
    // sees only half the mode until a refit gives it its own cell
    def dvec(i: Long): Seq[Double] = {
      val v = Array.fill(64)(0.0)
      val lean = if (i % 2 == 0) 1e-4 else -1e-4
      v(0) = 0.7071 + lean; v(8) = 0.7071 - lean
      v(17) = 0.01 * (((i * 7) % 13) - 6) / 13.0
      v.toSeq
    }
    val driftRows = (1000L until 1064L).map(i => (i, dvec(i)))
    val drifted = driftRows.toDF("vec_id", "embedding")
    Pq.appendToIvfPqIndex(drifted, "vec_id", "embedding", path)
    val all = base.union(drifted)
    val local = (baseRows ++ driftRows).toMap
    def recallAt10(qid: Long, nProbe: Int): Double = {
      val qv = local(qid)
      val truth = local.toSeq.filter(_._1 != qid)
        .sortBy { case (id, v) => (Pq.dist2Local(qv, v), id) }
        .take(10).map(_._1).toSet
      val got = Pq.searchIvfPqIndex(spark, path, qv, k = 10, nProbe = nProbe,
        excludeId = qid).collect().map(_.getLong(0)).toSet
      truth.intersect(got).size / 10.0
    }
    val pre = recallAt10(qid = 1000L, nProbe = 1)
    info(s"pre-rebalance recall@10 at nProbe=1: $pre")

    // wrong-corpus fail-fasts BEFORE the real rebalance (the index
    // must be untouched after each)
    intercept[IllegalArgumentException] { // missing an indexed id
      Pq.rebalanceIvfPqIndex(all.filter($"vec_id" =!= 5L),
        "vec_id", "embedding", 8, M, KSub, path)
    }
    intercept[IllegalArgumentException] { // extra un-indexed id
      Pq.rebalanceIvfPqIndex(
        all.union(Seq((9999L, vec(0, 9999L))).toDF("vec_id", "embedding")),
        "vec_id", "embedding", 8, M, KSub, path)
    }
    intercept[IllegalArgumentException] { // no index at the path
      Pq.rebalanceIvfPqIndex(all, "vec_id", "embedding", 8, M, KSub,
        s"$path.nonexistent")
    }

    Pq.rebalanceIvfPqIndex(all, "vec_id", "embedding",
      nCells = 8, m = M, kSub = KSub, path, coarseIters = 3)
    // rebalance ≡ from-scratch rebuild, bit for bit on all three parts
    val rebuilt = s"$path.fresh"
    Pq.buildIvfPqIndex(all, "vec_id", "embedding",
      nCells = 8, m = M, kSub = KSub, rebuilt, coarseIters = 3)
    def snap(p: String) = (
      spark.read.parquet(s"$p/coarse").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq,
      spark.read.parquet(s"$p/books").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2)).toSeq,
      spark.read.parquet(s"$p/codes").select($"id", $"cell", $"codes")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
        .sortBy(_._1).toSeq)
    assert(snap(path) == snap(rebuilt),
      "rebalance must equal a from-scratch rebuild on the same set")
    val post = recallAt10(qid = 1000L, nProbe = 1)
    info(s"post-rebalance recall@10 at nProbe=1: $post")
    // the IVFADC contract (the separable-clusters lesson): every
    // single-probe result is a TRUE mode member — ordering within the
    // mode is quantization noise, what the exact-rerank stage is for
    // (measured: pre 0.0, post 0.8 — the probe cell now IS the mode)
    val got1 = Pq.searchIvfPqIndex(spark, path, local(1000L), k = 10,
      nProbe = 1, excludeId = 1000L).collect().map(_.getLong(0))
    assert(got1.length == 10 && got1.forall(_ >= 1000L),
      s"single-probe results must all be drifted-mode members: ${got1.toSeq}")
    assert(post >= 0.7 && post > pre,
      s"rebalance must restore single-probe recall: $pre -> $post")
    // the rewrite compacted the appended small files: at most one data
    // file per occupied cell partition
    val files = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(s"$path/codes"), Array("parquet"), true)
    assert(files.size <= 8, s"compaction expected, got ${files.size} files")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(rebuilt))
  }

  test("kppSeed rescues SORTED ingest: the id-block-clustered corpus " +
      "that starves the windowed seeds gets its neighbors back") {
    import spark.implicits._
    // the adversarial layout: clusters occupy CONTIGUOUS id blocks, so
    // every windowed seed (and every windowed residual seed) lands in
    // cluster 0 and the residual codebooks collapse to zero vectors —
    // measured recall 0 under the default rule
    def vec(cl: Int, i: Int): Seq[Double] = {
      val v = Array.fill(64)(0.0)
      v(cl * 16) = 1.0
      v(cl * 16 + 1 + i % 5) = 0.02 * (1 + i % 7)
      v.toSeq
    }
    val rows = (0 until 128).map(i => (i.toLong, vec(0, i))) ++
      (128 until 178).map(i => (i.toLong, vec(1, i))) ++
      (178 until 228).map(i => (i.toLong, vec(2, i))) ++
      (228 until 328).map(i => (i.toLong, vec(3, i)))
    val df = rows.toDF("vec_id", "embedding")
    val ix = Pq.fitIvfPq(df, "vec_id", "embedding",
      nCells = 8, m = M, kSub = KSub, coarseIters = 3, pqIters = 2,
      kppSeed = true)
    // the hash-sample sees all clusters → the residual codebooks carry
    // real spread (at least one non-degenerate codeword per subspace
    // beyond the zero vector)
    assert(ix.books.forall(b =>
      b.map { case (_, cv) => cv.map(math.abs).max }.max > 1e-6),
      "residual codebooks still degenerate under kpp seeding")
    val dists = rows.filter(_._1 != 250L)
      .map { case (id, v) => (id, Pq.dist2Local(rows.toMap.apply(250L), v)) }
      .toMap
    val got = Pq.ivfPqTopK(df, "vec_id", "embedding", 250L, 5, 2, ix)
      .collect().map(_.getLong(0))
    assert(got.length == 5)
    got.foreach { id =>
      assert(dists(id) < 0.5,
        s"id $id at true d² ${dists(id)} is not a near neighbor")
    }
    // and the fit is deterministic: same seeds, same model
    val again = Pq.fitIvfPq(df, "vec_id", "embedding",
      nCells = 8, m = M, kSub = KSub, coarseIters = 3, pqIters = 2,
      kppSeed = true)
    assert(again.coarse.toSeq == ix.coarse.toSeq)
  }

  test("ivfPq on separable clusters: probing 2 of 8 cells recovers the " +
      "true neighbors (the billion-scale layout's recall contract)") {
    import spark.implicits._
    // 4 well-separated clusters on distinct axes of a 64-dim space,
    // INTERLEAVED across the id range — the seed rule (every 16th of
    // the first kSub·16 ids, the documented IVF convention) assumes
    // shuffled ingest; a corpus SORTED by cluster starves both the
    // coarse seeds and the residual codebook seeds (they'd all see one
    // cluster) and needs more Lloyd rounds or a pre-shuffle. That
    // caveat is inherent to windowed seeding, not to IVFADC.
    def vec(cl: Int, i: Int): Seq[Double] = {
      val v = Array.fill(64)(0.0)
      v(cl * 16) = 1.0
      v(cl * 16 + 1 + i % 5) = 0.02 * (1 + i % 7)
      v.toSeq
    }
    // (i % 13) % 4, not i % 4: the seed stride is 16, and 16 ≡ 0 mod 4
    // would put every seed in cluster 0 — the shuffled-ingest assumption
    // needs the cluster pattern coprime with the stride
    val rows = (0 until 328).map(i => (i.toLong, vec((i % 13) % 4, i)))
    val df = rows.toDF("vec_id", "embedding")
    val ix = Pq.fitIvfPq(df, "vec_id", "embedding",
      nCells = 8, m = M, kSub = KSub, coarseIters = 3, pqIters = 2)
    val local = rows.toMap
    val qv = local(250L)
    // within a cluster the points are near-identical (d² ~1e-3) while
    // cross-cluster distances are ~2.0 — the IVFADC contract here is
    // "every result is a TRUE near neighbor" (ordering within
    // quantization noise is what the exact-rerank stage is for)
    val dists = rows.filter(_._1 != 250L)
      .map { case (id, v) => (id, Pq.dist2Local(qv, v)) }.toMap
    val inCluster = dists.values.count(_ < 0.5)
    val got = Pq.ivfPqTopK(df, "vec_id", "embedding", 250L, 5, 2, ix)
      .collect().map(_.getLong(0))
    info(s"returned dists: ${got.map(id => f"${dists(id)}%.4f").mkString(",")}" +
      s" ($inCluster in-cluster candidates)")
    assert(got.length == 5)
    got.foreach { id =>
      assert(dists(id) < 0.5,
        s"id $id at true d² ${dists(id)} is not a near neighbor")
    }
  }

  test("varianceAllocation: a bijection with balanced subspace counts, " +
      "layout-invariant, and it SPREADS concentrated variance — each " +
      "subspace gets an equal share of the high-variance dims") {
    import spark.implicits._
    val df = opqFixture()
    val perm = Pq.varianceAllocation(df, "v", M)
    assert(perm.sorted.toSeq == (0 until 64), "not a permutation")
    // layout-invariance: exact integer moments — any partitioning fits
    // the identical permutation
    assert(Pq.varianceAllocation(df.repartition(7), "v", M).toSeq
      == perm.toSeq, "allocation moved under repartition")
    // the 16 signal dims (0..15) spread 4 per subspace
    (0 until M).foreach { b =>
      val sub = perm.slice(b * 16, (b + 1) * 16)
      assert(sub.count(_ < 16) == 16 / M,
        s"subspace $b holds ${sub.count(_ < 16)} signal dims: " +
          sub.mkString(","))
    }
  }

  test("PermuteVec codegen expression == the array(element_at) spelling " +
      "bit-for-bit (the r18 one-node rewrite is a pure plan change)") {
    import spark.implicits._
    val df = opqFixture()
    val perm = Pq.varianceAllocation(df, "v", M)
    val fast = df.select(col("id"), Pq.permuteVec(col("v"), perm).as("p"))
      .orderBy(col("id")).collect().map(_.getSeq[Double](1))
    val slow = df.select(col("id"),
        org.apache.spark.sql.functions.array(
          perm.map(i => org.apache.spark.sql.functions
            .element_at(col("v"), i + 1)): _*).as("p"))
      .orderBy(col("id")).collect().map(_.getSeq[Double](1))
    assert(fast.length == slow.length && fast.nonEmpty)
    fast.zip(slow).foreach { case (a, b) => assert(a == b) }
    // fail-fast parity: an out-of-range index aborts, never pads
    val bad = intercept[Exception] {
      df.select(Pq.permuteVec(col("v"), Array(9999))).collect()
    }
    // pin the intended runtime guard, not just "some exception" (r18
    // ADVICE): unwrap SparkException causes to the permute_vec abort
    val msgs = Iterator.iterate(bad: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .toSeq
    assert(msgs.exists(_.contains("out of bounds")), msgs.mkString(" | "))
  }

  test("OPQ allocation lifts PQ recall at equal bits on the " +
      "variance-skewed fixture (isotropic corpora can't show it — the " +
      "s13 rule): allocated ADC top-k recovers more true neighbors " +
      "than unallocated") {
    import spark.implicits._
    val df = opqFixture().cache()
    val perm = Pq.varianceAllocation(df, "v", M)
    val pdf = df.select(col("id"),
      Pq.permuteVec(col("v"), perm).as("v"))
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val local = rows.toMap
    def trueTopK(qid: Long, k: Int): Set[Long] =
      rows.filter(_._1 != qid)
        .map { case (id, v) => (id, Pq.dist2Local(local(qid), v)) }
        .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
    def recall(data: org.apache.spark.sql.DataFrame, qid: Long,
               k: Int): Double = {
      val got = Pq.adcTopK(data, "id", "v", qid, k, M, KSub, Iters)
        .collect().map(_.getLong(0)).toSet
      val want = trueTopK(qid, k)
      got.intersect(want).size.toDouble / k
    }
    val qids = Seq(0L, 17L, 34L, 51L, 68L)
    val rPlain = qids.map(recall(df, _, 10)).sum / qids.size
    val rAlloc = qids.map(recall(pdf, _, 10)).sum / qids.size
    info(f"recall@10 plain $rPlain%.2f -> allocated $rAlloc%.2f")
    assert(rAlloc > rPlain + 0.15,
      f"allocation must lift recall materially: $rPlain%.2f -> $rAlloc%.2f")
  }

  test("OPQ through the persisted lifecycle: build(opq) stores the " +
      "permutation, search permutes the query (identity vs a plain " +
      "index over the pre-permuted corpus), append enters permuted " +
      "coordinates, rebalance refits allocation ≡ a from-scratch OPQ " +
      "build bit for bit, delete carries the artifact") {
    import spark.implicits._
    val df = opqFixture().cache()
    val even = df.filter($"id" % 2 === 0)
    val odd = df.filter($"id" % 2 =!= 0)
    val base = s"/tmp/graft_opq_life/${System.nanoTime()}"
    Pq.buildIvfPqIndex(even, "id", "v", nCells = 8, m = M, kSub = KSub,
      s"$base/ix", opq = true)
    val perm0 = Pq.loadOpqPerm(spark, s"$base/ix")
      .getOrElse(fail("build(opq) stored no permutation"))
    assert(perm0.sorted.toSeq == (0 until 64), "stored perm not a bijection")
    assert(perm0.toSeq == Pq.varianceAllocation(even, "v", M).toSeq,
      "stored perm must be the build-corpus allocation")
    // query-permutation identity: the OPQ index answers exactly like a
    // PLAIN index built over the explicitly permuted corpus queried
    // with the explicitly permuted vector
    Pq.buildIvfPqIndex(
      even.select($"id", Pq.permuteVec($"v", perm0).as("v")),
      "id", "v", nCells = 8, m = M, kSub = KSub, s"$base/plain")
    val local = df.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toMap
    def search(p: String, qv: Seq[Double]) =
      Pq.searchIvfPqIndex(spark, p, qv, k = 10, nProbe = 2,
        excludeId = 0L).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val qv = local(0L)
    assert(search(s"$base/ix", qv) ==
      search(s"$base/plain", perm0.toSeq.map(qv(_))),
      "OPQ search must equal plain search in permuted coordinates")
    // append enters the STORED permutation: every odd id lands in the
    // cell its permuted vector assigns, so a full-probe search finds
    // appended true neighbors (id 1 shares cluster 1 with 17, 33, ...)
    Pq.appendToIvfPqIndex(odd, "id", "v", s"$base/ix")
    val got1 = Pq.searchIvfPqIndex(spark, s"$base/ix", local(1L), k = 10,
      nProbe = 8, excludeId = 1L).collect().map(_.getLong(0)).toSet
    assert(got1.exists(i => i % 16 == 1L && i % 2 == 1L),
      s"appended same-cluster odd ids must be retrievable: $got1")
    // rebalance refits the allocation on the ACCUMULATED corpus and
    // equals a from-scratch OPQ build bit for bit — perm included
    Pq.rebalanceIvfPqIndex(df, "id", "v", nCells = 8, m = M, kSub = KSub,
      s"$base/ix")
    Pq.buildIvfPqIndex(df, "id", "v", nCells = 8, m = M, kSub = KSub,
      s"$base/fresh", opq = true)
    def snap(p: String) = (
      Pq.loadOpqPerm(spark, p).map(_.toSeq),
      spark.read.parquet(s"$p/coarse").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq,
      spark.read.parquet(s"$p/books").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2)).toSeq,
      spark.read.parquet(s"$p/codes").select($"id", $"cell", $"codes")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
        .sortBy(_._1).toSeq)
    assert(snap(s"$base/ix") == snap(s"$base/fresh"),
      "rebalance(opq) must equal a from-scratch OPQ build, perm included")
    assert(snap(s"$base/ix")._1.contains(
      Pq.varianceAllocation(df, "v", M).toSeq),
      "post-rebalance perm must be the FULL-corpus allocation")
    // delete carries the artifact: perm survives, survivors only
    Pq.deleteFromIvfPqIndex(spark, Seq(2L, 3L).toDF("id"), "id",
      s"$base/ix")
    assert(Pq.loadOpqPerm(spark, s"$base/ix").map(_.toSeq)
      == snap(s"$base/fresh")._1, "delete dropped the opq artifact")
    val ids = spark.read.parquet(s"$base/ix/codes")
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(2L) && !ids.contains(3L) && ids.contains(4L))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  /** Variance-skewed fixture: ALL signal lives in dims 0..15 (16
    * well-separated clusters there), dims 16..63 carry tiny
    * deterministic jitter. Unallocated PQ gives subspace 0 only kSub=8
    * centroids for all 16 signal dims while three subspaces quantize
    * noise; allocation spreads the signal 4 dims per subspace. */
  private def opqFixture() = {
    import spark.implicits._
    val n = 256
    val rows = (0 until n).map { i =>
      val c = i % 16 // cluster
      val sig = (0 until 16).map { d =>
        val base = if ((c >> (d % 4)) % 2 == 0) 1.0 else -1.0
        base * (1.0 + 0.3 * ((d * 7 + c * 3) % 5)) +
          0.02 * (((i * 31 + d * 17) % 11) - 5)
      }
      val noise = (16 until 64).map { d =>
        0.01 * (((i * 13 + d * 29) % 13) - 6) / 6.0
      }
      (i.toLong, sig ++ noise)
    }
    rows.toDF("id", "v")
  }
}
