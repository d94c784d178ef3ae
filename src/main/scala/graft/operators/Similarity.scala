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

  /** True iff `path` is a directory on its OWN filesystem — resolved
    * through the Hadoop FileSystem API so HDFS/S3/file: index paths all
    * validate (a java.io.File check would spuriously reject any
    * non-local URI even though the index is written through Spark). */
  private[operators] def fsDirExists(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one RPC, no exists/getFileStatus TOCTOU window
    try fs.getFileStatus(p).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  }

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

  /** Exact per-dimension mean of a vector column — a tiny model artifact
    * (the anchor-set prototype): per-partition BigDecimal(scale-18)
    * partial sums folded on the driver, so the mean is order-independent
    * on any layout; the rounding is Spark's double→DECIMAL(38,18) cast,
    * which a DuckDB oracle replays with CAST(x AS DECIMAL(38,18)). The
    * same fold `lloyd` uses, minus the cell assignment. */
  def exactMean(df: DataFrame, vecCol: String): Seq[Double] = {
    val v = df.select(col(vecCol).cast("array<double>").as("v"))
    val dim = v.limit(1).collect().head.getSeq[Double](0).length
    val (sums, n) = v.queryExecution.toRdd.mapPartitions { it =>
      val s = Array.fill(dim)(java.math.BigDecimal.ZERO)
      var n = 0L
      it.foreach { row =>
        val arr = row.getArray(0)
        var i = 0
        while (i < dim) {
          s(i) = s(i).add(java.math.BigDecimal.valueOf(arr.getDouble(i))
            .setScale(18, java.math.RoundingMode.HALF_UP))
          i += 1
        }
        n += 1
      }
      Iterator.single((s, n))
    }.reduce { case ((s1, n1), (s2, n2)) =>
      var i = 0
      while (i < dim) { s1(i) = s1(i).add(s2(i)); i += 1 }
      (s1, n1 + n2)
    }
    require(n > 0, "exactMean: empty anchor set")
    sums.map(_.doubleValue() / n).toSeq
  }

  /** Prototype (anchor-centroid) semantic quality scoring — the
    * embedding-side model filter (the CLIP-score/DataComp pattern):
    * score every vector by cosine to the centroid of a curated anchor
    * set, keep = score ≥ τ. The centroid is a broadcast literal (a
    * model artifact, not data), so scoring is ONE narrow codegen map —
    * no join, no shuffle; at 100 TB this runs at scan speed. */
  def prototypeScore(df: DataFrame, idCol: String, vecCol: String,
                     centroid: Seq[Double], threshold: Double): DataFrame = {
    val cv = array(centroid.map(lit): _*)
    df.select(col(idCol).as("id"),
      cosine(col(vecCol).cast("array<double>"), cv).as("__c"))
      .select(col("id"), round(col("__c"), 6).as("score"),
        when(col("__c") >= threshold, 1).otherwise(0).as("keep"))
  }

  /** k-center greedy (farthest-point / Gonzalez 1985) coreset selection
    * — the diversity half of data curation (facility-location-style
    * "cover the embedding space with k exemplars"): start from a seed,
    * then repeatedly pick the vector LEAST covered by the chosen set
    * (minimum of max-cosine to any chosen center, ties to the lowest
    * id). Each round is ONE narrow map over the corpus (the ≤k chosen
    * centers ride along as literals — a model artifact, not data) + a
    * TakeOrderedAndProject(1): k rounds cost k scan-speed passes and
    * k single-row actions, never a pairwise matrix. `far` is the
    * max-cosine of the chosen vector to the PREVIOUSLY chosen set at
    * selection time (the coverage radius trace; null for the seed). */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, seedId: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).persist()
    val seedVec = v.filter(col("id") === seedId).collect()
      .headOption.getOrElse(sys.error(s"kCenterGreedy: seed $seedId missing"))
      .getSeq[Double](1)
    var centers = Vector((seedId, seedVec, Option.empty[Double]))
    while (centers.length < k) {
      val coss = centers.map(c => cosine($"v", array(c._2.map(lit): _*)))
      val mc = if (coss.length == 1) coss.head else greatest(coss: _*)
      val chosenIds = centers.map(_._1)
      // `far` rounds INSIDE the query (round(col,6) — the d05/s01 parity
      // route); the unrounded mc stays the ordering key
      val next = v.filter(!$"id".isin(chosenIds: _*))
        .select($"id", $"v", mc.as("mc"), round(mc, 6).as("far"))
        .orderBy($"mc".asc, $"id".asc).limit(1).collect().head
      centers = centers :+ ((next.getLong(0), next.getSeq[Double](1),
        Some(next.getDouble(3))))
    }
    v.unpersist(blocking = false)
    centers.zipWithIndex.map { case ((id, _, far), r) =>
      (r, id, far)
    }.toDF("rank", "id", "far")
  }

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * diversified re-ranking — the retrieval-side dedup a RAG stack runs
    * after ANN: from a bounded relevance shortlist, greedily pick the
    * candidate maximizing  λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s), so
    * near-duplicate passages don't crowd the context window.
    *
    * λ is the rational lamNum/lamDen and the reported `mmr` is the
    * lamDen-SCALED score  lamNum·rel − (lamDen−lamNum)·maxsim  (same
    * argmax, no division — the value both engines compute with the
    * identical two-multiply-one-subtract IEEE sequence on the 6-dp
    * ROUNDED rel/sim inputs, so the greedy replays exactly; rank 0 has
    * no selected set yet → mmr is NULL, the t46 `far` convention).
    *
    * 100 TB shape: stage 1 is the one corpus scan (`bruteForceTopK` —
    * TakeOrderedAndProject, no global sort); everything after operates
    * on the SHORTLIST only (≤ shortlist² pairwise sims in one tiny
    * crossjoin, greedy on the driver over ≤ shortlist rows) — corpus
    * size never enters the diversification cost. */
  def mmrRerank(df: DataFrame, idCol: String, vecCol: String,
                queryId: Long, shortlist: Int, k: Int,
                lamNum: Int, lamDen: Int): DataFrame = {
    require(k >= 1 && k <= shortlist, s"k $k outside 1..$shortlist")
    // the greedy is driver-side and pair sims are shortlist² — an
    // unbounded shortlist would turn the crossJoin into a corpus-scale
    // blowup (10⁶ → 10¹² pairs), so cap it at rerank scale
    require(shortlist <= 4096,
      s"shortlist $shortlist > 4096 — MMR rerank operates on a bounded " +
        "shortlist (pair sims cost shortlist²); shrink the shortlist")
    require(lamNum >= 1 && lamNum <= lamDen,
      s"lambda $lamNum/$lamDen outside (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    // stage 1: bounded shortlist, already in (rel DESC, id) order
    val shortRows = bruteForceTopK(df, idCol, vecCol, queryId, shortlist)
      .collect()
    val ids = shortRows.map(_.getLong(0))
    val rel = shortRows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // stage 2: pairwise sims WITHIN the shortlist (≤ shortlist² rows),
    // rounded in-query so both engines share the exact same doubles
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .filter(col("id").isin(ids.map(x => x: Any): _*))
    val pairSim = v.as("a").crossJoin(v.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        round(cosine(col("a.v"), col("b.v")), 6).as("s"))
      .collect()
      .flatMap { r =>
        val (x, y, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Seq((x, y) -> s, (y, x) -> s)
      }.toMap
    // stage 3: greedy argmax (mmr DESC, id ASC) — the same IEEE op
    // sequence the DuckDB oracle stages replay
    var selected = Vector.empty[(Int, Long, Double, Option[Double])]
    var remaining = ids.toVector
    while (selected.length < k && remaining.nonEmpty) {
      val (cid, mmr) =
        if (selected.isEmpty) (remaining.head, None) // argmax rel = head
        else {
          val scored = remaining.map { c =>
            val m = selected.map(s => pairSim((c, s._2))).max
            c -> (lamNum * rel(c) - (lamDen - lamNum) * m)
          }
          val best = scored.minBy { case (id, s) => (-s, id) }
          (best._1, Some(best._2))
        }
      selected :+= ((selected.length, cid, rel(cid), mmr))
      remaining = remaining.filterNot(_ == cid)
    }
    selected.map { case (r, id, rl, m) => (r, id, rl, m) }
      .toDF("rank", "id", "rel", "mmr")
  }

  /** Matryoshka (MRL) prefix-truncated search (Kusupati et al. 2022 —
    * the nested-representation serving trick): score candidates by
    * cosine over the FIRST `dPrefix` dimensions only (a row-local
    * `slice`, so the cheap pass reads dPrefix/d of the multiply-adds —
    * MRL-trained embeddings keep the head dimensions meaningful), keep
    * a `shortlist`, then exact full-dimension rerank of the shortlist
    * for the final top-k. Both passes are the s01 determinism recipe
    * (6-dp rounded scores, id tie-break), so the whole funnel replays
    * exactly. Complements JL (random projection — no training
    * assumption, needs a projection pass) with the zero-transform
    * prefix form. */
  def mrlTopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
              k: Int, dPrefix: Int, shortlist: Int): DataFrame = {
    require(k >= 1 && k <= shortlist, s"k $k outside 1..$shortlist")
    require(dPrefix >= 1, s"dPrefix $dPrefix must be >= 1")
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("p", slice(col("v"), 1, dPrefix))
    val q = v.filter(col("id") === queryId)
      .select(col("v").as("qv"), col("p").as("qp"))
    val short = v.join(broadcast(q))
      .filter(col("id") =!= queryId)
      .select(col("id"), col("v"), col("qv"),
        round(cosine(col("p"), col("qp")), 6).as("pscore"))
      .orderBy(col("pscore").desc, col("id"))
      .limit(shortlist)
    short
      .select(col("id"), round(cosine(col("v"), col("qv")), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** FILTERED k-NN join — the tenant/shard/category-scoped retrieval
    * every production vector store serves ("neighbors of q AMONG rows
    * with my label"): [[knnJoin]] with the equality predicate
    * `filterCol(base) = filterCol(query)` folded INTO the broadcast
    * join condition, so Catalyst evaluates it before the cosine and the
    * per-task top-k only ranks qualifying rows. Same output shape and
    * determinism rules as knnJoin. */
  def filteredKnnJoin(df: DataFrame, idCol: String, vecCol: String,
                      filterCol: String, queryIds: Seq[Long],
                      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(idCol).as("id"), col(filterCol).as("lbl"),
      col(vecCol).cast("array<double>").as("v"))
    val q = v.filter(col("id").isin(queryIds.map(x => x: Any): _*))
      .select(col("id").as("qid"), col("lbl").as("qlbl"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    v.join(broadcast(q), col("id") =!= col("qid") &&
        col("lbl") === col("qlbl"))
      .select(col("qid"), col("id"),
        round(cosine(col("v"), col("qv")), 6).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid
    * retrieval combiner: given two ranked lists (id, rank 1..n), the
    * fused score is 1/(c+rank_a) + 1/(c+rank_b) (a missing side
    * contributes 0). Each term is ONE correctly-rounded division of
    * small integers and the two-term sum is a fixed-order IEEE add, so
    * the fused ranking replays bit-for-bit cross-engine (no rounding
    * needed — the t13/s01 determinism rules). Shortlists are bounded by
    * construction (they come out of top-k retrievers), so the join is
    * trivially small at any corpus scale. Returns (id, rrf, rank_a,
    * rank_b) top-k by (rrf DESC, id). */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
              c: Int, k: Int): DataFrame = {
    val l = a.select(col(idCol).as("id"), col(rankCol).as("rank_a"))
    val r = b.select(col(idCol).as("id"), col(rankCol).as("rank_b"))
    l.join(r, Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)))
          .as("rrf"),
        col("rank_a"), col("rank_b"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }

  /** Johnson–Lindenstrauss compression + search (Achlioptas ±1 form):
    * project every vector to dOut dims with deterministic Rademacher
    * signs (`functions.JlProject` — ONE narrow codegen map, no model
    * artifact, no shuffle), then exact top-k cosine in the PROJECTED
    * space. The third ANN scale leg next to SQ8 (same dims, fewer
    * bits) and PQ (codebooks): at 100 TB the projected table is
    * dOut/dIn of the scan bytes and every distance costs dOut/dIn of
    * the full-space multiply-adds, with distortion O(√(log n / d')).
    * JL preserves inner products to within that ε, so projected-space
    * ranking tracks full-space ranking WHEN the corpus's neighbor gaps
    * exceed ε (clustered real-world embeddings — recall floor
    * spec-pinned on a planted-cluster fixture); on an isotropic corpus
    * whose top-k cosine gaps are ≈0.03 (the synthetic test vectors) no
    * d' < dIn can rank — true of any lossy reduction, not JL. */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
                dOut: Int): DataFrame = {
    import graft.functions.JlExpr
    df.select(col(idCol).as("id"),
      JlExpr.jlProject(col(vecCol).cast("array<double>"), dOut).as("pv"))
  }

  /** Exact top-k by cosine in the projected space (the bruteForceTopK
    * shape: 1-row query broadcast, TakeOrderedAndProject — no global
    * sort). One-shot form: projects on the fly, which costs MORE than
    * one full-space scan (dIn·dOut multiply-adds/row vs dIn) — the
    * production shape is [[jlProject]] once into a persisted table,
    * then [[jlSearchProjected]] per query at dOut/dIn scan cost. */
  def jlTopK(df: DataFrame, idCol: String, vecCol: String,
             queryId: Long, k: Int, dOut: Int): DataFrame =
    jlSearchProjected(jlProject(df, idCol, vecCol, dOut), queryId, k)

  /** Per-query search over an ALREADY-projected (id, pv) table — the
    * repeated-query half of the lifecycle: each search scans dOut/dIn
    * of the original bytes and pays dOut/dIn of the multiply-adds. */
  def jlSearchProjected(proj: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = proj.filter(col("id") === queryId)
      .select(col("id").as("qid"), col("pv").as("qv"))
    proj.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("id"), round(cosine(col("pv"), col("qv")), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** k-NN JOIN: exact top-k cosine neighbors for EVERY query in a query
    * set (vs `bruteForceTopK`'s single query row) — the batch-retrieval
    * shape (eval-set contamination probes, hard-negative mining,
    * embedding-cluster labeling all ask "neighbors of these Q vectors").
    *
    * Output: (qid, rk, id, score), rk = 1..k per query by score DESC
    * with id ASC tie-break on the 6-dp rounded score.
    *
    * 100 TB shape: the query side broadcasts (Q rows — eval sets are
    * small by definition), so scoring is a broadcast nested-loop over
    * ONE base scan with no base shuffle; the rank filter triggers
    * Spark's WindowGroupLimit, so each map task forwards only its local
    * top-k per query before the single qid-partitioned shuffle —
    * shuffle volume is O(tasks × Q × k), independent of base rows. */
  /** Binary-quantized k-NN join — the sign-bit/Hamming serving shape
    * (the "binary quantization" every production vector store ships):
    * stage 1 ranks the corpus per query by Hamming distance over
    * `SignPack` sign words (16 bytes/vector at d=64 — a 16× scan-
    * footprint cut, XOR+popcount instead of d multiply-adds) and keeps
    * a `shortlist`; stage 2 exact-reranks the shortlist by rounded
    * cosine. Both rank windows are per-qid top-k → map-side
    * WindowGroupLimit before the one qid shuffle (the s06 shape).
    * With `shortlist` ≥ corpus−1 the result is BIT-IDENTICAL to
    * [[knnJoin]] (the s11 nProbe=nCells pin); smaller shortlists trade
    * recall like any quantized index. Ties break (ham ASC, id ASC) /
    * (score DESC, id ASC) — total orders, exact replay. */
  def binaryKnnJoin(df: DataFrame, idCol: String, vecCol: String,
                    queryIds: Seq[Long], k: Int,
                    shortlist: Int): DataFrame = {
    import graft.functions.VectorExprs.{signPack, hammingDist}
    import org.apache.spark.sql.expressions.Window
    val v = df
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    // stage 1 travels CODES ONLY (16 bytes/row at d=64) — carrying the
    // full vectors through the distance join would erase the whole
    // footprint win (probed: 11.1 s vs 3–4 s at 100×); the shortlist
    // re-joins the corpus by id to fetch vectors for the rerank alone
    val codes = v.select(col("id"), signPack(col("v")).as("code"))
    val q = codes.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("code").as("qcode"))
    val wH = Window.partitionBy(col("qid"))
      .orderBy(col("ham").asc, col("id").asc)
    val short = codes.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        hammingDist(col("code"), col("qcode")).as("ham"))
      .withColumn("hrk", row_number().over(wH))
      .filter(col("hrk") <= shortlist)
      .select(col("qid"), col("id"), col("ham"))
    // rerank: the nQ×shortlist pair set is tiny — broadcast it against
    // the corpus to fetch candidate vectors, broadcast the bounded
    // query vectors, exact rounded cosine, top-k
    val qv = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"))
    val w2 = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    v.join(broadcast(short), Seq("id"))
      .join(broadcast(qv), Seq("qid"))
      .select(col("qid"), col("id"), col("ham"),
        round(cosine(col("v"), col("qv")), 6).as("score"))
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("ham"), col("score"))
  }

  /** IVF × binary hybrid k-NN join — the full production serving stack
    * (what IVF-with-binary-refinement vector stores ship): coarse cell
    * pruning cuts the scan to ~nProbe/nCells of the corpus, a Hamming
    * pass over 16-byte sign codes ranks the survivors, and only the
    * per-query `shortlist` pays exact cosine. Composes [[assignCells]]
    * (codegen, narrow) + the [[binaryKnnJoin]] stages; with nProbe =
    * nCells AND shortlist ≥ corpus−1 the result is BIT-IDENTICAL to
    * exact [[knnJoin]] (both relaxations removed — the s11/s20 pins
    * composed). Probe cells are driver-picked from the bounded query
    * set (the searchIvfIndex rule). */
  def ivfBinaryKnnJoin(df: DataFrame, idCol: String, vecCol: String,
                       queryIds: Seq[Long], k: Int, nProbe: Int,
                       shortlist: Int,
                       cents: Array[(Int, Seq[Double])]): DataFrame = {
    import graft.functions.VectorExprs.{signPack, hammingDist}
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val codes = assignCells(v, cents)
      .select(col("id"), col("cell"), signPack(col("v")).as("code"))
    val probes = probeRows(
        v.filter(col("id").isin(queryIds: _*)).collect(), cents, nProbe)
      .map { case (qid, cell, _) => (qid, cell) }.toDF("qid", "cell")
    val qcodes = codes.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("code").as("qcode"))
    val wH = Window.partitionBy(col("qid"))
      .orderBy(col("ham").asc, col("id").asc)
    val short = codes.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .join(broadcast(qcodes), Seq("qid"))
      .select(col("qid"), col("id"),
        hammingDist(col("code"), col("qcode")).as("ham"))
      .withColumn("hrk", row_number().over(wH))
      .filter(col("hrk") <= shortlist)
      .select(col("qid"), col("id"), col("ham"))
    val qv = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"))
    val w2 = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    v.join(broadcast(short), Seq("id"))
      .join(broadcast(qv), Seq("qid"))
      .select(col("qid"), col("id"), col("ham"),
        round(cosine(col("v"), col("qv")), 6).as("score"))
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("ham"), col("score"))
  }

  /** Persisted binary (sign-bit) code index — the s20 family's disk
    * lifecycle (the buildLshIndex/buildSigIndex pattern). Layout: ONE
    * parquet dataset `codes/` with columns (id, code, v) — the Hamming
    * stage reads ONLY (id, code) and parquet COLUMN PRUNING delivers
    * the 16-byte-per-vector scan (no separate code file to keep in
    * sync with the vectors); the rerank re-reads (id, v) for the
    * shortlist alone. */
  /** `payloadCols` persist alongside (id, code, v) — the filtered-
    * search scope columns (see [[searchBinaryIndex]]'s `where`). */
  def buildBinaryIndex(df: DataFrame, idCol: String, vecCol: String,
                       path: String,
                       payloadCols: Seq[String] = Seq()): Unit = {
    import graft.functions.VectorExprs.signPack
    df.select(col(idCol).as("id") +:
        col(vecCol).cast("array<double>").as("v") +:
        payloadCols.map(col): _*)
      .select(col("id") +: signPack(col("v")).as("code") +: col("v") +:
        payloadCols.map(col): _*)
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Append new vectors: anti-join against stored ids so an
    * at-least-once replay of the same batch is a byte-level no-op (the
    * GraphAnn append rule). Distributed end to end — no driver pull,
    * no gate needed. Payload columns are whatever the stored table
    * carries beyond (id, code, v) — the append must supply them. */
  def appendToBinaryIndex(df: DataFrame, idCol: String, vecCol: String,
                          path: String): Unit = {
    import graft.functions.VectorExprs.signPack
    val spark = df.sparkSession
    require(fsDirExists(spark, s"$path/codes"),
      s"no binary index at $path — buildBinaryIndex first")
    val storedDf = spark.read.parquet(s"$path/codes")
    val payload = storedDf.columns.toSeq.filterNot(Set("id", "code", "v"))
    val stored = storedDf.select("id")
    df.select(col(idCol).as("id") +:
        col(vecCol).cast("array<double>").as("v") +:
        payload.map(col): _*)
      .join(stored, Seq("id"), "left_anti")
      .select(col("id") +: signPack(col("v")).as("code") +: col("v") +:
        payload.map(col): _*)
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Search the persisted index: Hamming top-`shortlist` over the
    * column-pruned (id, code) scan, exact rounded-cosine rerank over
    * (id, v) for the shortlist. Same semantics as [[binaryKnnJoin]]
    * over the indexed rows (spec-pinned equal). `where` scopes the
    * CANDIDATE side over the payload columns AT the codes scan (pushed
    * filter — the searchIvfIndex rule; filtering after the shortlist
    * would return under-k qualifying rows); query rows come from the
    * unfiltered store, so a query need not satisfy its own scope. */
  def searchBinaryIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, queryIds: Seq[Long], k: Int,
                        shortlist: Int,
                        where: Option[String] = None): DataFrame = {
    import graft.functions.VectorExprs.hammingDist
    import org.apache.spark.sql.expressions.Window
    require(fsDirExists(spark, s"$path/codes"),
      s"no binary index at $path — buildBinaryIndex first")
    val full = spark.read.parquet(s"$path/codes")
    val store = where.fold(full)(full.filter)
    val codes = store.select(col("id"), col("code"))
    val q = full.select(col("id"), col("code"))
      .filter(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("code").as("qcode"))
    val wH = Window.partitionBy(col("qid"))
      .orderBy(col("ham").asc, col("id").asc)
    val short = codes.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        hammingDist(col("code"), col("qcode")).as("ham"))
      .withColumn("hrk", row_number().over(wH))
      .filter(col("hrk") <= shortlist)
      .select(col("qid"), col("id"), col("ham"))
    val v = store.select(col("id"), col("v"))
    // query vectors from the FULL store — a query outside its own
    // scope must still search
    val qv = full.select(col("id"), col("v"))
      .filter(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"))
    val w2 = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    v.join(broadcast(short), Seq("id"))
      .join(broadcast(qv), Seq("qid"))
      .select(col("qid"), col("id"), col("ham"),
        round(cosine(col("v"), col("qv")), 6).as("score"))
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("ham"), col("score"))
  }

  def knnJoin(df: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val q = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    v.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(cosine(col("v"), col("qv")), 6).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("score"))
  }

  /** Cosine RADIUS join — every corpus neighbor with rounded cosine
    * ≥ tau per query vector (the threshold twin of [[knnJoin]]: "all
    * matches above τ" is the dedup/decontam retrieval primitive where
    * top-k is the serving one). NO window and NO qid shuffle at all —
    * the τ gate is row-local after the broadcast of the bounded query
    * set, so the whole join is one corpus scan (strictly cheaper than
    * top-k at any scale). The gate compares the 6-dp ROUNDED score
    * (the s01 parity convention), so the kept set replays exactly
    * cross-engine. */
  def radiusJoin(df: DataFrame, idCol: String, vecCol: String,
                 queryIds: Seq[Long], tau: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val q = v.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"))
    v.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(cosine(col("v"), col("qv")), 6).as("score"))
      .filter(col("score") >= tau)
  }

  /** IVF-accelerated radius join — [[radiusJoin]] probing only each
    * query's `nProbe` nearest cells (the [[ivfKnnJoin]] pruning; at
    * nProbe = nCells the candidate set is the full corpus and the
    * result is spec-pinned EQUAL to the exact form). The recall trade
    * is the s03 one: a true neighbor in an unprobed cell is missed. */
  def ivfRadiusJoin(df: DataFrame, idCol: String, vecCol: String,
                    queryIds: Seq[Long], tau: Double, nProbe: Int,
                    cents: Array[(Int, Seq[Double])]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val assigned = assignCells(v, cents)
    val probes = probeRows(
        v.filter(col("id").isin(queryIds: _*)).collect(), cents, nProbe)
      .toDF("qid", "cell", "qv")
    assigned.join(broadcast(probes), "cell")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(cosine(col("v"), col("qv")), 6).as("score"))
      .filter(col("score") >= tau)
  }

  /** Corpus dispersion card — mean pairwise dot product per label via
    * the ||Σv||² identity: Σ_{i≠j}⟨v_i,v_j⟩ = Σ_k(Σ_i v_ik)² − Σ_i‖v_i‖²,
    * so the all-pairs diversity metric (are this label's embeddings
    * spread out or collapsed?) costs ONE (label, pos) census — no pair
    * ever materializes at any corpus size. Exactness route (the q68
    * moments discipline): coordinates quantize to integers once
    * (floor(x·10^6 + 0.5) — one deterministic IEEE multiply), every
    * moment accumulates in DECIMAL(38,0) (order-free exact sums;
    * Σv ≤ 2·10^15 at 10^9 rows, its square ≤ 10^36 < 10^38), and only
    * the two REPORTED means divide — an identical fixed-order double
    * chain + 6-dp roundBin both engines replay bit-for-bit. Labels
    * with n < 2 have no pairs and are dropped. Assumes fixed vector
    * dimension (n = rows per (label, pos) cell). */
  def dispersionCard(df: DataFrame, vecCol: String,
                     labelCol: String): DataFrame = {
    val cells = df.select(col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        expr("CAST(FLOOR(x * 1000000d + 0.5d) AS BIGINT)").as("xi"))
    val byPos = cells.groupBy(col("label"), col("pos"))
      .agg(sum(col("xi").cast("decimal(38,0)")).as("sv"),
        sum((col("xi") * col("xi")).cast("decimal(38,0)")).as("ss"),
        count(lit(1)).as("nc"))
    byPos.groupBy(col("label"))
      .agg(max(col("nc")).as("n"),
        sum(col("sv") * col("sv")).as("sv2"),
        sum(col("ss")).as("self"))
      .filter(col("n") >= 2L)
      .select(col("label"), col("n"),
        graft.functions.RF.roundBin(
          (col("sv2") - col("self")).cast("double")
            / (col("n") * (col("n") - 1L)).cast("double") / lit(1e12), 6)
          .as("mean_pair_dot"),
        graft.functions.RF.roundBin(
          col("self").cast("double") / col("n").cast("double") / lit(1e12), 6)
          .as("mean_norm_sq"))
  }

  /** IVF index-health card: per-cell occupancy census over fitted
    * centroids, INCLUDING empty cells (an empty or bloated cell is the
    * rebalanceIvfIndex trigger — this card is how an operator sees it
    * coming), with a cross-multiplied skew flag at
    * n·nCells·skewDen > skewNum·total (> skewNum/skewDen × the fair
    * share). One assignment scan + a census over ≤ nCells rows; the
    * total rides a single-partition window over those census rows (the
    * t88 bucket-rows rule — never corpus rows). */
  def cellBalanceCard(df: DataFrame, idCol: String, vecCol: String,
                      cents: Array[(Int, Seq[Double])],
                      skewNum: Long, skewDen: Long,
                      l2: Boolean = false): DataFrame = {
    require(skewNum >= 1 && skewDen >= 1,
      s"need positive skewNum/skewDen, got $skewNum/$skewDen")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // l2 = the IVFADC coarse-cell rule (s27); cosine = the IVF rule (s24)
    val census = assignCells(v, cents, l2)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val cells = cents.map(_._1).toSeq.toDF("cell")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    cells.join(census, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n"), lit(0L)).as("n"))
      .select(col("cell"), col("n"), sum(col("n")).over(w).as("total"))
      .select(col("cell"), col("n"),
        (col("n") * cents.length * skewDen > lit(skewNum) * col("total"))
          .cast("int").as("skewed"))
  }

  /** IVF-accelerated k-NN JOIN — batch retrieval against the inverted
    * file: each query vector searches only its `nProbe` nearest cells
    * (probe cells picked driver-side from the bounded query set — the
    * searchIvfIndex rule per query), candidates are the cell-matched
    * corpus rows, per-query top-k folds to a map-side WindowGroupLimit
    * before the single qid shuffle (the s06 shape). vs `knnJoin`
    * (exact, scans everything per query): the scan here touches
    * ~nProbe/nCells of the corpus per query — the batch-retrieval form
    * that survives a 100 TB embedding store, same recall trade as s03.
    * Rank ties break on the ROUNDED score then id (the s01 parity
    * convention), so results replay exactly. */
  def ivfKnnJoin(df: DataFrame, idCol: String, vecCol: String,
                 queryIds: Seq[Long], k: Int, nProbe: Int,
                 cents: Array[(Int, Seq[Double])]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val assigned = assignCells(v, cents)
    val probes = probeRows(
        v.filter(col("id").isin(queryIds: _*)).collect(), cents, nProbe)
      .toDF("qid", "cell", "qv")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    assigned.join(broadcast(probes), "cell")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(cosine(col("v"), col("qv")), 6).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("score"))
  }

  /** The ONE probe-cell picker behind [[ivfKnnJoin]] and
    * [[ivfBinaryKnnJoin]] — the (-sim, cell) tie-break is an
    * oracle-pinned contract (ORDER BY duckCos DESC, cell in the
    * s11/s21 replays), so it must not fork: per query row, the nProbe
    * nearest cells with the query vector carried along. */
  private def probeRows(qRows: Array[org.apache.spark.sql.Row],
                        cents: Array[(Int, Seq[Double])],
                        nProbe: Int): Seq[(Long, Int, Seq[Double])] =
    qRows.toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1)
      cents.map { case (cell, cv) => (cell, cosineLocal(qv, cv)) }
        .sortBy { case (cell, sim) => (-sim, cell) }
        .take(nProbe)
        .map { case (cell, _) => (qid, cell, qv) }
    }

  /** Deterministic pseudo-random hyperplanes (fixed seed) for LSH.
    * Package-visible so the DuckDB oracle SQL can embed the same planes
    * as literals (the d06 seeds-in-SQL pattern). */
  private[graft] def hyperplanes(dim: Int, nBits: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the dot
    * product). Vectors in the same bucket are likely neighbors.
    * One codegen pass over all planes ([[graft.functions.LshBucket]])
    * instead of nBits stacked CodegenFallback zip_with/aggregate
    * columns — same bits, same oracle. */
  def lshBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val planes = array(hyperplanes(dim, nBits)
      .map(h => array(h.map(lit): _*)): _*)
    graft.functions.VectorExprs.lshBucket(vec, planes)
  }

  /** IVF (inverted-file) index: partition vectors into cells by nearest
    * coarse centroid, search only the query's cell(s).
    *
    * @param nProbe how many nearest cells to search (recall knob)
    */
  /** Deterministic SEED centroids: every 16th of the first nCells*16
    * rows by id order. nCells rows — always driver-collectable. */
  private[graft] def centroidRows(v: DataFrame, nCells: Int): Array[(Int, Seq[Double])] =
    v.orderBy(col("id")).limit(nCells * 16)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("id"))))
      .filter(col("__rn") % 16 === 1)
      .select((col("__rn") / 16).cast("int").as("cell"), col("v").as("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  /** k-means++ seeding (Arthur & Vassilvitskii 2007) over a
    * DETERMINISTIC hash-sample — the seed mode for corpora SORTED or
    * clustered by ingest order, where the windowed every-16th rule
    * sees only the head of the table and starves every later cluster
    * (the failure PqSpec's sorted fixture demonstrates). The sample is
    * the `sampleCap` lowest id-hash rows (`Sampling.decision` — spread
    * uniformly over the corpus REGARDLESS of row order; TakeOrdered,
    * no full sort), and the D²-weighted draw runs driver-side with a
    * fixed-seed PRNG, so the seeds — and everything Lloyd builds on
    * them — stay reproducible run-to-run. */
  private[graft] def kppSeeds(v: DataFrame, k: Int,
                              sampleCap: Int = 4096): Array[(Int, Seq[Double])] = {
    val rows = v
      .withColumn("__u", Sampling.decision(col("id")))
      .orderBy(col("__u"), col("id")).limit(sampleCap)
      .select(col("v")).collect().map(_.getSeq[Double](0))
    require(rows.nonEmpty, "kppSeeds: empty corpus")
    val rnd = new scala.util.Random(42)
    val chosen = scala.collection.mutable.ArrayBuffer(rows(rnd.nextInt(rows.length)))
    // cache min-distance-to-chosen per sample row, update incrementally
    val d2 = rows.map(r => Pq.dist2Local(r, chosen.head)).toArray
    var exhausted = false
    while (chosen.size < k && !exhausted) {
      val tot = d2.sum
      if (tot <= 0) {
        // every sample point coincides with a chosen seed: emitting a
        // duplicate centroid would create a forever-empty cell under
        // the lowest-index tie rule — return fewer seeds instead (the
        // windowed rule's behavior on a tiny corpus)
        exhausted = true
      } else {
        val t = rnd.nextDouble() * tot
        var acc = 0.0; var i = 0
        while (i < rows.length - 1 && acc + d2(i) < t) { acc += d2(i); i += 1 }
        val next = rows(i)
        chosen += next
        var j = 0
        while (j < rows.length) {
          val d = Pq.dist2Local(rows(j), next)
          if (d < d2(j)) d2(j) = d
          j += 1
        }
      }
    }
    chosen.zipWithIndex.map { case (c, i) => (i, c) }.toArray
  }

  /** Lloyd's k-means refinement of the seed centroids: each iteration is
    * one distributed assignment pass (the codegen NearestCentroid — no
    * shuffle) plus one element-wise mean aggregation (one shuffle,
    * O(cells × dim) output). Means sum per coordinate in DECIMAL(38,18):
    * exact, so order-independent and BIT-IDENTICAL in any engine — that
    * keeps the whole build replayable as the s03/s04 DuckDB oracle.
    * Cells that lose all members keep their previous centroid. At 100 TB
    * each iteration is a scan + a cells×dim-sized agg — the standard
    * batch index-build cost, bounded and deterministic. */
  private[graft] def lloyd(v0: DataFrame, seeds: Array[(Int, Seq[Double])],
                           iters: Int, l2: Boolean = false): Array[(Int, Seq[Double])] = {
    // each iteration is its own action over v — persist for the loop's
    // lifetime so the source is scanned once, not iters times
    val v = if (iters > 0) v0.persist() else v0
    var cents = seeds
    var it = 0
    while (it < iters) {
      // zero-shuffle iteration (the classic scalable k-means shape):
      // each partition folds its rows into O(cells × dim) decimal
      // partial sums, the driver adds the partials. BigDecimal add is
      // exact, so the result is order-independent; per-value rounding
      // replicates Spark's double→DECIMAL(38,18) cast (shortest-repr
      // valueOf, HALF_UP at scale 18), which is what the DuckDB oracle
      // replays with CAST(x AS DECIMAL(38,18)).
      val dim = cents.head._2.length
      val nC = cents.map(_._1).max + 1
      val partials = assignCells(v, cents, l2).select(col("cell"), col("v"))
        .queryExecution.toRdd.mapPartitions { it =>
          val s = Array.fill(nC, dim)(java.math.BigDecimal.ZERO)
          val n = new Array[Long](nC)
          it.foreach { row =>
            val cell = row.getInt(0)
            val arr = row.getArray(1)
            var i = 0
            while (i < dim) {
              s(cell)(i) = s(cell)(i).add(java.math.BigDecimal
                .valueOf(arr.getDouble(i))
                .setScale(18, java.math.RoundingMode.HALF_UP))
              i += 1
            }
            n(cell) += 1
          }
          Iterator.single((s, n))
        }.reduce { case ((s1, n1), (s2, n2)) =>
          var c = 0
          while (c < nC) {
            var i = 0
            while (i < dim) { s1(c)(i) = s1(c)(i).add(s2(c)(i)); i += 1 }
            n1(c) += n2(c); c += 1
          }
          (s1, n1)
        }
      val (sums, counts) = partials
      val means = cents.indices.collect {
        case k if counts(cents(k)._1) > 0 =>
          val cell = cents(k)._1
          cell -> (0 until dim).map(i =>
            sums(cell)(i).doubleValue() / counts(cell)).toSeq
      }.toMap
      cents = cents.map { case (cell, old) => (cell, means.getOrElse(cell, old)) }
      it += 1
    }
    if (iters > 0) v.unpersist(blocking = false)
    cents
  }

  /** Default Lloyd iterations for the IVF build (0 = raw seeds). */
  private[graft] val LloydIters = 3

  /** Seed + refine in one call (spec/diagnostic surface). `kppSeed`
    * swaps the windowed seed rule for [[kppSeeds]] — the id-sorted
    * ingest fix (defaults off: the s03/s04/d14 oracles replay the
    * windowed rule). */
  private[graft] def fitCentroids(df: DataFrame, idCol: String, vecCol: String,
                                  nCells: Int, iters: Int,
                                  kppSeed: Boolean = false): Array[(Int, Seq[Double])] = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val seeds = if (kppSeed) kppSeeds(v, nCells) else centroidRows(v, nCells)
    lloyd(v, seeds, iters)
  }

  /** Single-pass, shuffle-free cell assignment: the centroid matrix rides
    * along as one array<array<double>> literal and the codegen'd
    * NearestCentroid picks the argmax-cosine index — no crossJoin, no
    * row_number window, no Exchange (vs the n×nCells shuffle both cost a
    * 100 TB index build). */
  private[graft] def assignCells(v: DataFrame, cents: Array[(Int, Seq[Double])],
                                 l2: Boolean = false): DataFrame = {
    import graft.functions.VectorExprs.{nearestCentroid, nearestCentroidL2}
    val centLit = typedLit(cents.map(_._2).toSeq)
    val cell = if (l2) nearestCentroidL2(col("v"), centLit)
               else nearestCentroid(col("v"), centLit)
    v.withColumn("cell", cell)
  }

  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nCells: Int, nProbe: Int = 1,
              lloydIters: Int = LloydIters,
              cents0: Option[Array[(Int, Seq[Double])]] = None): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val cents = cents0.getOrElse(lloyd(v, centroidRows(v, nCells), lloydIters))
    val assigned = assignCells(v, cents)
    // the query's nProbe nearest cells — nCells candidates, driver-side
    val qv = Quantize.queryVector(
      v.filter(col("id") === queryId).select(col("v")), "ivfTopK", queryId)
    val probed = cents
      .map { case (cell, cv) => (cell, cosineLocal(qv, cv)) }
      .sortBy { case (cell, sim) => (-sim, cell) }
      .take(nProbe).map(_._1)
    // exact rerank within the probed cells only
    val qvLit = array(qv.map(lit): _*)
    assigned.filter(col("cell").isin(probed.map(x => x: Any): _*))
      .filter(col("id") =!= queryId)
      .select(col("id"), round(cosine(col("v"), qvLit), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Build a PERSISTED IVF index: a tiny centroid table plus the vectors
    * Hive-partitioned by cell — the on-disk "inverted lists". At search
    * time only the probed cells' files are read (partition pruning), so
    * query cost scales with nProbe/nCells of the corpus, not its size.
    * Build cost is one assignment pass + one partitioned write — the
    * batch-index lifecycle a 100 TB embedding store needs. */
  /** `payloadCols` persist alongside (id, v) in the vector table — the
    * label/tenant columns a FILTERED search scopes by
    * ([[searchIvfIndex]]'s `where`): the predicate then rides the
    * partition-pruned parquet scan as a pushed filter instead of
    * post-filtering reranked rows. The Lloyd fit never reads them. */
  def buildIvfIndex(df: DataFrame, idCol: String, vecCol: String,
                    nCells: Int, path: String,
                    lloydIters: Int = LloydIters,
                    kppSeed: Boolean = false,
                    payloadCols: Seq[String] = Seq()): Unit = {
    val v = df.select(col(idCol).as("id") +:
      col(vecCol).cast("array<double>").as("v") +:
      payloadCols.map(col): _*)
    fitAndWriteIvf(v, nCells, path, lloydIters, kppSeed)
  }

  /** The one fit→write chain behind [[buildIvfIndex]] AND
    * [[rebalanceIvfIndex]] (a layout/schema change lands in both or
    * neither): deterministic seeds + Lloyd, centroid table, then one
    * narrow assignment pass into the cell-partitioned vector layout —
    * the only Exchange is the repartition that sizes the per-cell
    * output files. `v` carries (id, v) plus any payload columns, which
    * ride the vector table untouched. */
  private def fitAndWriteIvf(v: DataFrame, nCells: Int, path: String,
                             lloydIters: Int, kppSeed: Boolean): Unit = {
    val fit = v.select(col("id"), col("v"))
    val seeds =
      if (kppSeed) kppSeeds(fit, nCells) else centroidRows(fit, nCells)
    val cents = lloyd(fit, seeds, lloydIters)
    val spark = v.sparkSession
    import spark.implicits._
    cents.toSeq.toDF("cell", "cv")
      .write.mode("overwrite").parquet(s"$path/centroids")
    assignCells(v, cents)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
  }

  private def cosineLocal(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Search a persisted IVF index. Probe-cell selection reads only the
    * centroid table (nCells rows — driver-side by construction); the
    * vector scan is partition-pruned to the probed cells. */
  /** Append vectors to a PERSISTED IVF index without refitting:
    * assignment reuses the stored centroids (a tiny scan → driver →
    * broadcast literal, same as the build), and the cell-partitioned
    * layout means only the appended rows' partitions gain files — the
    * incremental-ingest half of the index lifecycle. The recall contract
    * is the usual IVF maintenance trade: centroids don't track the
    * appended distribution until the next rebuild, but every appended
    * vector is exactly searchable immediately (it lands in its
    * argmax-cos cell, the same rule the probe uses). */
  def appendToIvfIndex(df: DataFrame, idCol: String, vecCol: String,
                       path: String): Unit = {
    val spark = df.sparkSession
    require(fsDirExists(spark, s"$path/centroids"),
      s"appendToIvfIndex: no IVF index at $path (missing $path/centroids — " +
        "build one with writeIvfIndex first)")
    // select by NAME: the on-disk column order is a writer detail
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cell"), col("cv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    // payload columns are whatever the stored table carries beyond the
    // core (id, v, cell) — an append must supply them all, or the
    // select fails fast (a payload-less append would silently null a
    // filtered search's predicate column)
    val payload = spark.read.parquet(s"$path/vectors").columns.toSeq
      .filterNot(Set("id", "v", "cell"))
    val v = df.select(col(idCol).as("id") +:
      col(vecCol).cast("array<double>").as("v") +:
      payload.map(col): _*)
    assignCells(v, cents)
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** REBALANCE a persisted IVF index after appends drift the
    * distribution: refit the centroids on the CURRENT vector set
    * (deterministic — the same id-ordered seed rule + Lloyd as the
    * build, so rebalancing ≡ rebuilding from scratch on the
    * accumulated vectors, spec-pinned), reassign every vector, and
    * rewrite the cell-partitioned layout — which also COMPACTS the
    * per-cell small files appends accumulate (each cell lands in one
    * task). Rename-swap like `Store.compactParquet`: not atomic for
    * concurrent readers — a maintenance-window op, like every index
    * rebuild. Search is CORRECT at any time (probes use whatever
    * centroids are stored — append keeps every vector in its stored
    * argmax cell); what rebalancing restores is the recall/cost of
    * low-nProbe searches once appended data has drifted the cells. */
  def rebalanceIvfIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, nCells: Int,
                        lloydIters: Int = LloydIters,
                        kppSeed: Boolean = false): Unit = {
    require(fsDirExists(spark, s"$path/centroids") &&
        fsDirExists(spark, s"$path/vectors"),
      s"rebalanceIvfIndex: no IVF index at $path")
    val v = spark.read.parquet(s"$path/vectors")
      .drop("cell") // payload columns ride the rebuild untouched
      // the rewrite replaces the files this plan reads — materialize
      // the current vector set before any write touches the directory
      .localCheckpoint()
    // build the COMPLETE new index under one tmp root, then swap the
    // whole root in ONE rename pair — a per-part swap could fail
    // between parts and leave NEW centroids live over OLD-partitioned
    // vectors, which searches silently (wrong cells pruned); with the
    // root swap the index is always a consistent (centroids, vectors)
    // pair
    val tmp = s"$path.rebuild_tmp"
    fitAndWriteIvf(v, nCells, tmp, lloydIters, kppSeed)
    swapIndexRoot(path, tmp, "rebalanceIvfIndex")
  }

  /** Swap a freshly-built index root over the live one in ONE rename
    * pair — the shared tail of every index rebalance (IVF here, IVFADC
    * in [[graft.operators.Pq.rebalanceIvfPqIndex]]) AND every index
    * DELETE. A per-part swap could fail between parts and leave NEW
    * centroids live over OLD-partitioned data, which searches silently
    * (wrong cells pruned); with the root swap the index is always a
    * consistent whole. Not atomic for concurrent readers — a
    * maintenance-window op, like every index rebuild. */
  private[operators] def swapIndexRoot(path: String, tmp: String,
                                       fn: String): Unit =
    swapRoot(path, tmp, s"$path.rebuild_old", fn, requireLive = true)

  /** The ONE rebuild-root sequence every delete/retract/repair shares
    * (round-18 self-review: ten hand-rolled copies let a payload-drop
    * bug hide in one of them): clear `$path.rebuild_tmp`, carry
    * `keepParts` verbatim (the fitted-model/meta dirs a rewrite keeps),
    * let `writeNew` write the rewritten parts under the tmp root, then
    * swap through [[swapIndexRoot]]. The kept-parts set is now an
    * explicit argument instead of scattered copyDirectory calls. */
  private[operators] def rebuildRoot(path: String, keepParts: Seq[String],
                                     fn: String)
                                    (writeNew: String => Unit): Unit = {
    val tmp = s"$path.rebuild_tmp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    keepParts.foreach { part =>
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(s"$path/$part"), new java.io.File(s"$tmp/$part"))
    }
    writeNew(tmp)
    swapIndexRoot(path, tmp, fn)
  }

  /** Fail-fast for every index/store delete: all requested ids must be
    * present in the stored id set — a silently-ignored unknown id would
    * let a takedown request "succeed" without removing anything (a
    * typo'd id list must abort, not half-apply). One distributed
    * anti-join count, maintenance-window cost. */
  private[operators] def requireKnownIds(storedIds: DataFrame,
                                         delIds: DataFrame,
                                         fn: String): Unit = {
    val missing = delIds.distinct()
      .join(storedIds.distinct(), Seq("id"), "left_anti").count()
    require(missing == 0L,
      s"$fn: $missing of the requested ids are not in the store — " +
        "a takedown must not half-apply; check the id list")
  }

  /** Normalize a caller's delete-id frame to one `id` column. */
  private[operators] def delIdsOf(ids: DataFrame, idCol: String): DataFrame =
    ids.select(col(idCol).as("id"))

  /** DELETE vectors from a persisted IVF index — the takedown half of
    * the lifecycle (build/append/rebalance exist; a right-to-be-
    * forgotten request must not mean a manual full rebuild). The
    * centroids are KEPT (they are a fitted model, not per-row data —
    * the same maintenance contract as append: cell quality drifts
    * until the next rebalance, searches stay correct), the vectors
    * table is rewritten minus the ids under a tmp root, and the whole
    * root swaps in one rename pair. Delete-then-rebalance ≡ a
    * from-scratch build on the survivors (spec-pinned — rebalance
    * refits deterministically on whatever is stored). Fails fast on
    * unknown ids ([[requireKnownIds]]). */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
                         ids: DataFrame, idCol: String,
                         path: String): Unit = {
    require(fsDirExists(spark, s"$path/centroids") &&
        fsDirExists(spark, s"$path/vectors"),
      s"deleteFromIvfIndex: no IVF index at $path")
    val del = delIdsOf(ids, idCol)
    val stored = spark.read.parquet(s"$path/vectors")
    requireKnownIds(stored.select(col("id")), del, "deleteFromIvfIndex")
    // materialize the survivors BEFORE any write near the live root
    // (the rebalance rule), then build the complete new root and swap.
    // The FULL stored row survives — payload columns (the s30 filtered-
    // search scope) must ride a delete untouched, like every sibling
    val kept = stored
      .join(del, Seq("id"), "left_anti")
      .localCheckpoint()
    rebuildRoot(path, Seq("centroids"), "deleteFromIvfIndex") { tmp =>
      kept.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$tmp/vectors")
    }
  }

  /** DELETE vectors from a persisted binary-code index: codes are
    * per-row pure functions of their vector, so delete(X) ≡ a
    * from-scratch build on the survivors EXACTLY (spec-pinned
    * bit-for-bit — no model to drift, unlike IVF). Rewrite minus the
    * ids under a tmp root + one rename-pair swap; fails fast on
    * unknown ids. */
  def deleteFromBinaryIndex(spark: org.apache.spark.sql.SparkSession,
                            ids: DataFrame, idCol: String,
                            path: String): Unit = {
    require(fsDirExists(spark, s"$path/codes"),
      s"deleteFromBinaryIndex: no binary index at $path")
    val del = delIdsOf(ids, idCol)
    val stored = spark.read.parquet(s"$path/codes")
    requireKnownIds(stored.select(col("id")), del, "deleteFromBinaryIndex")
    val kept = stored.join(del, Seq("id"), "left_anti").localCheckpoint()
    rebuildRoot(path, Seq(), "deleteFromBinaryIndex") { tmp =>
      kept.write.mode("overwrite").parquet(s"$tmp/codes")
    }
  }

  /** The ONE rename-pair home (index rebalances AND the streaming
    * state swaps — graft.streaming.Streams.writeStateSwap delegates
    * here): delete stale old, live→old, tmp→live, delete old.
    * `requireLive = false` is the state-table case (first merge has no
    * live root yet); index swaps always have one. */
  private[graft] def swapRoot(path: String, tmp: String, oldPath: String,
                              fn: String, requireLive: Boolean): Unit = {
    val live = new java.io.File(path)
    val old = new java.io.File(oldPath)
    org.apache.commons.io.FileUtils.deleteQuietly(old)
    val livedOut =
      if (requireLive) live.renameTo(old)
      else !live.exists() || live.renameTo(old)
    require(livedOut && new java.io.File(tmp).renameTo(live),
      s"$fn: root swap failed for $path")
    org.apache.commons.io.FileUtils.deleteQuietly(old)
  }

  /** `where`: an optional predicate over the index's PAYLOAD columns
    * (tenant/label scoping — the s16 filteredKnnJoin rule for the
    * persisted path). It applies AT the partition-pruned scan, so
    * parquet pushes it down (PlanShapeSpec pins PushedFilters) and
    * non-qualifying rows are never scored or ranked — a post-rerank
    * filter would silently return fewer than k qualifying rows. */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     queryVec: Seq[Double], k: Int, nProbe: Int,
                     excludeId: Long = -1L,
                     where: Option[String] = None): DataFrame = {
    // centroid pull memoized per (session, path, centroid-file stamp):
    // rebalance rewrites centroids and invalidates; append/delete defer
    // maintenance and correctly keep the entry (ArtifactMemo)
    val cents = ArtifactMemo.cached(spark, path, Seq("centroids")) {
      spark.read.parquet(s"$path/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
    }
    val probed = cents
      .map { case (cell, cv) => (cell, cosineLocal(queryVec, cv)) }
      .sortBy { case (cell, sim) => (-sim, cell) }
      .take(nProbe).map(_._1)
    val qv = array(queryVec.map(lit): _*)
    val scan = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probed.map(x => x: Any): _*))
      .filter(col("id") =!= excludeId)
    where.fold(scan)(scan.filter)
      .select(col("id"), round(cosine(col("v"), qv), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

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
