package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Scalar (per-dimension min-max) quantization of embedding columns to
  * 8-bit codes — the standard 4× storage/bandwidth reduction for
  * vector corpora before ANN indexing (embedding tables at corpus
  * scale are dominated by the float payload).
  *
  * Cross-engine determinism: codes are
  * `floor((x - mn) / (mx - mn) * 255 + 0.5)` — every step an IEEE
  * correctly-rounded double op on exact inputs (float→double widening
  * is exact; per-dimension MIN/MAX select existing floats, they never
  * round), so Spark and DuckDB produce bit-identical codes, and the
  * reconstruction errors (same property) hash-match without rounding
  * tricks.
  *
  * 100 TB shape: two passes. Pass 1 computes the d per-dimension
  * (min, max) ranges via posexplode + groupBy(pos) — the explode is
  * narrow and the partial aggregate combines map-side down to d rows
  * per task, so the shuffle is O(tasks · d); the d-row result is
  * driver-collected (d = embedding width, ≤ a few thousand) and
  * inlined as literal arrays. Pass 2 is a pure narrow map: each row
  * quantizes against the broadcast ranges — no shuffle, no join.
  */
object Quantize {

  /** Driver-side fetch of ONE query vector from a (id, v) projection,
    * failing fast with the missing id (adcKnnJoin's error shape) instead
    * of a bare NoSuchElementException from `.head`. */
  private[operators] def queryVector(sel: org.apache.spark.sql.DataFrame,
                                     fn: String, queryId: Long): Seq[Double] = {
    val rows = sel.limit(1).collect()
    require(rows.nonEmpty, s"$fn: query id $queryId not in the corpus")
    rows.head.getSeq[Double](0)
  }

  /** Per-dimension (min, max) of an array<float/double> column,
    * as driver-side arrays indexed by 0-based dimension. */
  def dimensionRanges(df: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val stats = df
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy($"pos")
      .agg(min($"x".cast("double")).as("mn"), max($"x".cast("double")).as("mx"))
      .orderBy($"pos")
      .collect()
    (stats.map(_.getDouble(1)), stats.map(_.getDouble(2)))
  }

  /** Quantized codes 0..255 (array<long>) for `vecCol` against the
    * given ranges; a degenerate dimension (mx == mn) codes to 0. */
  def codes(vecCol: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mnA = array(mins.map(lit(_)): _*)
    val mxA = array(maxs.map(lit(_)): _*)
    transform(vecCol, (x, i) => {
      val mn = element_at(mnA, (i + 1).cast("int"))
      val mx = element_at(mxA, (i + 1).cast("int"))
      when(mx === mn, 0L).otherwise(
        floor((x.cast("double") - mn) / (mx - mn) * 255d + 0.5d).cast("long"))
    })
  }

  /** Dequantized reconstruction `mn + code * (mx - mn) / 255`. */
  def dequantize(codesCol: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mnA = array(mins.map(lit(_)): _*)
    val mxA = array(maxs.map(lit(_)): _*)
    transform(codesCol, (c, i) => {
      val mn = element_at(mnA, (i + 1).cast("int"))
      val mx = element_at(mxA, (i + 1).cast("int"))
      mn + c.cast("double") * (mx - mn) / 255d
    })
  }

  /** Quantize `vecCol`, returning the input plus `codes` (array<long>
    * 0..255) and `max_err` (per-row max |x - dequant(code)| — the
    * worst-case per-dimension reconstruction error). Runs on the
    * fused codegen kernels ([[graft.functions.Sq8Codes]]) — the
    * `transform`/`zip_with` column forms above are kept as the
    * readable reference semantics and the parity pin (PipelineSpec
    * asserts the two produce identical bits; the corpus pass a 100 TB
    * quantize job runs must not interpret a lambda per element). */
  def quantize(df: DataFrame, vecCol: String,
               mins: Array[Double], maxs: Array[Double]): DataFrame = {
    import graft.functions.VectorExprs.{sq8Codes, sq8MaxErr}
    val pack = typedLit(Seq(mins.toSeq, maxs.toSeq))
    val v = col(vecCol).cast("array<double>")
    df.withColumn("codes", sq8Codes(v, pack))
      .withColumn("max_err", sq8MaxErr(v, pack))
  }

  /** SQ8 search (the FAISS `SQ8` analog): brute-force max-inner-product
    * over the DEQUANTIZED int8 codes — both sides reconstructed. In a
    * deployment the persisted `codes` table is what's scanned (d
    * bytes/vector instead of d·4, the floats untouched after the one
    * quantize pass); this self-contained form derives the codes inline
    * from the same ranges. One narrow codegen map (the
    * [[graft.functions.DotProduct]] loop over the reconstruction) plus
    * a TakeOrdered — no shuffle. Scores are exact IEEE chains on the
    * exact-rational reconstructions, so the whole search is
    * engine-replayable (the s09 oracle). */
  def sq8TopK(df: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int,
              mins: Array[Double], maxs: Array[Double]): DataFrame = {
    import graft.functions.VectorExprs.sq8Dot
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val qv = queryVector(v.filter(col("id") === queryId).select(col("v")),
      "sq8TopK", queryId)
    // one fused codegen pass per row (quantize→dequantize→dot); the
    // stacked transform/transform/dot column form is CodegenFallback
    // twice over — 8× slower at the 100× probe, same bits out
    // (PipelineSpec pins the equality)
    val pack = typedLit(Seq(mins.toSeq, maxs.toSeq,
      dequantLocal(qv, mins, maxs)))
    v.filter(col("id") =!= queryId)
      .select(col("id"), round(sq8Dot(col("v"), pack), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Driver-side quantize+dequantize of the query — the exact
    * [[graft.functions.Sq8Dot]] element chain. */
  private[graft] def dequantLocal(v: Seq[Double], mins: Array[Double],
                                  maxs: Array[Double]): Seq[Double] =
    v.indices.map { i =>
      val mn = mins(i); val mx = maxs(i)
      if (mx == mn) mn else {
        val c = math.floor((v(i) - mn) / (mx - mn) * 255d + 0.5d)
        mn + c * (mx - mn) / 255d
      }
    }
}

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search" — the compression behind every
  * billion-vector ANN deployment): split each d-dim vector into `m`
  * contiguous subspaces of d/m dims, fit an independent kSub-centroid
  * L2 codebook per subspace (Lloyd, reusing the exact-decimal
  * machinery of the IVF build so the fit is engine-replayable), and
  * store each vector as `m` sub-centroid indices — d·4 bytes of float
  * become m·log2(kSub) bits (64-dim float → 4 codes here, a 64×
  * compression). Search is ADC (asymmetric distance): the query builds
  * an m×kSub table of subspace distances ONCE, then every database
  * vector's approximate distance is m table lookups — no float vector
  * is ever read.
  *
  * 100 TB shape: the codebooks are m·kSub·(d/m) doubles — always a
  * broadcast literal; encoding is a narrow codegen map over the scan
  * (one [[graft.functions.NearestCentroidL2]] pass per subspace, no
  * shuffle); ADC scoring is a narrow map over the CODES table (the
  * only thing a PQ deployment scans — 4 bytes/vector here), followed
  * by a top-k TakeOrdered. The float corpus is touched only at fit and
  * encode time.
  *
  * Determinism: L2 assignment distances accumulate sequentially
  * (`s += d*d`), Lloyd means sum in DECIMAL(38,18) (exact, order-free),
  * and the ADC sum is a fixed left-associated m-term chain — every
  * step is a correctly-rounded IEEE op on identical inputs in any
  * engine, so codes AND ADC scores hash-match the DuckDB replay. */
object Pq {
  import graft.functions.VectorExprs.nearestCentroidL2

  /** Per-subspace codebooks: `books(s)` = the kSub (code, centroid)
    * pairs of subspace s. Seeds follow the IVF rule (every 16th of the
    * first kSub·16 rows by id); `iters` Lloyd refinements in L2. */
  def fitCodebooks(df: DataFrame, idCol: String, vecCol: String,
                   m: Int, kSub: Int, iters: Int,
                   kppSeed: Boolean = false): Array[Array[(Int, Seq[Double])]] = {
    val first = df.select(size(col(vecCol))).head(1)
    require(first.nonEmpty, "fitCodebooks: empty corpus")
    val dim = first.head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    (0 until m).toArray.map { s =>
      val v = df.select(col(idCol).as("id"),
        slice(col(vecCol).cast("array<double>"), s * dsub + 1, dsub).as("v"))
      val seeds = if (kppSeed) Similarity.kppSeeds(v, kSub)
                  else Similarity.centroidRows(v, kSub)
      Similarity.lloyd(v, seeds, iters, l2 = true)
    }
  }

  /** Encode: `id`, `v` (full vector) plus `codes` — array<int> of the
    * m nearest-sub-centroid indices. One narrow pass, no shuffle. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             books: Array[Array[(Int, Seq[Double])]]): DataFrame = {
    val dsub = books(0)(0)._2.length
    val codeCols = books.indices.map { s =>
      nearestCentroidL2(
        slice(col(vecCol).cast("array<double>"), s * dsub + 1, dsub),
        typedLit(books(s).map(_._2).toSeq))
    }
    df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"),
      array(codeCols: _*).as("codes"))
  }

  /** Squared-L2 ADC distance of every encoded row to `queryVec`: the
    * query's m×kSub distance table is computed driver-side (the same
    * sequential `s += d*d` loop as assignment) and inlined; the
    * distance column is the left-associated m-term lookup sum. */
  def adcDistance(codesCol: Column, queryVec: Seq[Double],
                  books: Array[Array[(Int, Seq[Double])]]): Column = {
    val dsub = books(0)(0)._2.length
    val table = books.indices.map { s =>
      val q = queryVec.slice(s * dsub, (s + 1) * dsub)
      books(s).map { case (_, cv) => dist2Local(q, cv) }.toSeq
    }
    books.indices.map { s =>
      element_at(typedLit(table(s)), codesCol.getItem(s) + lit(1))
    }.reduceLeft(_ + _)
  }

  /** Sequential squared L2 — bit-identical to
    * [[graft.functions.NearestCentroidL2.dist2]]. */
  private[graft] def dist2Local(a: Seq[Double], b: Seq[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0; var i = 0
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** ADC top-k neighbors of `queryId` (excluded from results): encode,
    * score against the query's distance table, TakeOrdered k. */
  def adcTopK(df: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, m: Int, kSub: Int,
              iters: Int = 2,
              books0: Option[Array[Array[(Int, Seq[Double])]]] = None): DataFrame = {
    val books = books0.getOrElse(fitCodebooks(df, idCol, vecCol, m, kSub, iters))
    val enc = encode(df, idCol, vecCol, books)
    val qv = Quantize.queryVector(
      enc.filter(col("id") === queryId).select(col("v")), "adcTopK", queryId)
    enc.filter(col("id") =!= queryId)
      .select(col("id"), adcDistance(col("codes"), qv, books).as("adc"))
      .orderBy(col("adc"), col("id"))
      .limit(k)
  }

  /** IVFADC artifacts (Jégou et al. 2011 §IV): coarse L2 cells plus PQ
    * codebooks fit on the CELL RESIDUALS v − centroid(cell) — residuals
    * concentrate near 0, so the same codebook budget quantizes far
    * finer than raw-vector PQ. This is the FAISS `IVFx,PQy` layout —
    * the standard billion-vector index. */
  case class IvfPqModel(coarse: Array[(Int, Seq[Double])],
                        books: Array[Array[(Int, Seq[Double])]])

  /** Fit: coarse centroids by L2 Lloyd (the IVF build), then
    * per-subspace codebooks on the residuals (one extra narrow
    * assignment + subtraction pass; no shuffle beyond the Lloyd means).
    * Every step reuses the exact-decimal machinery — the whole fit is
    * engine-replayable. */
  /** `kppSeed = true` switches BOTH the coarse and the residual fits to
    * k-means++ seeding over a deterministic hash-sample — required when
    * the corpus arrives SORTED/clustered by the id order (the windowed
    * default seed rule would see only the head; see
    * [[Similarity.kppSeeds]] and the PqSpec sorted-ingest fixture). */
  def fitIvfPq(df: DataFrame, idCol: String, vecCol: String,
               nCells: Int, m: Int, kSub: Int,
               coarseIters: Int = 2, pqIters: Int = 2,
               kppSeed: Boolean = false): IvfPqModel = {
    val (ix, res) = fitIvfPqWithRes(df, idCol, vecCol, nCells, m, kSub,
      coarseIters, pqIters, kppSeed)
    res.unpersist(blocking = false)
    ix
  }

  /** Fit, returning the PERSISTED residual frame alongside the model so
    * a build can encode from it without re-running the full-corpus
    * assignment+subtraction pass (the caller unpersists). */
  private def fitIvfPqWithRes(df: DataFrame, idCol: String, vecCol: String,
                              nCells: Int, m: Int, kSub: Int,
                              coarseIters: Int, pqIters: Int,
                              kppSeed: Boolean,
                              payloadCols: Seq[String] = Seq())
      : (IvfPqModel, DataFrame) = {
    val v = df.select(col(idCol).as("id") +:
      col(vecCol).cast("array<double>").as("v") +:
      payloadCols.map(col): _*)
    val fit = v.select(col("id"), col("v"))
    val seeds = if (kppSeed) Similarity.kppSeeds(fit, nCells)
                else Similarity.centroidRows(fit, nCells)
    val coarse = Similarity.lloyd(fit, seeds, coarseIters, l2 = true)
    // persist across the m per-subspace fits: each subspace's Lloyd
    // loop would otherwise re-run the assignment+subtraction map
    val res = residuals(v, coarse).persist()
    val books = fitCodebooks(res, "id", "r", m, kSub, pqIters, kppSeed)
    (IvfPqModel(coarse, books), res)
  }

  /** id, cell, r = v − coarse(cell): one narrow codegen assignment +
    * element-wise subtraction — no shuffle, fully codegen (ArraySub;
    * zip_with would interpret a lambda per element). */
  private def residuals(v: DataFrame,
                        coarse: Array[(Int, Seq[Double])]): DataFrame = {
    import graft.functions.VectorExprs.arraySub
    val centsLit = typedLit(coarse.map(_._2).toSeq)
    Similarity.assignCells(v, coarse, l2 = true)
      .withColumn("r",
        arraySub(col("v"), element_at(centsLit, col("cell") + lit(1))))
  }

  /** Encode the corpus: id, cell, codes (the m residual-PQ indices).
    * The float vector is consumed here and never again — an IVFADC
    * deployment persists (cell, codes) partitioned by cell.
    * `payloadCols` ride alongside (the filtered-search scope columns —
    * see searchIvfPqIndex's `where`). */
  def encodeIvfPq(df: DataFrame, idCol: String, vecCol: String,
                  ix: IvfPqModel,
                  payloadCols: Seq[String] = Seq()): DataFrame = {
    val v = df.select(col(idCol).as("id") +:
      col(vecCol).cast("array<double>").as("v") +:
      payloadCols.map(col): _*)
    codesFromResiduals(residuals(v, ix.coarse), ix.books, payloadCols)
  }

  /** The encode tail over an (id, cell, r) residual frame — shared by
    * encodeIvfPq and the build (which reuses the fit's persisted
    * residuals instead of recomputing the corpus pass). */
  private def codesFromResiduals(res: DataFrame,
      books: Array[Array[(Int, Seq[Double])]],
      payloadCols: Seq[String] = Seq()): DataFrame = {
    import graft.functions.VectorExprs.nearestCentroidL2
    val dsub = books(0)(0)._2.length
    val codeCols = books.indices.map { s =>
      nearestCentroidL2(slice(col("r"), s * dsub + 1, dsub),
        typedLit(books(s).map(_._2).toSeq))
    }
    res.select(col("id") +: col("cell") +:
      array(codeCols: _*).as("codes") +: payloadCols.map(col): _*)
  }

  /** PARAMETRIC-OPQ dimension allocation (Ge et al., CVPR 2013 §4 —
    * the closed-form half of Optimized Product Quantization,
    * specialized to the axis-aligned case): an orthogonal PERMUTATION
    * that redistributes dimensions across the m subspaces so each
    * carries a balanced share of total variance mass (OPQ's
    * "eigenvalue allocation" with the per-dim variances standing in
    * for the eigenvalues). PQ's per-subspace codebooks waste bits when
    * one subspace holds all the high-variance dims — allocation is the
    * production fix (FAISS's OPQ pre-transform runs exactly this
    * balancing after its PCA). The full SVD-learned rotation is
    * deliberately out of scope: no eigensolve replays cross-engine,
    * where this permutation is exact integer arithmetic end to end
    * (quantized ×10^3 moments in DECIMAL(38,0) — the s25 discipline —
    * so the fit is layout-invariant, and the greedy balance compares
    * Σ surprisal64(var) — the house 1/64-bit integer log2 — so both
    * engines pick identical subspaces).
    *
    * Greedy (the paper's balancing heuristic made deterministic):
    * dims in (variance DESC, dim ASC) order; each goes to the
    * not-yet-full subspace with the smallest accumulated s64 sum
    * (ties → lowest subspace). Returns the permutation p such that
    * output position k reads input dim p(k), grouped subspace-major
    * in assignment order. Domain guard: n·Σxi² < 2^57 per dim (the
    * surprisal64 bound) — shard or lower `quantScale` past it. */
  def varianceAllocation(df: DataFrame, vecCol: String, m: Int,
                         quantScale: Long = 1000L): Array[Int] = {
    val cells = df.select(
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .select(col("pos"),
        expr(s"CAST(FLOOR(x * ${quantScale}d + 0.5d) AS BIGINT)").as("xi"))
    val mom = cells.groupBy(col("pos"))
      .agg(sum(col("xi").cast("decimal(38,0)")).as("sx"),
        sum((col("xi") * col("xi")).cast("decimal(38,0)")).as("sxx"),
        count(lit(1)).as("n"))
      .collect()
    val varq = mom.map { r =>
      val sx = BigInt(r.getDecimal(1).toBigInteger)
      val sxx = BigInt(r.getDecimal(2).toBigInteger)
      val n = BigInt(r.getLong(3))
      val v = n * sxx - sx * sx
      require(v + 1 < (BigInt(1) << 57),
        s"varianceAllocation: dim ${r.getInt(0)} variance ${v} exceeds " +
          "the surprisal64 2^57 domain — lower quantScale or shard")
      (r.getInt(0), v.toLong + 1L) // +1: surprisal64 needs q >= 1
    }.sortBy { case (pos, q) => (-q, pos) }
    val d = varq.length
    require(d % m == 0, s"dims $d not divisible by m=$m")
    val dsub = d / m
    val sums = Array.fill(m)(0L)
    val cnts = Array.fill(m)(0)
    val asg = varq.map { case (pos, q) =>
      val b = (0 until m).filter(cnts(_) < dsub)
        .minBy(j => (sums(j), j))
      sums(b) += NgramLm.surprisal64Long(q)
      cnts(b) += 1
      (pos, b)
    }
    asg.zipWithIndex.sortBy { case ((_, b), rk) => (b, rk) }
      .map { case ((pos, _), _) => pos }
  }

  /** Apply an allocation permutation row-locally: output element k =
    * input element perm(k) (0-based). A permutation is orthogonal, so
    * every L2/cosine between permuted vectors is a reordered sum of
    * the same terms — both engines compute the PERMUTED order, so the
    * chains stay bit-identical. */
  def permuteVec(vec: Column, perm: Array[Int]): Column =
    // ONE codegen node (functions.PermuteVec) — the array(element_at×d)
    // spelling re-inlined 64 nodes into every consumer and fell out of
    // codegen (r18 optimization; same output, fail-fast parity)
    graft.functions.VectorExprs.permuteVec(vec, perm.toSeq)

  /** Probed cells for a query (driver-side — the coarse table is
    * nCells rows), L2 ascending with the lowest-cell tie rule. */
  private def probeCells(qv: Seq[Double], ix: IvfPqModel,
                         nProbe: Int): Array[Int] =
    ix.coarse.map { case (c, cv) => (c, dist2Local(qv, cv)) }
      .sortBy { case (c, d) => (d, c) }.take(nProbe).map(_._1)

  /** Per-cell ADC column over an encoded (cell, codes) scan: the query
    * residual differs per probed cell, so each probed cell gets its own
    * inlined distance table. */
  private def adcByCell(qv: Seq[Double], ix: IvfPqModel,
                        probed: Array[Int]): Column =
    probed.foldLeft(lit(Double.NaN)) { case (acc, c) =>
      val ccv = ix.coarse.find(_._1 == c).get._2
      val qr = qv.zip(ccv).map { case (a, b) => a - b }
      when(col("cell") === c, adcDistance(col("codes"), qr, ix.books))
        .otherwise(acc)
    }

  /** IVFADC search: probe the query's nProbe nearest cells, then
    * ADC-score ONLY those cells' codes. Cost: nProbe/nCells of the
    * CODES scan — at 100 TB neither the float corpus nor the unprobed
    * cells are read. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, nProbe: Int,
                ix: IvfPqModel): DataFrame = {
    val enc = encodeIvfPq(df, idCol, vecCol, ix)
    val qv = Quantize.queryVector(df.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")), "ivfPqTopK", queryId)
    val probed = probeCells(qv, ix, nProbe)
    enc.filter(col("cell").isin(probed.map(x => x: Any): _*))
      .filter(col("id") =!= queryId)
      .select(col("id"), round(adcByCell(qv, ix, probed), 6).as("adc"))
      .orderBy(col("adc"), col("id")).limit(k)
  }

  /** Persist an IVFADC index: `coarse` (cell, cv) and `books`
    * (sub, code, cv) are tiny parquet tables; `codes` is (id, codes)
    * Hive-partitioned by cell — the inverted lists. The float corpus
    * is consumed at build time and NEVER stored: the persisted index
    * is ~m bytes per vector (vs d·4 for floats), and a search reads
    * only the probed cells' code files. */
  /** `opq = true` fits [[varianceAllocation]] on `df` first, persists
    * the permutation at `$path/opq`, and builds the whole index over
    * the PERMUTED corpus — every later lifecycle step reads the stored
    * permutation back (search permutes the query, append permutes the
    * ingest, rebalance REFITS the allocation on the accumulated corpus,
    * delete carries the artifact), so the caller never handles the
    * permutation after the build. */
  def buildIvfPqIndex(df: DataFrame, idCol: String, vecCol: String,
                      nCells: Int, m: Int, kSub: Int, path: String,
                      coarseIters: Int = 2, pqIters: Int = 2,
                      kppSeed: Boolean = false,
                      payloadCols: Seq[String] = Seq(),
                      opq: Boolean = false): Unit = {
    val permOpt = if (opq) Some(varianceAllocation(df, vecCol, m)) else None
    val src = permOpt.fold(df)(p => df.withColumn(vecCol,
      permuteVec(col(vecCol).cast("array<double>"), p)))
    val (ix, res) = fitIvfPqWithRes(src, idCol, vecCol, nCells, m, kSub,
      coarseIters, pqIters, kppSeed, payloadCols)
    try {
      val spark = df.sparkSession
      import spark.implicits._
      ix.coarse.toSeq.toDF("cell", "cv")
        .write.mode("overwrite").parquet(s"$path/coarse")
      ix.books.zipWithIndex
        .flatMap { case (b, s) => b.map { case (c, cv) => (s, c, cv) } }
        .toSeq.toDF("sub", "code", "cv")
        .write.mode("overwrite").parquet(s"$path/books")
      permOpt.foreach { p =>
        Seq(Tuple1(p.toSeq)).toDF("perm")
          .write.mode("overwrite").parquet(s"$path/opq")
      }
      // encode from the fit's persisted residuals — NOT a fresh
      // residuals(df) pass: that would re-run the full-corpus coarse
      // assignment + subtraction a second time
      codesFromResiduals(res, ix.books, payloadCols)
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    } finally res.unpersist(blocking = false)
  }

  /** The stored OPQ permutation, if this index was built with
    * `opq = true` (None for a plain IVFADC index — both shapes load
    * through the same lifecycle entry points). */
  def loadOpqPerm(spark: org.apache.spark.sql.SparkSession,
                  path: String): Option[Array[Int]] =
    if (!Similarity.fsDirExists(spark, s"$path/opq")) None
    else ArtifactMemo.cached(spark, path, Seq("opq")) {
      Some(spark.read.parquet(s"$path/opq")
        .select(col("perm")).collect().head.getSeq[Int](0).toArray)
    }

  /** Load the model half of a persisted index (columns by NAME — the
    * on-disk order is a writer detail), failing fast on a bad path.
    * Memoized per (session, path, model-file stamp): a rebalance/refit
    * rewrites coarse/books and invalidates; append/delete carry the
    * model untouched and correctly keep the entry (ArtifactMemo). */
  def loadIvfPqModel(spark: org.apache.spark.sql.SparkSession,
                     path: String): IvfPqModel = {
    Seq("coarse", "books").foreach { part =>
      require(Similarity.fsDirExists(spark, s"$path/$part"),
        s"no IVFADC index at $path (missing $path/$part — " +
          "build one with buildIvfPqIndex first)")
    }
    ArtifactMemo.cached(spark, path, Seq("coarse", "books")) {
      val coarse = spark.read.parquet(s"$path/coarse")
        .select(col("cell"), col("cv")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
      val books = spark.read.parquet(s"$path/books")
        .select(col("sub"), col("code"), col("cv")).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .groupBy(_._1).toArray.sortBy(_._1)
        .map { case (_, rows) => rows.map(r => (r._2, r._3)).sortBy(_._1) }
      IvfPqModel(coarse, books)
    }
  }

  /** Search a persisted IVFADC index: probe selection reads the tiny
    * coarse table; the codes scan is partition-pruned to the probed
    * cells. */
  /** `where`: optional predicate over the index's payload columns,
    * applied AT the partition-pruned codes scan (pushed filter — the
    * searchIvfIndex rule): non-qualifying rows are never ADC-scored. */
  def searchIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String, queryVec: Seq[Double], k: Int,
                       nProbe: Int, excludeId: Long = -1L,
                       where: Option[String] = None): DataFrame = {
    val ix = loadIvfPqModel(spark, path)
    // an OPQ index stores PERMUTED vectors — the query enters the same
    // coordinate system (driver-side: the query is one vector)
    val qv = loadOpqPerm(spark, path)
      .fold(queryVec)(p => p.toSeq.map(queryVec(_)))
    val probed = probeCells(qv, ix, nProbe)
    val scan = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probed.map(x => x: Any): _*))
      .filter(col("id") =!= excludeId)
    where.fold(scan)(scan.filter)
      .select(col("id"), round(adcByCell(qv, ix, probed), 6).as("adc"))
      .orderBy(col("adc"), col("id")).limit(k)
  }

  /** Incremental ingest: encode new vectors against the STORED model
    * (no refit) and append — only the touched cells' partitions gain
    * files. Same maintenance trade as IVF append: the model doesn't
    * track the appended distribution until the next rebuild, but every
    * appended vector is immediately searchable under the same
    * assignment rule the probe uses. */
  def appendToIvfPqIndex(df: DataFrame, idCol: String, vecCol: String,
                         path: String): Unit = {
    val spark = df.sparkSession
    val ix = loadIvfPqModel(spark, path)
    // an OPQ index's frozen model lives in permuted coordinates — the
    // ingest enters them through the STORED permutation
    val src = loadOpqPerm(spark, path).fold(df)(p => df.withColumn(vecCol,
      permuteVec(col(vecCol).cast("array<double>"), p)))
    // payload columns are whatever the stored codes carry beyond the
    // core (id, cell, codes) — the append must supply them all
    val payload = spark.read.parquet(s"$path/codes")
      .columns.toSeq.filterNot(Set("id", "cell", "codes"))
    encodeIvfPq(src, idCol, vecCol, ix, payload)
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
  }

  /** REBALANCE a persisted IVFADC index after appends drift the
    * distribution: refit the coarse centroids AND the residual
    * codebooks on the supplied corpus, re-encode every vector, and
    * rewrite the whole index — then swap the root in one rename pair
    * ([[Similarity.swapIndexRoot]], the rebalanceIvfIndex discipline).
    *
    * Unlike the plain IVF index (which stores its vectors and can
    * refit self-contained), the IVFADC store keeps CODES ONLY — the
    * float corpus is consumed at build time and never persisted
    * (that is the point of PQ: ~m bytes per vector). So the refit
    * source must be re-supplied by the caller: `df` is the ACCUMULATED
    * corpus — exactly the vectors that went through the original build
    * plus every append. The id set is checked against the stored codes
    * (one ids-only full-outer join, maintenance-window cost): a
    * missing id would silently drop an indexed vector, an extra one
    * would silently ingest — both are rebuild-semantics violations
    * (a caller wanting ingest appends first, then rebalances).
    *
    * Determinism: the same id-ordered seed rule + Lloyd as the build,
    * so rebalancing ≡ rebuilding from scratch on the accumulated set
    * (spec-pinned on centroids, books AND codes). The rewrite also
    * compacts the per-cell small files appends accumulate. All writes
    * land under `path.rebuild_tmp` — the live index is only touched by
    * the final rename pair, so reads of the old index (including the
    * id-set check itself) never race the build. */
  def rebalanceIvfPqIndex(df: DataFrame, idCol: String, vecCol: String,
                          nCells: Int, m: Int, kSub: Int, path: String,
                          coarseIters: Int = 2, pqIters: Int = 2,
                          kppSeed: Boolean = false): Unit = {
    val spark = df.sparkSession
    Seq("coarse", "books", "codes").foreach { part =>
      require(Similarity.fsDirExists(spark, s"$path/$part"),
        s"rebalanceIvfPqIndex: no IVFADC index at $path (missing " +
          s"$path/$part — build one with buildIvfPqIndex first)")
    }
    val stored = spark.read.parquet(s"$path/codes")
      .select(col("id")).withColumn("in_store", lit(1))
    val supplied = df.select(col(idCol).as("id")).withColumn("in_df", lit(1))
    val mismatched = stored.join(supplied, Seq("id"), "full_outer")
      .filter(col("in_store").isNull || col("in_df").isNull).count()
    require(mismatched == 0L,
      s"rebalanceIvfPqIndex: supplied corpus and stored index disagree " +
        s"on $mismatched ids — pass exactly the accumulated vector set " +
        "(original build + every append)")
    val tmp = s"$path.rebuild_tmp"
    // an OPQ index REFITS its allocation on the accumulated corpus —
    // the permutation is a fitted artifact like the codebooks, so
    // maintenance carries it (the round-17 verdict's "through
    // rebalance" requirement); rebalance(opq) ≡ from-scratch
    // buildIvfPqIndex(opq) on the accumulated set, spec-pinned.
    // Payload columns (the s30 filtered-search scope) ride the rebuild
    // too — inferred from the stored codes exactly as append does, and
    // the supplied corpus must carry them (select fails loudly if not)
    val payload = spark.read.parquet(s"$path/codes")
      .columns.toSeq.filterNot(Set("id", "cell", "codes"))
    buildIvfPqIndex(df, idCol, vecCol, nCells, m, kSub, tmp,
      coarseIters, pqIters, kppSeed, payloadCols = payload,
      opq = Similarity.fsDirExists(spark, s"$path/opq"))
    Similarity.swapIndexRoot(path, tmp, "rebalanceIvfPqIndex")
  }

  /** DELETE vectors from a persisted IVFADC index — the takedown half
    * of the lifecycle. The model (coarse centroids + codebooks) is
    * KEPT — it is a fitted artifact, not per-row data, and PQ never
    * persisted the floats to refit from anyway — so delete(X) means:
    * codes table minus X under the STORED model, whole root rewritten
    * under tmp + one rename-pair swap. Search after delete ≡ search
    * over the surviving codes with the original model (the oracle
    * replays exactly that); delete-then-rebalance(survivor corpus) ≡ a
    * from-scratch build on the survivors (the rebalance determinism
    * pin). Fails fast on unknown ids. */
  def deleteFromIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                           ids: DataFrame, idCol: String,
                           path: String): Unit = {
    Seq("coarse", "books", "codes").foreach { part =>
      require(Similarity.fsDirExists(spark, s"$path/$part"),
        s"deleteFromIvfPqIndex: no IVFADC index at $path (missing " +
          s"$path/$part)")
    }
    val del = Similarity.delIdsOf(ids, idCol)
    val stored = spark.read.parquet(s"$path/codes")
    Similarity.requireKnownIds(stored.select(col("id")), del,
      "deleteFromIvfPqIndex")
    val kept = stored.join(del, Seq("id"), "left_anti").localCheckpoint()
    val modelParts = Seq("coarse", "books") ++
      (if (Similarity.fsDirExists(spark, s"$path/opq")) Seq("opq") else Nil)
    Similarity.rebuildRoot(path, modelParts, "deleteFromIvfPqIndex") { tmp =>
      kept.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$tmp/codes")
    }
  }

  /** Batched ADC k-NN JOIN — the corpus-scale retrieval shape
    * (hard-negative mining, eval-set probes, cluster labeling ask
    * "PQ-approximate neighbors of these Q vectors"): top-k by ADC
    * distance for EVERY query in one pass over the CODES scan. The Q
    * per-query distance tables (m·kSub doubles each — tiny) broadcast;
    * scoring is the codegen [[graft.functions.AdcLookup]] loop; the
    * rank filter triggers WindowGroupLimit, so each map task forwards
    * only its local top-k per query before the single qid shuffle —
    * shuffle volume O(tasks × Q × k), float corpus untouched. Scores
    * are bit-identical to per-query [[adcTopK]] (same table values,
    * same summation order — the spec pins it). */
  def adcKnnJoin(df: DataFrame, idCol: String, vecCol: String,
                 queryIds: Seq[Long], k: Int, m: Int, kSub: Int,
                 iters: Int = 2,
                 books0: Option[Array[Array[(Int, Seq[Double])]]] = None): DataFrame = {
    import graft.functions.VectorExprs.adcLookup
    import org.apache.spark.sql.expressions.Window
    val books = books0.getOrElse(fitCodebooks(df, idCol, vecCol, m, kSub, iters))
    val dsub = books(0)(0)._2.length
    val enc = encode(df, idCol, vecCol, books)
    val qvs = enc.filter(col("id").isInCollection(queryIds))
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    // fail fast like the per-query adcTopK would — a silently-absent
    // query id would otherwise read as "no neighbors"
    val missing = queryIds.distinct.toSet -- qvs.map(_._1).toSet
    require(missing.isEmpty,
      s"adcKnnJoin: query ids not in the corpus: ${missing.toSeq.sorted.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val tables = qvs.toSeq.map { case (qid, qv) =>
      (qid, books.indices.flatMap { s =>
        val q = qv.slice(s * dsub, (s + 1) * dsub)
        books(s).map { case (_, cv) => dist2Local(q, cv) }
      })
    }.toDF("qid", "qtab")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc").asc, col("id").asc)
    enc.select(col("id"), col("codes"))
      .join(broadcast(tables), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        adcLookup(col("codes"), col("qtab")).as("adc"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("adc"))
  }

  /** The PRODUCTION search shape: ADC shortlist → exact rerank. Pure
    * ADC ordering is bounded by quantization distortion; every PQ
    * deployment scans codes for a `shortlist`-sized candidate set,
    * then reads the float vectors for those rows ONLY and reranks
    * exactly. Here the shortlist is a TakeOrdered over the narrow
    * codes scan, and the rerank joins the (broadcast, shortlist-sized)
    * id set back to the vectors — at 100 TB the float corpus is
    * touched for `shortlist` rows per query, not scanned. */
  def adcRerankTopK(df: DataFrame, idCol: String, vecCol: String,
                    queryId: Long, k: Int, shortlist: Int, m: Int, kSub: Int,
                    iters: Int = 2,
                    books0: Option[Array[Array[(Int, Seq[Double])]]] = None): DataFrame = {
    import graft.functions.VectorExprs.dot
    require(shortlist >= k, "shortlist must cover k")
    val books = books0.getOrElse(fitCodebooks(df, idCol, vecCol, m, kSub, iters))
    val enc = encode(df, idCol, vecCol, books)
    val qv = Quantize.queryVector(
      enc.filter(col("id") === queryId).select(col("v")),
      "adcRerankTopK", queryId)
    val cand = enc.filter(col("id") =!= queryId)
      .select(col("id"), adcDistance(col("codes"), qv, books).as("adc"))
      .orderBy(col("adc"), col("id")).limit(shortlist)
    val qLit = array(qv.map(lit(_)): _*)
    val qq = dist2Local(qv, Seq.fill(qv.length)(0.0)) // = dot(q,q)
    enc.join(broadcast(cand.select(col("id"))), "id")
      .select(col("id"),
        (dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), qLit) + lit(qq))
          .as("d2"))
      .orderBy(col("d2"), col("id"))
      .limit(k)
  }
}
