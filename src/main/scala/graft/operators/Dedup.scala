package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StringToColumn
import graft.functions.Text

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB path:
  *
  *  - exact: hash-groupBy on a fingerprint — one shuffle, fully parallel.
  *  - MinHash+LSH: signature → bands → bucket self-join. The self-join is
  *    on (band, bucket-key), so candidate generation never compares all
  *    pairs; only same-bucket docs meet.
  *  - SimHash: 16-bit signature + bucket blocking + hamming verify.
  *  - n-gram Jaccard: exact verification on candidate pairs only.
  *  - embedding near-dup: cosine over blocked pairs.
  */
object Dedup {

  /** Auto-sized SemDeDup cells target ~this many vectors per cell —
    * cells scale with the corpus so within-cell pair work stays flat. */
  val semDedupTargetCellSize: Long = 256L

  /** Exact dedup: representative (min id) + multiplicity per distinct
    * fingerprint. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(Text.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Add `sig_0..sig_{k-1}` MinHash columns. All k hashes come from ONE
    * pass over the tokens (native MinHashes expression) instead of k
    * re-tokenizing higher-order-function columns. */
  def withMinhashSignature(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val withArr = df.withColumn("__mh",
      graft.functions.MinHashExpr.minhashes(col(textCol), Text.minhashSeeds(k)))
    (0 until k).foldLeft(withArr) { (d, i) =>
      d.withColumn(s"sig_$i", element_at($"__mh", i + 1))
    }.drop("__mh")
  }

  /** Add `ssig_0..ssig_{k-1}` shingle-MinHash columns (signatures over
    * word-n-gram hashes — the production MinHash form; see
    * `functions.ShingleMinHashes`). One codegen pass per doc. */
  def withShingleMinhashSignature(df: DataFrame, textCol: String,
                                  k: Int, n: Int): DataFrame = {
    val withArr = df.withColumn("__smh",
      graft.functions.NgramHashExpr.shingleMinhashes(
        col(textCol), n, Text.minhashSeeds(k)))
    (0 until k).foldLeft(withArr) { (d, i) =>
      d.withColumn(s"ssig_$i", element_at($"__smh", i + 1))
    }.drop("__smh")
  }

  /** MinHash-LSH candidate pairs: k hashes split into `bands` bands; docs
    * sharing any band bucket become a candidate pair (id_a < id_b).
    * Scale shape: explode to (band, bucket) rows, self-join on the bucket
    * key — work is proportional to bucket sizes, never to n². */
  /** The banded-signature rows `(id, band, bucket)` — the unit both the
    * transient candidate join and the PERSISTED index store. One codegen
    * signature pass per doc, then an explode to `bands` rows. */
  private[graft] def bucketRows(df: DataFrame, idCol: String, textCol: String,
                                numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigged = withMinhashSignature(df, textCol, numHashes)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until rowsPerBand)
          .map(r => col(s"sig_${b * rowsPerBand + r}")): _*).as("bucket"))
    }
    sigged
      .select(col(idCol).as("id"), explode(array(bandCols: _*)).as("bb"))
      .select($"id", $"bb.band".as("band"), $"bb.bucket".as("bucket"))
  }

  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 16, bands: Int = 4,
                        maxBucketSize: Int = 1000): DataFrame = {
    // Materialize the (id, band, bucket) rows ONCE: every consumer below
    // reads them twice (self-join sides) — without this the MinHash
    // signatures are recomputed per consumer. At warehouse scale this is
    // "write the signature table", here a local checkpoint.
    val buckets = bucketRows(df, idCol, textCol, numHashes, bands)
      .localCheckpoint()
    // Cap bucket size: a degenerate bucket (boilerplate/spam cluster)
    // would turn the self-join quadratic; production LSH dedup skips such
    // buckets (their members are caught by exact dedup anyway). The
    // oversized-bucket list is tiny → broadcast anti-join, no shuffle.
    val big = buckets.groupBy($"band", $"bucket")
      .agg(count(lit(1)).as("__n")).filter($"__n" > maxBucketSize)
      .select($"band", $"bucket")
    val kept = buckets.join(broadcast(big), Seq("band", "bucket"), "left_anti")
    val a = kept.select($"band", $"bucket", $"id".as("id_a"))
    val b = kept.select($"band", $"bucket", $"id".as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b").distinct()
  }

  /** Exact token-set Jaccard between two token-array columns. The
    * intersect (the expensive kernel) is evaluated once and its size
    * reused for the union term via |A∪B| = |A| + |B| − |A∩B|. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a); val db = array_distinct(b)
    val inter = size(array_intersect(da, db))
    inter.cast("double") / (size(da) + size(db) - inter)
  }

  /** Verify candidate pairs by exact n-gram (token-set) Jaccard: join the
    * texts back and keep pairs at or above the threshold. The intersect
    * size is materialized once per pair (array_intersect is the
    * expensive kernel — don't evaluate it three times). */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, threshold: Double): DataFrame = {
    // tokens sorted ONCE per doc → the per-pair intersect is a single
    // merge scan (SortedIntersectSize) instead of a hash set per pair
    val ta = docs.select(col(idCol).as("id_a"),
      sort_array(array_distinct(Text.tokens(col(textCol)))).as("toks_a"))
    val tb = docs.select(col(idCol).as("id_b"),
      sort_array(array_distinct(Text.tokens(col(textCol)))).as("toks_b"))
    pairs.join(ta, "id_a").join(tb, "id_b")
      .withColumn("__i",
        graft.functions.ArrayExprs.sortedIntersectSize($"toks_a", $"toks_b"))
      .withColumn("jac", $"__i".cast("double") /
        (size($"toks_a") + size($"toks_b") - $"__i"))
      .filter($"jac" >= threshold)
      .select($"id_a", $"id_b", round($"jac", 4).as("jac"))
  }

  /** SimHash near-dup pairs: block on the top (16-blockBits) bits so only
    * same-block docs are compared, then verify hamming distance. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3, blockBits: Int = 8): DataFrame = {
    // materialize signatures once — both self-join sides consume them;
    // native one-pass SimHash16 (the SQL form interprets a lambda stack
    // per row)
    val sh = df.select(col(idCol).as("id"),
      graft.functions.SimHashExpr.simhash16(col(textCol)).as("sh"))
      .localCheckpoint()
    val blocked = sh.withColumn("blk", shiftright($"sh", blockBits))
    val a = blocked.select($"blk", $"id".as("id_a"), $"sh".as("sh_a"))
    val b = blocked.select($"blk", $"id".as("id_b"), $"sh".as("sh_b"))
    a.join(b, Seq("blk"))
      .filter($"id_a" < $"id_b" &&
        bit_count($"sh_a".bitwiseXOR($"sh_b")) <= maxHamming)
      .select($"id_a", $"id_b",
        bit_count($"sh_a".bitwiseXOR($"sh_b")).as("hamming"))
  }

  /** Multi-permutation SimHash near-dup: each rotation of the 16-bit
    * signature gets its own blocking table (block key = the rotation's
    * top bits), candidates union across tables. A single blocking table
    * misses pairs that differ anywhere in the top `16 - blockBits` bits
    * even at hamming 1; rotations give every bit a turn inside the
    * block key — the standard production multi-table scheme. Still
    * bucket-local at scale: one shuffle per rotation (small constant),
    * never all-pairs. */
  def simhashNearDupMulti(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3, blockBits: Int = 8,
                          rotations: Seq[Int] = Seq(0, 5, 11)): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      graft.functions.SimHashExpr.simhash16(col(textCol)).as("sh"))
      .localCheckpoint()
    // 16-bit rotate-left by r, then keep the top bits as the block key:
    // ((sh << r) | (sh >> (16-r))) & 0xFFFF == (sh*2^r) % 65536 + sh div 2^(16-r)
    def blkOf(c: String, r: Int) = expr(
      s"CAST((($c * ${1L << r}L) % 65536L + $c div ${1L << (16 - r)}L) " +
        s"div ${1L << blockBits}L AS BIGINT)")
    rotations.zipWithIndex.map { case (r, i) =>
      val blocked = sh.withColumn("blk", blkOf("sh", r))
      val a = blocked.select($"blk", $"id".as("id_a"), $"sh".as("sh_a"))
      val b = blocked.select($"blk", $"id".as("id_b"), $"sh".as("sh_b"))
      // a pair belongs to its FIRST matching rotation: later rotations
      // drop pairs an earlier table already emitted (cheap per-row
      // predicates), so the branches are DISJOINT and the union needs
      // no multi-million-row DISTINCT shuffle
      val firstMatch = rotations.take(i)
        .map(pr => blkOf("sh_a", pr) =!= blkOf("sh_b", pr))
        .foldLeft(lit(true))(_ && _)
      a.join(b, Seq("blk"))
        .filter($"id_a" < $"id_b" &&
          bit_count($"sh_a".bitwiseXOR($"sh_b")) <= maxHamming && firstMatch)
        .select($"id_a", $"id_b",
          bit_count($"sh_a".bitwiseXOR($"sh_b")).as("hamming"))
    }.reduce(_ unionByName _)
  }

  /** 64-bit-space SimHash near-dup — the production dedup shape: the
    * signature (63 active bits, functions.SimHash64) splits into four
    * 16-bit chunks; table k blocks on chunk k, so any pair within
    * hamming ≤ 3 shares at least one UNTOUCHED chunk (pigeonhole over 4
    * chunks) — candidate recall is EXACT, not probabilistic, unlike the
    * rotation scheme the 16-bit width needs. Pairs report under their
    * first matching chunk (disjoint branches — no DISTINCT shuffle, the
    * round-5 lesson), so the union is append-only. One bounded shuffle
    * per chunk table at any scale. */
  def simhashNearDup64(df: DataFrame, idCol: String, textCol: String,
                       maxHamming: Int = 3): DataFrame =
    hammingNearDup64(df.select(col(idCol).as("id"),
      graft.functions.SimHashExpr.simhash64(col(textCol)).as("sh")),
      maxHamming)

  /** Blocked hamming near-dup over a PRECOMPUTED non-negative 64-bit
    * signature table (columns `id`, `sh`) — the pigeonhole 4×16-bit
    * chunk join with first-match-disjoint branches, shared by SimHash
    * (d09/d10) and the perceptual media hash (m04). Exact for
    * hamming ≤ 3 (4 chunks: one chunk must match untouched). */
  def hammingNearDup64(sig: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit blocking is exact only for hamming <= 3, got $maxHamming")
    val sh = sig.select(col("id"), col("sh")).localCheckpoint()
    def chunk(c: String, k: Int) =
      expr(s"($c div ${1L << (16 * k)}L) % 65536L")
    (0 until 4).map { k =>
      val blocked = sh.withColumn("blk", chunk("sh", k))
      val a = blocked.select($"blk", $"id".as("id_a"), $"sh".as("sh_a"))
      val b = blocked.select($"blk", $"id".as("id_b"), $"sh".as("sh_b"))
      val firstMatch = (0 until k)
        .map(pk => chunk("sh_a", pk) =!= chunk("sh_b", pk))
        .foldLeft(lit(true))(_ && _)
      a.join(b, Seq("blk"))
        .filter($"id_a" < $"id_b" &&
          bit_count($"sh_a".bitwiseXOR($"sh_b")) <= maxHamming && firstMatch)
        .select($"id_a", $"id_b",
          bit_count($"sh_a".bitwiseXOR($"sh_b")).as("hamming"))
    }.reduce(_ unionByName _)
  }

  // ------------------------------------------------------------------
  // Persisted 64-bit-signature dedup index — the hamming/pigeonhole
  // twin of the LSH index (buildLshIndex below), for signatures rather
  // than shingle minhashes: media perceptual hashes (m04) or SimHash64
  // (d09). On-disk layout: `path/meta` pins the signature KIND
  // ("phash62", "simhash64", …) — a probe mixing kinds would silently
  // never match, so it fails fast; `path/chunks` stores each signature
  // exploded into its four 16-bit pigeonhole rows (id, sh, blk)
  // partitioned by chunk — a probe of chunk k reads ONE partition.
  // Signatures hash once, on arrival; old media bytes are never
  // re-decoded (the signature IS the index payload).
  // ------------------------------------------------------------------

  private def sigChunk(c: String, k: Int): Column =
    expr(s"($c div ${1L << (16 * k)}L) % 65536L")

  private def sigChunkRows(sig: DataFrame): DataFrame =
    (0 until 4).map { k =>
      sig.select(col("id"), col("sh"), lit(k).as("chunk"),
        sigChunk("sh", k).as("blk"))
    }.reduce(_ unionByName _)

  private def sigMeta(spark: org.apache.spark.sql.SparkSession,
                      path: String): String = {
    require(Similarity.fsDirExists(spark, s"$path/meta"),
      s"no signature index at $path (missing $path/meta — buildSigIndex first)")
    // memoized per (session, path, meta stamp) — ArtifactMemo
    ArtifactMemo.cached(spark, path, Seq("meta")) {
      spark.read.parquet(s"$path/meta").select(col("kind"))
        .collect().head.getString(0)
    }
  }

  /** Build from the initial corpus's (id, sh) signature table. */
  def buildSigIndex(sig: DataFrame, kind: String, path: String): Unit = {
    val spark = sig.sparkSession
    import spark.implicits._
    Seq(kind).toDF("kind").write.mode("overwrite").parquet(s"$path/meta")
    sigChunkRows(sig)
      .write.mode("overwrite").partitionBy("chunk").parquet(s"$path/chunks")
  }

  /** Append a new batch's signatures (kind re-checked against meta). */
  def appendToSigIndex(sig: DataFrame, kind: String, path: String): Unit = {
    val stored = sigMeta(sig.sparkSession, path)
    require(stored == kind,
      s"signature kind mismatch: index at $path holds '$stored', append is '$kind'")
    sigChunkRows(sig)
      .write.mode("append").partitionBy("chunk").parquet(s"$path/chunks")
  }

  /** DELETE media from a persisted signature index — the takedown
    * half (the deleteFromLshIndex twin: chunk rows are per-row pure
    * functions of the signature, so delete(X) ≡ rebuild-without-X
    * exactly). Chunk-partitioned rewrite minus the ids under tmp +
    * one rename-pair swap; meta rides along; fails fast on unknown
    * ids. */
  def deleteFromSigIndex(spark: org.apache.spark.sql.SparkSession,
                         ids: DataFrame, idCol: String,
                         path: String): Unit = {
    sigMeta(spark, path) // existence fail-fast
    val del = Similarity.delIdsOf(ids, idCol)
    val stored = spark.read.parquet(s"$path/chunks")
    Similarity.requireKnownIds(stored.select(col("id")), del,
      "deleteFromSigIndex")
    val kept = stored.join(del, Seq("id"), "left_anti").localCheckpoint()
    Similarity.rebuildRoot(path, Seq("meta"), "deleteFromSigIndex") { tmp =>
      kept.write.mode("overwrite").partitionBy("chunk")
        .parquet(s"$tmp/chunks")
    }
  }

  /** Near-dups of a NEW batch against the indexed corpus: per-chunk
    * (blk) join + exact popcount verify, first-match-disjoint branches
    * (pairs report under the first chunk both sides leave untouched —
    * no DISTINCT shuffle even when an id was appended twice, because
    * duplicate index rows collapse in the per-pair disjointness only if
    * deduped: replayed appends CAN duplicate pairs, so the final
    * distinct here is on (id_idx, id_new), the t44 exactly-once-at-
    * probe rule). Exact for hamming ≤ 3. Returns (id_idx, id_new,
    * hamming). */
  def probeSigIndex(newSig: DataFrame, kind: String, path: String,
                    maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4x16-bit blocking is exact only for hamming <= 3, got $maxHamming")
    val spark = newSig.sparkSession
    val stored = sigMeta(spark, path)
    require(stored == kind,
      s"signature kind mismatch: index at $path holds '$stored', probe is '$kind'")
    val idx = spark.read.parquet(s"$path/chunks")
      .select(col("chunk"), col("blk"),
        col("id").as("id_idx"), col("sh").as("sh_idx"))
    val batch = newSig.select(col("id").as("id_new"), col("sh").as("sh_new"))
    (0 until 4).map { k =>
      val firstMatch = (0 until k)
        .map(pk => sigChunk("sh_idx", pk) =!= sigChunk("sh_new", pk))
        .foldLeft(lit(true))(_ && _)
      idx.filter($"chunk" === k)
        .join(batch.withColumn("blk", sigChunk("sh_new", k)), Seq("blk"))
        .filter(bit_count($"sh_idx".bitwiseXOR($"sh_new")) <= maxHamming &&
          firstMatch)
        .select($"id_idx", $"id_new",
          bit_count($"sh_idx".bitwiseXOR($"sh_new")).as("hamming"))
    }.reduce(_ unionByName _)
      // self-exclusion: probing a batch already appended to the index
      // (append-then-probe lifecycle, at-least-once replay) must not
      // report every doc as its own hamming-0 near-dup — the knnJoin /
      // jlSearchProjected rule
      .filter($"id_idx" =!= $"id_new")
      .distinct()
  }

  /** Near-dup CLUSTER resolution: connected components over candidate
    * pairs by iterative min-label propagation — the step a dedup
    * pipeline runs after pair generation, so each near-dup cluster keeps
    * one canonical document (`comp == id`). Per iteration: one join of
    * the (undirected) edge list against the current labels, a min per
    * neighbor, and a convergence count — converges in O(cluster
    * diameter) rounds, each a bounded shuffle, with the frontier
    * checkpointed so the plan (and its lineage) stays flat at any scale.
    * Docs with no near-dup pair keep themselves (left join). */
  def connectedComponents(nodes: DataFrame, idCol: String, pairs: DataFrame,
                          aCol: String = "id_a", bCol: String = "id_b",
                          maxIter: Int = 50,
                          driverEdgeCap: Long = 1L << 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint()
    // Small candidate graphs (the common case — pair lists are already
    // blocking-bounded) resolve by driver union-find: one collect under
    // the cap, microseconds of work, zero iterative jobs. Bigger graphs
    // take the distributed propagation below. Same adaptive-cap pattern
    // as GroupKernel's dense bound and Rayfall's maxDriverVec.
    if (edges.count() <= driverEdgeCap) {
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent(c); parent(c) = r; c = n
        }
        r
      }
      edges.collect().foreach { r =>
        val (a, b) = (find(r.get(0)), find(r.get(1)))
        if (a != b) parent(a) = b
      }
      // min-label per component root
      val minOf = scala.collection.mutable.HashMap.empty[Any, Any]
      val members = parent.keySet ++ parent.values
      // numeric ids must compare numerically (the distributed path's
      // least() and the oracle's MIN are numeric) — toString ordering
      // would flip the canonical keep-id, e.g. min{9,12} = 12
      def lt(x: Any, y: Any): Boolean = (x, y) match {
        case (a: Long, b: Long) => a < b
        case (a: Int, b: Int) => a < b
        case (a: Short, b: Short) => a < b
        case (a: Byte, b: Byte) => a < b
        case (a: Double, b: Double) => a < b
        case (a: Float, b: Float) => a < b
        case (a: String, b: String) => a < b
        case (a: java.lang.Number, b: java.lang.Number) =>
          a.doubleValue() < b.doubleValue()
        case (a, b) => a.toString < b.toString
      }
      members.foreach { m =>
        val r = find(m)
        if (!minOf.contains(r) || lt(m, minOf(r))) minOf(r) = m
      }
      val spark = nodes.sparkSession
      val idType = nodes.schema(idCol).dataType
      val rows = members.toSeq.map(m =>
        org.apache.spark.sql.Row(m, minOf(find(m))))
      val compDf = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("__c", idType))))
      return nodes.select(col(idCol).as("id"))
        .join(compDf, Seq("id"), "left")
        .select($"id", coalesce($"__c", $"id").as("comp"))
    }
    // propagate over the TOUCHED subgraph only — docs with no near-dup
    // pair never change label, so they join back in once at the end
    // (at corpus scale the paired subset is a small fraction of nodes)
    var labels = edges.select($"src".as("id")).distinct()
      .select($"id", $"id".as("comp")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbr = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy($"dst").agg(min($"comp").as("ncomp"))
      val prop = labels.join(nbr.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select($"id",
          least($"comp", coalesce($"ncomp", $"comp")).as("comp"))
      // pointer jumping: follow the label one hop (comp := comp[comp]) so
      // chains collapse in O(log diameter) rounds, not O(diameter) —
      // measured 18 rounds → 5 on the sf0.1 hamming graph
      val next = prop.as("x").join(prop.as("y"), $"x.comp" === $"y.id")
        .select($"x.id".as("id"), least($"x.comp", $"y.comp").as("comp"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), "id")
        .filter($"n.comp" < $"o.comp").count()
      labels = next
      it += 1
      if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
        println(s"[cc] iter $it changed=$changed")
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter iterations")
    nodes.select(col(idCol).as("id"))
      .join(labels.withColumnRenamed("comp", "__c"), Seq("id"), "left")
      .select($"id", coalesce($"__c", $"id").as("comp"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup over
    * an embedding column. K-means the embedding space (the existing
    * Lloyd/IVF build — deterministic seeds + exact-decimal means, so the
    * DuckDB oracle replays the centroids bit-identically), compare
    * cosine only WITHIN a cell, resolve the qualifying pairs to clusters
    * (connected components), and label every vector with its cluster's
    * canonical (minimum) id plus the cluster size. `id == comp` rows are
    * the keep-list.
    *
    * 100 TB shape: the cell assignment is the shuffle-free codegen
    * NearestCentroid pass, pair generation is the cell-blocked self-join
    * (never all-pairs — the SemDeDup approximation by construction:
    * cross-cell near-dups are unreported on both engines alike), and
    * cluster resolution auto-routes driver/distributed on edge volume.
    * Each Lloyd iteration is one zero-shuffle partial-sum pass. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               nCells: Int, lloydIters: Int, threshold: Double,
               cents0: Option[Array[(Int, Seq[Double])]] = None): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // nCells bounds the quadratic within-cell term: a FIXED cell count
    // means 10× corpus → 100× pair comparisons. Passing nCells <= 0
    // sizes it from the corpus (~targetCellSize vectors per cell, the
    // way the SemDeDup paper scales cluster count with data), keeping
    // the per-cell pair work constant as data grows. Explicit nCells
    // (the d14 oracle) is untouched.
    val cells =
      if (nCells > 0) nCells
      else math.max(8, (df.count() / semDedupTargetCellSize).toInt)
    val cents = cents0.getOrElse(
      Similarity.fitCentroids(df, idCol, vecCol, cells, lloydIters))
    // no checkpoint: each reuse re-runs the narrow scan+NearestCentroid
    // pass (codegen, no shuffle) — cheaper at corpus scale than
    // materializing id+vector+cell to executor storage
    val assigned = Similarity.assignCells(v, cents)
    val pairs = embeddingNearDup(assigned, "id", "v", "cell", threshold)
    val comps = connectedComponents(assigned, "id", pairs)
    val sizes = comps.groupBy($"comp").agg(count(lit(1)).as("cluster_n"))
    comps.join(sizes, "comp")
      .join(assigned.select($"id", $"cell"), "id")
      .select($"id", $"cell", $"comp", $"cluster_n")
  }

  /** Embedding near-dup: cosine similarity over pairs blocked by a
    * coarse key (e.g. a cluster/label id — the IVF idea: only compare
    * within a cell). */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val a = v.select($"blk", $"id".as("id_a"), $"v".as("v_a"))
    val b = v.select($"blk", $"id".as("id_b"), $"v".as("v_b"))
    a.join(b, Seq("blk"))
      .filter($"id_a" < $"id_b")
      .withColumn("cos", Similarity.cosine($"v_a", $"v_b"))
      .filter($"cos" >= threshold)
      .select($"id_a", $"id_b", round($"cos", 6).as("cos"))
  }

  // ------------------------------------------------------------------
  // Persisted MinHash-LSH dedup index — the incremental-snapshot dedup
  // lifecycle a rolling 100 TB crawl needs: hash each snapshot's text
  // ONCE when it arrives, keep only the tiny banded-signature rows on
  // disk, and dedup every NEW batch against the accumulated corpus by a
  // signature join — the old corpus's text is never re-read, never
  // re-hashed. (Reference scope: the batch LSH pipeline above; the
  // persisted lifecycle mirrors buildIvfIndex/appendToIvfIndex.)
  // On-disk layout: `path/meta` pins (num_hashes, bands) — a probe or
  // append under different parameters would silently never match, so
  // both fail fast on mismatch; `path/buckets` is the signature table
  // partitioned by band (per-band inverted lists).
  // ------------------------------------------------------------------

  private def lshMeta(spark: org.apache.spark.sql.SparkSession,
                      path: String): (Int, Int) = {
    require(Similarity.fsDirExists(spark, s"$path/meta"),
      s"no LSH index at $path (missing $path/meta — buildLshIndex first)")
    // memoized per (session, path, meta stamp) — ArtifactMemo
    ArtifactMemo.cached(spark, path, Seq("meta")) {
      val r = spark.read.parquet(s"$path/meta")
        .select(col("num_hashes"), col("bands")).collect().head
      (r.getInt(0), r.getInt(1))
    }
  }

  /** Build the persisted index from the initial corpus: one signature
    * pass + one band-partitioned write. */
  def buildLshIndex(df: DataFrame, idCol: String, textCol: String,
                    numHashes: Int, bands: Int, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq((numHashes, bands)).toDF("num_hashes", "bands")
      .write.mode("overwrite").parquet(s"$path/meta")
    bucketRows(df, idCol, textCol, numHashes, bands)
      .write.mode("overwrite").partitionBy("band").parquet(s"$path/buckets")
  }

  /** Append a new snapshot's signatures without touching existing rows:
    * the incremental half. Parameters are read from the stored meta and
    * are by construction consistent with the build. */
  def appendToLshIndex(df: DataFrame, idCol: String, textCol: String,
                       path: String): Unit = {
    val (numHashes, bands) = lshMeta(df.sparkSession, path)
    bucketRows(df, idCol, textCol, numHashes, bands)
      .write.mode("append").partitionBy("band").parquet(s"$path/buckets")
  }

  /** DELETE documents from a persisted LSH index — the takedown half
    * of the lifecycle (build/append/probe existed; a right-to-be-
    * forgotten request against the signature store must not mean a
    * full rebuild). Signature rows are per-row pure functions of their
    * document, so delete(X) ≡ a from-scratch build on the survivors
    * EXACTLY (spec-pinned bit-for-bit on the buckets table): the
    * band-partitioned table rewrites minus the ids under a tmp root,
    * meta rides along unchanged, and the whole root swaps in one
    * rename pair ([[Similarity.swapIndexRoot]]). Fails fast on
    * unknown ids. */
  def deleteFromLshIndex(spark: org.apache.spark.sql.SparkSession,
                         ids: DataFrame, idCol: String,
                         path: String): Unit = {
    lshMeta(spark, path) // existence fail-fast
    val del = Similarity.delIdsOf(ids, idCol)
    val stored = spark.read.parquet(s"$path/buckets")
    Similarity.requireKnownIds(stored.select(col("id")), del,
      "deleteFromLshIndex")
    val kept = stored.join(del, Seq("id"), "left_anti").localCheckpoint()
    Similarity.rebuildRoot(path, Seq("meta"), "deleteFromLshIndex") { tmp =>
      kept.write.mode("overwrite").partitionBy("band")
        .parquet(s"$tmp/buckets")
    }
  }

  // ------------------------------------------------------------------
  // Persisted CLUSTER STATE next to a dedup index (t44 LSH / m05
  // signatures accumulate PAIRS; this maintains the component labels
  // incrementally): `path/clusters` holds (id, comp) with comp = the
  // cluster's minimum member id (the connectedComponents convention).
  // An append unions a new batch's pairs into the stored labels WITHOUT
  // re-clustering the corpus: each new pair collapses to a QUOTIENT
  // edge between stored labels (or raw ids for unseen docs), components
  // run over that quotient graph — |affected clusters| + |batch| nodes,
  // never corpus-sized — and only the label column is rewritten.
  // Incremental ≡ full re-cluster (spec-pinned): labels are min-ids, so
  // the min over merged quotient nodes IS the min over their members.
  // Replayed appends are naturally idempotent (already-stored ids map
  // to their existing labels; the quotient merge is a no-op).
  // ------------------------------------------------------------------

  /** Initial cluster state from the corpus's nodes + candidate pairs. */
  def buildClusterState(nodes: DataFrame, idCol: String, pairs: DataFrame,
                        path: String, aCol: String = "id_a",
                        bCol: String = "id_b"): Unit =
    connectedComponents(nodes, idCol, pairs, aCol, bCol)
      .select(col("id"), col("comp"))
      .write.mode("overwrite").parquet(s"$path/clusters")

  /** Union a new batch (its ids + its pairs — both new-vs-indexed probe
    * pairs and within-batch pairs) into the stored labels. */
  def appendToClusterState(newIds: DataFrame, idCol: String,
                           newPairs: DataFrame, path: String,
                           aCol: String = "id_a",
                           bCol: String = "id_b"): Unit = {
    val spark = newIds.sparkSession
    require(Similarity.fsDirExists(spark, s"$path/clusters"),
      s"no cluster state at $path (missing $path/clusters — " +
        "buildClusterState first)")
    val stored = spark.read.parquet(s"$path/clusters")
      .select(col("id"), col("comp"))
    val ids = newIds.select(col(idCol).as("id")).distinct()
    // quotient edge endpoints: stored label if known, else the raw id
    def toLabel(src: Column, out: String) = {
      val lab = stored.select(col("id").as("__lid"), col("comp").as("__lc"))
      (df: DataFrame) => df.join(lab, src === col("__lid"), "left")
        .withColumn(out, coalesce(col("__lc"), src))
        .drop("__lid", "__lc")
    }
    val qEdges = toLabel(col("qb0"), "qb")(
      toLabel(col("qa0"), "qa")(
        newPairs.select(col(aCol).as("qa0"), col(bCol).as("qb0"))))
      .select(col("qa"), col("qb"))
    val qNodes = stored.select(col("comp").as("qid")).distinct()
      .union(ids.select(col("id").as("qid"))).distinct()
    val q = connectedComponents(qNodes, "qid", qEdges, "qa", "qb")
      .select(col("id").as("qlabel"), col("comp").as("newcomp"))
    val relabeledOld = stored
      .join(q, stored("comp") === col("qlabel"))
      .select(col("id"), col("newcomp").as("comp"))
    val labeledNew = ids
      .join(stored.select(col("id")), Seq("id"), "left_anti")
      .join(q, col("id") === col("qlabel"))
      .select(col("id"), col("newcomp").as("comp"))
    // materialize BEFORE overwriting the path the plan reads from
    val next = relabeledOld.union(labeledNew).localCheckpoint()
    next.write.mode("overwrite").parquet(s"$path/clusters")
  }

  /** RETRACT documents from the persisted cluster state — the takedown
    * half of the incremental-label lifecycle. The state stores LABELS
    * only (id, comp), and removing a doc can SPLIT a component it
    * bridged — something no label-only rewrite can compute — so the
    * accumulated candidate-PAIR set is re-supplied by the caller
    * (`pairs`: everything fed to the build plus every append — the
    * [[graft.operators.Pq.rebalanceIvfPqIndex]] re-supply precedent;
    * pair stores like the LSH/signature indexes keep exactly this).
    * Pairs touching a retracted id are dropped here, components re-run
    * over the SURVIVING nodes + pairs, and since
    * [[connectedComponents]] is deterministic, retract(X) ≡
    * buildClusterState(survivors, surviving pairs) EXACTLY — including
    * bridge splits (oracle-pinned). Root rewrites under tmp + one
    * rename-pair swap; fails fast on unknown ids. */
  def retractFromClusterState(ids: DataFrame, idCol: String,
                              pairs: DataFrame, path: String,
                              aCol: String = "id_a",
                              bCol: String = "id_b"): Unit = {
    val spark = ids.sparkSession
    require(Similarity.fsDirExists(spark, s"$path/clusters"),
      s"no cluster state at $path (missing $path/clusters — " +
        "buildClusterState first)")
    val del = Similarity.delIdsOf(ids, idCol)
    val stored = spark.read.parquet(s"$path/clusters")
    Similarity.requireKnownIds(stored.select(col("id")), del,
      "retractFromClusterState")
    val survivors = stored.select(col("id"))
      .join(del, Seq("id"), "left_anti").localCheckpoint()
    val keptPairs = pairs
      .join(del.select(col("id").as(aCol)), Seq(aCol), "left_anti")
      .join(del.select(col("id").as(bCol)), Seq(bCol), "left_anti")
    val next = connectedComponents(survivors, "id", keptPairs, aCol, bCol)
      .select(col("id"), col("comp")).localCheckpoint()
    Similarity.rebuildRoot(path, Seq(), "retractFromClusterState") { tmp =>
      next.write.mode("overwrite").parquet(s"$tmp/clusters")
    }
  }

  /** Stored labels (id, comp). */
  def clusterState(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame = {
    require(Similarity.fsDirExists(spark, s"$path/clusters"),
      s"no cluster state at $path (missing $path/clusters — " +
        "buildClusterState first)")
    spark.read.parquet(s"$path/clusters").select(col("id"), col("comp"))
  }

  /** Stored cluster sizes (comp, n). */
  def clusterSizes(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame =
    clusterState(spark, path).groupBy(col("comp"))
      .agg(count(lit(1)).as("n"))

  /** Candidate near-dups of a NEW batch against the indexed corpus:
    * signature rows for the batch (its only text pass), a (band, bucket)
    * join against the stored rows, distinct pairs. The bucket-size cap
    * applies to INDEX buckets (degenerate boilerplate clusters live in
    * the accumulated corpus; their members are caught by exact dedup) —
    * the oversized-bucket list is tiny → broadcast anti-join. Work is
    * proportional to |index|+|batch| signature rows, never to the
    * corpus text. Returns (id_idx, id_new). */
  def probeLshIndex(newDf: DataFrame, idCol: String, textCol: String,
                    path: String, maxBucketSize: Int = 1000): DataFrame = {
    val spark = newDf.sparkSession
    val (numHashes, bands) = lshMeta(spark, path)
    val idx = spark.read.parquet(s"$path/buckets")
      .select(col("id").as("id_idx"), col("band"), col("bucket"))
    val big = idx.groupBy($"band", $"bucket")
      .agg(count(lit(1)).as("__n")).filter($"__n" > maxBucketSize)
      .select($"band", $"bucket")
    val kept = idx.join(broadcast(big), Seq("band", "bucket"), "left_anti")
    val batch = bucketRows(newDf, idCol, textCol, numHashes, bands)
      .select($"band", $"bucket", $"id".as("id_new"))
    kept.join(batch, Seq("band", "bucket"))
      .select($"id_idx", $"id_new").distinct()
  }
}
