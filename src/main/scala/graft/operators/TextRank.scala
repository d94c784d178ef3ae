package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
  * PageRank over the word co-occurrence graph — nodes are corpus-
  * frequent words, edges are adjacent-word pairs weighted by their
  * corpus count (symmetrized), and the stationary score ranks keywords.
  *
  * ENTIRELY in integers so the power iteration replays bit-for-bit in
  * any engine (the Lloyd/BPE replay discipline — doubles would make
  * iteration k's sums order-dependent):
  *
  *   SCALE = 2^40,  RSCALE = 2^20
  *   r(a,b)  = (w(a,b)·RSCALE) div wout(a)          — edge ratio ≤ RSCALE
  *   p0(v)   = SCALE div n
  *   T       = (15·SCALE) div (100·n)               — teleport term
  *   p'(v)   = T + Σ_{a→v} ((p(a)·85 div 100) · r(a,b)) div RSCALE
  *
  * Every iteration operand is bounded: Σp is conserved-or-shrunk by
  * the floor losses, so p ≤ SCALE < 2^41, p·85 < 2^48,
  * (p·85 div 100)·r < 2^61 — the pre-scaled ratio r, not the raw edge
  * weight, multiplies p. The one corpus-scale operand is the ratio's
  * own w·RSCALE, runtime-guarded at a 2^41 directed-edge cap (the KN
  * runtime-operand rule).
  *
  * Shape at 100 TB: the heavy work is two corpus-sized shuffles (the
  * adjacency-pair census and the word census) with map-side combine;
  * the graph itself is bounded by the `minDf` + top-`maxNodes` gate
  * (cnt DESC, word ASC — deterministic), so the iteration loop runs on
  * the driver over ≤ maxEdges edges (limit-before-collect gated, the
  * GraphAnn `maxAppendBatch` rule) — iterating lazily as stacked
  * DataFrame joins would re-run the corpus census once per iteration.
  *
  * Reference scope: grouped select / rank surface
  * (`/root/reference/core/query.c`, `core/env.c` rank); the TextRank
  * composition is the standard keyword-extraction extension. */
object TextRank {

  /** Bounded-graph gate: collecting more edges than this fails fast —
    * raise `minDf` / lower `maxNodes` instead (the graph is a model
    * artifact, never corpus-sized). */
  val maxEdges: Int = 1 << 20

  val Scale: Long = 1L << 40
  val RScale: Long = 1L << 20

  /** Top-`k` keywords: (word, pr, rk) after `iters` integer PageRank
    * rounds, ordered by (pr DESC, word ASC). */
  def keywords(corpus: DataFrame, textCol: String,
               minDf: Long, maxNodes: Int, iters: Int, k: Int): DataFrame = {
    require(minDf >= 1 && maxNodes >= 1 && iters >= 1 && k >= 1,
      s"need positive minDf/maxNodes/iters/k, got $minDf/$maxNodes/$iters/$k")
    val spark = corpus.sparkSession

    // split keeps trailing empties (the t69 lesson) so raw positions
    // match any engine's replay. The node gate is a
    // TakeOrderedAndProject (orderBy+limit, the zipfCard shape) — a
    // row_number window with no partitionBy would funnel the whole
    // minDf-filtered vocabulary through ONE task before the cut.
    val ws = split(col(textCol), " ", -1)
    val tok = corpus
      .select(explode(ws).as("word"))
      .filter($"word" =!= "")
    val cen = tok.groupBy($"word").agg(count(lit(1)).as("cnt"))
    val nodes = cen.filter($"cnt" >= minDf)
      .orderBy($"cnt".desc, $"word".asc).limit(maxNodes)
      .select($"word")
    // the node set is bounded (≤ maxNodes) — pull it ONCE; leaving it
    // lazy re-runs the word census per consumer (two edge-side joins +
    // the final collect = three corpus passes, measured at 100×)
    val words = nodes.orderBy($"word").collect().map(_.getString(0))
    val n = words.length.toLong
    require(n >= 1, "textrank needs at least one node above minDf")

    // census the DIRECTED pairs (one corpus pass — symmetrizing the
    // pair stream via unionAll re-runs the explode per branch), pull
    // the bounded graph (limit-before-collect), symmetrize on the
    // driver: w(a,b) = w_dir(a,b) + w_dir(b,a).
    val pulled = edgeCensus(corpus, textCol, words)
      .limit(maxEdges + 1).collect()
    require(pulled.length <= maxEdges,
      s"textrank graph exceeds maxEdges=$maxEdges — raise minDf or lower maxNodes")
    val wMap = scala.collection.mutable.HashMap[Long, Long]()
    pulled.foreach { r =>
      val a = r.getInt(0) // groupBy(ia, ib) → columns (ia, ib, w)
      val b = r.getInt(1)
      val w = r.getLong(2)
      // runtime-operand guard (the KN rule): the symmetrized weight
      // multiplies RScale below — w·2^20 must stay inside i64. The
      // oracle's BIGINT would error loudly; the driver must not wrap.
      require(w <= (1L << 41),
        s"textrank edge weight $w overflows the 2^20-scaled ratio " +
          "(directed cap 2^41 so the symmetrized sum stays <= 2^42 " +
          "and w*2^20 <= 2^62) — raise minDf or shard the corpus")
      val ka = a.toLong * words.length + b
      val kb = b.toLong * words.length + a
      wMap.update(ka, wMap.getOrElse(ka, 0L) + w)
      wMap.update(kb, wMap.getOrElse(kb, 0L) + w)
    }
    val wout = new Array[Long](words.length)
    val edges = wMap.toArray.map { case (k, w) =>
      val a = (k / words.length).toInt
      val b = (k % words.length).toInt
      wout(a) += w
      (a, b, w)
    }
    val ratio = edges.map { case (a, b, w) => (a, b, w * RScale / wout(a)) }
    val t0 = 15L * Scale / (100L * n)
    var p = Array.fill(words.length)(Scale / n)
    var it = 0
    while (it < iters) {
      val nx = Array.fill(words.length)(t0)
      ratio.foreach { case (a, b, r) => nx(b) += (p(a) * 85L / 100L) * r / RScale }
      p = nx
      it += 1
    }
    val rows = words.indices.map(i => (words(i), p(i)))
      .sortBy { case (w, pr) => (-pr, w) }
      .take(k).zipWithIndex
      .map { case ((w, pr), i) => (w, pr, (i + 1).toLong) }
    spark.createDataFrame(rows).toDF("word", "pr", "rk")
  }

  /** The directed adjacency-pair census, DICTIONARY-ENCODED in one
    * codegen pass (functions/DictPairCodes — the AcExpr/Bloom
    * reference-object shipping): the walk tokenizes, keeps only pairs
    * with BOTH endpoints in the bounded node dictionary, and emits
    * packed `ia<<32|ib` longs — so the explode produces graph-relevant
    * rows only and the one corpus-scale exchange carries (long,
    * partial-count), never strings (PlanShapeSpec pins it). Exact, not
    * hashed: the dictionary is the collected node set, so the t92
    * oracle hash cannot move. This replaced the arrays_zip-of-slices
    * struct explode + two broadcast string joins, which materialized
    * EVERY adjacent pair of the corpus as a (string, string) row —
    * 100×: 4.8–5.0 s → 1.25 s warm per 500k docs for the WHOLE t92
    * run, the residual being the node word census. (The zip idiom
    * itself remains the right call vs a (doc, pos) self-join — that
    * read 25–60 s — it just loses to a single fused walk here.) */
  private[graft] def edgeCensus(corpus: DataFrame, textCol: String,
                                words: Array[String]): DataFrame = {
    import graft.functions.DictPairCodes.dictPairCodes
    corpus
      .select(explode(dictPairCodes(col(textCol),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(words)))
        .as("pc"))
      .groupBy($"pc").agg(count(lit(1)).as("w"))
      .select(shiftright($"pc", 32).cast("int").as("ia"),
        $"pc".bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("ib"), $"w")
  }
}
