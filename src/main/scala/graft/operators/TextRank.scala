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
    // match any engine's replay; adjacency pairs are built ROW-LOCALLY
    // with the arrays_zip-of-slices idiom (NgramLm.pairArr — a
    // codegen'd one-pass zip): a (doc, pos) self-join of the exploded
    // token table would shuffle-join the whole corpus against itself —
    // measured 25–60 s vs ~2 s at the 500k-doc replica.
    val ws = split(col(textCol), " ", -1)
    val tok = corpus
      .select(explode(ws).as("word"))
      .filter($"word" =!= "")
    val cen = tok.groupBy($"word").agg(count(lit(1)).as("cnt"))
    val nodes = cen.filter($"cnt" >= minDf)
      .select($"word", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"cnt".desc, $"word".asc)).as("rk"))
      .filter($"rk" <= maxNodes)
      .select($"word")
    val m = greatest(size(ws) - 1, lit(0))
    val adj = corpus
      .select(explode(arrays_zip(
        slice(ws, lit(1), m).as("wa"), slice(ws, lit(2), m).as("wb"))).as("z"))
      .select($"z.wa".as("ea"), $"z.wb".as("eb"))
      .filter($"ea" =!= "" && $"eb" =!= "" && $"ea" =!= $"eb")
    // the node set is bounded (≤ maxNodes) — pull it ONCE; leaving it
    // lazy re-runs the word census per consumer (two edge-side joins +
    // the final collect = three corpus passes, measured at 100×)
    val words = nodes.orderBy($"word").collect().map(_.getString(0))
    val n = words.length.toLong
    require(n >= 1, "textrank needs at least one node above minDf")
    val nodeDf = spark.createDataFrame(words.toSeq.map(Tuple1(_)))
      .toDF("word")

    // census the DIRECTED pairs (one corpus pass — symmetrizing the
    // pair stream via unionAll re-runs the explode per branch), pull
    // the bounded graph (limit-before-collect), symmetrize on the
    // driver: w(a,b) = w_dir(a,b) + w_dir(b,a).
    val edDir = adj
      .join(broadcast(nodeDf.select($"word".as("ea"))), Seq("ea"))
      .join(broadcast(nodeDf.select($"word".as("eb"))), Seq("eb"))
      .groupBy($"ea", $"eb").agg(count(lit(1)).as("w"))
    val pulled = edDir.limit(maxEdges + 1).collect()
    require(pulled.length <= maxEdges,
      s"textrank graph exceeds maxEdges=$maxEdges — raise minDf or lower maxNodes")
    val idx = words.zipWithIndex.toMap
    val wMap = scala.collection.mutable.HashMap[Long, Long]()
    pulled.foreach { r =>
      val a = idx(r.getString(0)) // groupBy(ea, eb) → columns (ea, eb, w)
      val b = idx(r.getString(1))
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
}
