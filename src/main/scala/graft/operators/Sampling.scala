package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Deterministic corpus sampling for data mixing: every row's keep
  * decision is a pure function of its id, so a sample is reproducible
  * run-to-run, engine-to-engine, and stable under repartitioning —
  * unlike `rand()`-based sampling, which is none of those. The decision
  * value is a multiplicative hash mapped to [0, 1): the id is split into
  * its low 31 bits and the (floored) high word, each word multiplied by
  * a public odd constant (Knuth 2654435761 / xxHash PRIME32_2) and the
  * mix reduced mod 2³² — plain integer arithmetic any SQL engine
  * evaluates bit-identically. The two-word split keeps every multiply
  * under 2⁶² so the FULL i64 id range is in-domain under ANSI mode (a
  * 100 TB corpus has more than 2³¹ documents); for ids below 2³¹ the
  * high word is 0 and the value reduces to the classic id·K mod 2³².
  *
  * At 100 TB this is a narrow map over the scan — no shuffle, no RNG
  * state, prunable columns untouched. */
object Sampling {

  /** The integer mix value in [0, 2³²) behind `decision` — usable
    * directly as a deterministic pseudorandom ORDER key (dividing by
    * 2³² is monotone, so ordering by the integer ≡ ordering by the
    * double, without the float). */
  def decisionHash(id: Column): Column = {
    val idL = id.cast("long")
    val lo = pmod(idL, lit(2147483648L))              // low 31 bits
    val hi = pmod(shiftright(idL, 31), lit(2147483648L)) // floor(id/2^31)
    pmod(pmod(lo * lit(2654435761L), lit(4294967296L)) +
        pmod(hi * lit(2246822519L), lit(4294967296L)),
      lit(4294967296L))
  }

  /** Uniform [0,1) decision value for an integral id column (total on
    * the full i64 range). */
  def decision(id: Column): Column =
    decisionHash(id).cast("double") / 4294967296.0

  /** Keep predicate at a fixed rate. */
  def keep(id: Column, rate: Column): Column = decision(id) < rate

  /** DETERMINISTIC weighted priority sampling — per stratum, the k rows
    * with the smallest hash-priority `decisionHash(id) / w`: selection
    * odds grow with the weight (a row with twice the weight halves its
    * priority), yet the draw is a pure function of (id, w) — rerun,
    * engine, and layout invariant, the t06 hash-gate idea extended to
    * WEIGHTED selection (quality-weighted corpus subsampling, w =
    * quality score / length / dedup multiplicity). The priority is one
    * correctly-rounded double division of exact integers, identical in
    * any engine; ranking tie-breaks on id for a total order. A
    * map-side WindowGroupLimit caps each task's contribution at k
    * before the single stratum shuffle.
    *
    * Returns (stratumCol, rk, idCol, w, pri) for the k kept rows per
    * stratum; `wCol` must be a positive integral column — ENFORCED
    * row-level (the Ema fail-fast rule): w ≤ 0 would otherwise yield
    * priority ±Infinity and silently never-sample (w = 0) or
    * rank-FIRST (w < 0), inverting selection, and a null weight would
    * silently drop the row. */
  def weightedSample(df: DataFrame, idCol: String, stratumCol: String,
                     wCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOk = when(col(wCol).isNull || col(wCol).cast("long") <= 0L,
      raise_error(concat(
        lit(s"weightedSample needs a positive integral '$wCol', got "),
        coalesce(col(wCol).cast("string"), lit("NULL")))).cast("long"))
      .otherwise(col(wCol).cast("long"))
    val win = Window.partitionBy(col(stratumCol))
      .orderBy(col("pri").asc, col(idCol).asc)
    df.select(col(stratumCol), col(idCol), wOk.as("w"),
        (decisionHash(col(idCol)).cast("double") /
          wOk.cast("double")).as("pri"))
      .withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .select(col(stratumCol), col("rk"), col(idCol), col("w"), col("pri"))
  }

  /** Weighted (per-stratum) sampling — the data-mixing step: each key in
    * `rates` keeps that fraction of its rows, everything else keeps
    * `default`. */
  def sampleByRates(df: DataFrame, idCol: String, stratumCol: String,
                    rates: Map[String, Double],
                    default: Double): DataFrame = {
    val rate = rates.foldLeft(lit(default)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(keep(col(idCol), rate))
  }

  /** Mixing to TARGET PROPORTIONS (downsample-only): derive per-stratum
    * keep rates so the sample's expected composition matches `targets`
    * (fractions of the output, e.g. en→0.6, de→0.25, fr→0.15) at the
    * largest total the corpus supports without upsampling — the stratum
    * that runs out first is kept whole and everything else is thinned
    * to match. Strata not in `targets` are dropped; target strata
    * absent from the corpus are ignored (the mix is over present
    * strata). One count-by-stratum aggregation (output rows = stratum
    * cardinality, a bounded driver collect for a mixing config), then
    * the same hash-keep narrow map — at 100 TB: one cheap agg + scan,
    * no shuffle of the data itself, reproducible under repartitioning. */
  def sampleToMix(df: DataFrame, idCol: String, stratumCol: String,
                  targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be positive fractions")
    val counts = df.groupBy(col(stratumCol)).count()
      .filter(col(stratumCol).isInCollection(targets.keys.toSeq))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no target stratum present in the corpus")
    // the binding stratum: largest supportable total = min n_s / t_s;
    // double arithmetic written identically to the oracle SQL
    // (tgt * T / n) so driver rates are bit-exact with its recompute
    val tmin = targets.collect {
      case (k, t) if counts.contains(k) => counts(k) / t
    }.min
    val rates = targets.collect { case (k, t) if counts.contains(k) =>
      k -> (t * tmin / counts(k))
    }
    val rate = rates.foldLeft(lit(-1.0)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc) // -1 → drop
    }
    df.filter(keep(col(idCol), rate))
  }

  /** Temperature-flattened source rebalancing at α = 1/2 — the
    * multilingual/multi-source mixing rule (sample stratum s with
    * probability ∝ n_s^α, α < 1 flattening the head: XLM-R, mT5 and
    * every multilingual pretraining mix use this family). Realized as
    * downsample-only keep rates `rate_s = sqrt(n_min / n_s)`: the
    * smallest stratum is kept whole and every larger one thinned so
    * kept counts are ∝ n_s^(1/2). α is FIXED at 1/2 because sqrt is
    * the one power IEEE guarantees correctly rounded — `n_min / n_s`
    * is one exact-input division, so the rate (and therefore every
    * keep decision) is bit-identical in any engine; a general pow(x,α)
    * is a libm call with no cross-engine rounding contract.
    *
    * One count-by-stratum aggregation (bounded driver collect — strata
    * are a mixing config, not data-scale), then the deterministic
    * id-hash keep: at 100 TB one cheap agg plus a narrow scan. */
  def temperatureRates(df: DataFrame, stratumCol: String): Map[String, Double] = {
    // NULL strata are excluded from the mix entirely (they'd never
    // match the equality-keyed rate column anyway) — and must not
    // reach the map/sort as a null String key
    val counts = df.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty corpus (or all-null strata)")
    val nMin = counts.values.min
    counts.map { case (k, n) => k -> math.sqrt(nMin.toDouble / n) }
  }

  /** Apply [[temperatureRates]]: rows kept iff hash(id) < rate(stratum),
    * with the per-row `rate` column retained for audit. */
  def temperatureSample(df: DataFrame, idCol: String,
                        stratumCol: String): DataFrame = {
    val rates = temperatureRates(df, stratumCol)
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(-1.0)) {
      case (acc, (k, r)) => when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    df.withColumn("rate", rate).filter(keep(col(idCol), col("rate")))
  }

  /** Deterministic train/val/test (or any n-way) split assignment: the
    * id's decision value against explicit cumulative UPPER BOUNDS —
    * `bounds = (train→0.8, val→0.9)` labels u<0.8 train, u<0.9 val,
    * everything else `lastLabel`. Bounds are caller-supplied literals
    * (never summed fractions: 0.8+0.1 ≠ 0.9 in IEEE doubles, and a
    * recomputed boundary would disagree with an engine replaying the
    * literal). Same properties as `decision`: reproducible,
    * repartition-stable, a narrow map — rows never shuffle to split. */
  def splitAssign(id: Column, bounds: Seq[(String, Double)],
                  lastLabel: String): Column = {
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      "split bounds must be non-decreasing")
    val d = decision(id)
    bounds.foldRight(lit(lastLabel): Column) { case ((label, ub), acc) =>
      when(d < ub, label).otherwise(acc)
    }
  }

  /** Deterministic global shuffle + sharding — the training-data "last
    * mile": every row gets a reproducible pseudorandom shard and a
    * position within it, so any trainer reading shard files sees the
    * same order run-to-run. shard = floor(u·nShards) on the id-hash
    * decision (u is an exact 32-bit-significand double, so the product
    * and floor are exact in any engine); position = rank by (u, id)
    * WITHIN the shard. 100 TB shape: hash-bucketing balances shards
    * without a global sort, and the rank window is PARTITIONED by shard
    * — one nShards-way exchange, never a single-partition global
    * row_number.
    *
    * SHARD SIZING: each shard's rank sorts inside ONE task, so size
    * nShards to the corpus — rows/nShards should stay in the low tens
    * of millions (a few GB of (row, u) per task; Spark's window sort
    * SPILLS past its row buffer rather than OOMing, but spill is
    * disk-speed). Rule of thumb: nShards ≈ corpusRows / 10⁷, and at
    * least the cluster's task parallelism. Measured on the 100×
    * documents replica (500k rows, `graft.TimeShard`): nShards=64
    * 0.4-0.6s warm, nShards=8 0.33s; a deliberately skewed nShards=1
    * (every row through ONE sorting task) still completes in 0.75-0.9s
    * — graceful single-task degradation; PipelineSpec additionally
    * forces the window buffer to spill (tiny
    * spark.sql.windowExec.buffer.spill.threshold) and pins identical
    * results. */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, "nShards must be positive")
    // reserved output/internal names: clobbering a caller column would
    // silently corrupt it (project through fresh names instead)
    val reserved = Seq("__u", "shard", "pos").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"shardShuffle: input already has column(s) ${reserved.mkString(", ")}")
    val w = Window.partitionBy($"shard").orderBy($"__u", col(idCol))
    df.withColumn("__u", decision(col(idCol)))
      .withColumn("shard", floor($"__u" * nShards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__u")
  }

  /** Cluster-balanced downsampling (topic balance for a training mix):
    * assign each vector to its nearest-centroid cell (the shuffle-free
    * codegen map from the IVF build), cap every cell at the SMALLEST
    * cell's population, and keep each cell's rows in the deterministic
    * id-hash order — an equal-representation sample over latent topics
    * (the cluster-proportional curation step semantic-dedup pipelines
    * pair with SemDeDup). One narrow assignment map + one nCells-row
    * count agg + one cell-partitioned rank window; the embedding column
    * never shuffles. */
  def clusterBalance(df: DataFrame, idCol: String, vecCol: String,
                     cents: Array[(Int, Seq[Double])]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val assigned = Similarity.assignCells(v, cents)
    val capRow = assigned.groupBy($"cell").count()
      .agg(min($"count")).collect()(0)
    require(!capRow.isNullAt(0), "clusterBalance: empty input")
    val cap = capRow.getLong(0)
    val w = Window.partitionBy($"cell").orderBy(decision($"id"), $"id")
    assigned.withColumn("rk", row_number().over(w))
      .filter($"rk" <= cap)
      .select($"cell", $"rk", $"id")
  }

  /** Token-budget EPOCH mixing — the repeat-upsampling half of a data
    * mix (`sampleToMix` is the downsample half; LLaMA-style recipes
    * need both: "3.3 epochs of Wikipedia, 0.6 of CommonCrawl"): each
    * source s gets an integer token budget B_s; the materialized mix
    * holds floor(B_s / T_s) FULL epochs of s (T_s = its corpus token
    * mass) plus one deterministic PARTIAL epoch — docs in hash order
    * until the remainder is covered, overshooting by at most one
    * document (the greedy-pack rule, t08). Sources without a budget
    * are dropped. Output: one (id, src, epoch) row per materialized
    * copy — the trainer's sampling manifest.
    *
    * Scale shape: one narrow token-count map, a source-cardinality agg
    * broadcast back, ONE per-source window cumsum (the only data
    * shuffle), and an explode bounded by B_s/T_s. All arithmetic is
    * integer — engine-exact and oracle-replayable. */
  def epochMix(df: DataFrame, idCol: String, srcCol: String,
               textCol: String, budgets: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0),
      "budgets must be non-negative token counts")
    val toks = df
      .filter(col(srcCol).isInCollection(budgets.keys.toSeq))
      .select(col(idCol).as("id"), col(srcCol).as("src"),
        size(split(col(textCol), " ")).cast("long").as("n"))
    val budget = budgets.foldLeft(lit(-1L)) { case (acc, (k, b)) =>
      when(col("src") === k, lit(b)).otherwise(acc)
    }
    val tot = toks.groupBy($"src").agg(sum($"n").as("t_src"))
    val w = Window.partitionBy($"src")
      .orderBy(decisionHash($"id"), $"id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(broadcast(tot), "src")
      .withColumn("b_src", budget)
      .withColumn("cum_excl", coalesce(sum($"n").over(w), lit(0L)))
      .withColumn("epochs",
        expr("b_src div t_src") +
          when($"cum_excl" < expr("b_src % t_src"), 1L).otherwise(0L))
      .filter($"epochs" > 0)
      .select($"id", $"src",
        explode(sequence(lit(0L), $"epochs" - 1)).as("epoch"))
  }
}
