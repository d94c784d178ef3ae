package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Deterministic corpus sampling for data mixing: every row's keep
  * decision is a pure function of its id, so a sample is reproducible
  * run-to-run, engine-to-engine, and stable under repartitioning —
  * unlike `rand()`-based sampling, which is none of those. The decision
  * value is a Knuth multiplicative hash of the id mapped to [0, 1)
  * (id·2654435761 mod 2³², golden-ratio constant), plain integer
  * arithmetic any SQL engine evaluates bit-identically — ids up to
  * ~3.4e9 stay within signed-64 range before the mod.
  *
  * At 100 TB this is a narrow map over the scan — no shuffle, no RNG
  * state, prunable columns untouched. */
object Sampling {

  /** Uniform [0,1) decision value for an integral id column. */
  def decision(id: Column): Column =
    pmod(id * lit(2654435761L), lit(4294967296L)).cast("double") /
      4294967296.0

  /** Keep predicate at a fixed rate. */
  def keep(id: Column, rate: Column): Column = decision(id) < rate

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
}
