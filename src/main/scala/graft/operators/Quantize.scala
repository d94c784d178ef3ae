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
    * worst-case per-dimension reconstruction error). */
  def quantize(df: DataFrame, vecCol: String,
               mins: Array[Double], maxs: Array[Double]): DataFrame = {
    val q = codes(col(vecCol), mins, maxs)
    val errs = zip_with(col(vecCol), dequantize(q, mins, maxs),
      (x, r) => abs(x.cast("double") - r))
    df.withColumn("codes", q)
      .withColumn("max_err", array_max(errs))
  }
}
