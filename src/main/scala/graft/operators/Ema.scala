package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import graft.StringToColumn

/** Exponential moving average per key (the kdb-family `ema`, beyond
  * the reference's m-family like q39's sketches):
  *
  *   ema_1 = x_1;   ema_t = (aNum·x_t + (aDen − aNum)·ema_{t−1}) / aDen
  *
  * — a RECURSION over the key's time order, which no window frame
  * expresses (the closed form needs pow, which is not correctly
  * rounded and can't hash-replay — the t13 ln rule). The engine shape
  * is the kdb scan: repartition by key, sort WITHIN partitions by
  * (key, ts, id), one sequential fold pass per partition — keys never
  * straddle partitions, so the fold is embarrassingly parallel across
  * keys and the only exchange is the key repartition. The rational
  * weight (aNum/aDen) keeps the per-step chain (two multiplies, one
  * add, one divide — each correctly rounded) identical to the DuckDB
  * recursive-CTE replay, so the doubles hash-match bit for bit.
  */
object Ema {
  /** (keyCol, idCol, ema) — idCol is the (ts, id) tie-broken order's
    * row identity. */
  def ema(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
          valCol: String, aNum: Int, aDen: Int): DataFrame = {
    require(aNum >= 1 && aNum <= aDen, s"alpha $aNum/$aDen outside (0, 1]")
    val spark = df.sparkSession
    val prepared = df
      .select(col(keyCol).cast("long").as("k"),
        col(tsCol).cast("long").as("t"), col(idCol).cast("long").as("i"),
        col(valCol).cast("double").as("v"))
      .repartition(col("k"))
      .sortWithinPartitions($"k", $"t", $"i")
    val out = prepared.queryExecution.toRdd.mapPartitions { it =>
      var curKey = Long.MinValue
      var haveKey = false
      var prev = 0.0
      it.map { r =>
        // UnsafeRow getters read a null slot as 0 without signaling —
        // fail fast rather than merge rows into key 0 / fold in 0.0
        var c = 0
        while (c < 4) {
          if (r.isNullAt(c)) throw new IllegalArgumentException(
            s"Ema.ema: null in projected column index $c (key/ts/id/value must be non-null)")
          c += 1
        }
        val (k, i, v) = (r.getLong(0), r.getLong(2), r.getDouble(3))
        val e =
          if (!haveKey || k != curKey) { haveKey = true; curKey = k; v }
          else (aNum * v + (aDen - aNum) * prev) / aDen
        prev = e
        org.apache.spark.sql.catalyst.InternalRow(k, i, e)
      }
    }
    org.apache.spark.sql.graftshim.ColumnInternals.internalDataFrame(
      spark, StructType(Seq(
        StructField(keyCol, LongType, nullable = false),
        StructField(idCol, LongType, nullable = false),
        StructField("ema", DoubleType, nullable = false))), out)
  }
}
