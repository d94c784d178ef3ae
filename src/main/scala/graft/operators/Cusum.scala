package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.StringToColumn

/** Per-key upper CUSUM change detection (Page 1954 — the classic
  * sequential drift/shift detector; the per-key live-monitoring
  * analytic next to EMA in the kdb scan family):
  *
  *   S_0 = 0;   S_t = max(0, S_{t−1} + (v_t − kRef))
  *
  * S accumulates exactly the evidence that recent values sit ABOVE the
  * reference level `kRef` and resets to 0 whenever the evidence
  * empties — an alarm is `S_t > h` for a chosen decision interval h.
  * A RECURSION over the key's time order (the max() reset makes it
  * non-windowable — no prefix-sum trick expresses it), so the engine
  * shape is the [[Ema]] scan: repartition by key, sort within
  * partitions by (key, ts, id), one sequential fold per partition —
  * keys never straddle partitions, the only exchange is the key
  * repartition.
  *
  * ENTIRELY integer (values arrive pre-quantized — the q68 ×100 cents
  * convention), so the fold replays bit-for-bit as a DuckDB recursive
  * CTE with no rounding discipline at all. Overflow: S grows at most
  * Σ(v − kRef) ≤ n·max(v); guard at the caller if values exceed the
  * i64 headroom (events cents ≤ 2^16, n ≤ 2^40 is safe).
  */
object Cusum {

  /** (keyCol, idCol, s) — `valQ` must be a NON-NULL integral column
    * (pre-quantized); order is (ts, id) within each key. */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
            valQ: Column, kRef: Long): DataFrame = {
    val spark = df.sparkSession
    val prepared = df
      .select(col(keyCol).cast("long").as("k"),
        col(tsCol).cast("long").as("t"), col(idCol).cast("long").as("i"),
        valQ.cast("long").as("v"))
      .repartition(col("k"))
      .sortWithinPartitions($"k", $"t", $"i")
    val out = prepared.queryExecution.toRdd.mapPartitions { it =>
      var curKey = Long.MinValue
      var haveKey = false
      var prev = 0L
      it.map { r =>
        // UnsafeRow getters read a null slot as 0 without signaling —
        // fail fast rather than fold nulls in as zeros (the Ema rule)
        var c = 0
        while (c < 4) {
          if (r.isNullAt(c)) throw new IllegalArgumentException(
            s"Cusum.cusum: null in projected column index $c " +
              "(key/ts/id/value must be non-null)")
          c += 1
        }
        val (k, i, v) = (r.getLong(0), r.getLong(2), r.getLong(3))
        val base = if (!haveKey || k != curKey) {
          haveKey = true; curKey = k; 0L
        } else prev
        val s = math.max(0L, base + (v - kRef))
        prev = s
        org.apache.spark.sql.catalyst.InternalRow(k, i, s)
      }
    }
    org.apache.spark.sql.graftshim.ColumnInternals.internalDataFrame(
      spark, StructType(Seq(
        StructField(keyCol, LongType, nullable = false),
        StructField(idCol, LongType, nullable = false),
        StructField("s", LongType, nullable = false))), out)
  }
}
