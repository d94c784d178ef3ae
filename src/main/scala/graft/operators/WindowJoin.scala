package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Window (interval) join: for each left row, aggregate the right rows
  * with the same keys whose time lies within `[ts+loOffset, ts+hiOffset]`
  * (reference `window-join`/`window-join1`,
  * `/root/reference/core/join.c:358-489`, `core/index.c:3287-3346`).
  *
  * Spark-first plan: an equi-join on the keys with the range predicate as
  * a join condition (hash-join on keys, range filter inside), then a
  * groupBy on the left row identity, then a left join back so left rows
  * with no right rows in range survive with NULL aggregates — matching
  * the reference, which emits every left row.
  *
  * Scale notes: the equi-keys carry the shuffle, so this is a standard
  * shuffled hash/sort-merge join — no broadcast needed. If a single key's
  * interval fans out too wide (hot key × wide window), bucket time into
  * coarse chunks and join on (key, chunk) to bound the fan-out.
  */
object WindowJoin {

  /** @param leftId   column(s) uniquely identifying a left row
    * @param keys     equi-join keys in both sides
    * @param ts       time column name in both sides (numeric or timestamp)
    * @param loOffset lower bound offset (added to left ts; may be negative)
    * @param hiOffset upper bound offset
    * @param aggs     aggregates over right columns, pre-aliased
    * @param inclusive include the interval endpoints (`window-join1`);
    *                  exclusive otherwise (`window-join`)
    */
  def windowJoin(left: DataFrame, right: DataFrame, leftId: Seq[String],
                 keys: Seq[String], ts: String, loOffset: Column, hiOffset: Column,
                 aggs: Seq[Column], inclusive: Boolean = true): DataFrame = {
    val l = left.select(left.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
    val keyCond = keys.map(k => col(s"l_$k") === col(k)).reduce(_ && _)
    val lo = col(s"l_$ts") + loOffset
    val hi = col(s"l_$ts") + hiOffset
    val rangeCond =
      if (inclusive) col(ts) >= lo && col(ts) <= hi
      else col(ts) > lo && col(ts) < hi

    val grouped = l.join(right, keyCond && rangeCond, "inner")
      .groupBy(leftId.map(c => col(s"l_$c")): _*)
      .agg(aggs.head, aggs.tail: _*)

    val idCond = leftId.map(c => left(c) === grouped(s"l_$c")).reduce(_ && _)
    left.join(grouped, idCond, "left")
      .drop(leftId.map(c => s"l_$c"): _*)
  }
}
