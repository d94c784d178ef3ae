package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed upsert: rows of `source` matching `target` on the key columns
  * replace the target row's non-key values; non-matching source rows are
  * appended (reference `upsert`, `/root/reference/core/update.c:556-751`,
  * `index_upsert_obj`).
  *
  * Spark-first rewrite: a full-outer join on the keys with
  * `coalesce(source, target)` per non-key column. One shuffle on the key;
  * at warehouse scale the same semantics are a Delta/Iceberg MERGE — this
  * is the engine-level equivalent without a table format.
  *
  * Target row order is not preserved (the reference updates in place);
  * callers needing stable output sort on the key, which every oracle
  * query does anyway.
  */
object Upsert {

  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(target.columns.sameElements(source.columns) ||
      source.columns.forall(target.columns.contains),
      "source columns must be a subset of target columns")
    val nonKey = target.columns.filterNot(keys.contains).toSeq
    // presence flag, not per-column coalesce: a matched source row wins
    // wholesale, even where its values are NULL (reference update-in-place).
    val s = source
      .select(source.columns.map(c => col(c).as(s"s_$c")).toSeq: _*)
      .withColumn("__hit", lit(1))
    val cond = keys.map(k => target(k) === s(s"s_$k")).reduce(_ && _)
    target.join(s, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"s_$k"), col(k)).as(k)) ++
          nonKey.map { c =>
            if (source.columns.contains(c))
              when(col("__hit").isNotNull, col(s"s_$c")).otherwise(col(c)).as(c)
            else col(c).as(c)
          }: _*)
  }
}
