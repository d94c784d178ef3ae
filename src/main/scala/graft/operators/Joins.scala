package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Left/inner equi-joins with the reference's column-conflict rule:
  * right columns OVERRIDE shared non-key columns on a match, and the
  * left value survives on a miss (`/root/reference/core/join.c:158-298`;
  * kdb lj semantics). Plain Spark `join` would either duplicate or drop
  * the shared column — the override needs the presence-flag rewrite. */
object Joins {

  def leftJoinOverride(left: DataFrame, right: DataFrame,
                       keys: Seq[String]): DataFrame =
    joinOverride(left, right, keys, "left")

  def innerJoinOverride(left: DataFrame, right: DataFrame,
                        keys: Seq[String]): DataFrame =
    joinOverride(left, right, keys, "inner")

  private def joinOverride(left: DataFrame, right: DataFrame,
                           keys: Seq[String], how: String): DataFrame = {
    val shared = right.columns.filter(c =>
      left.columns.contains(c) && !keys.contains(c))
    val rightOnly = right.columns.filterNot(c =>
      left.columns.contains(c) || keys.contains(c))
    val r = right
      .select(right.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
      .withColumn("__hit", lit(1))
    val cond = keys.map(k => left(k) === r(s"r_$k")).reduce(_ && _)
    left.join(r, cond, how)
      .select(
        keys.map(col) ++
          left.columns.filterNot(keys.contains).map { c =>
            if (shared.contains(c))
              when($"__hit".isNotNull, col(s"r_$c")).otherwise(col(c)).as(c)
            else col(c).as(c)
          } ++
          rightOnly.map(c => col(s"r_$c").as(c)): _*)
  }
}
