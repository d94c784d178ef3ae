package graft

import org.apache.spark.sql.{Column, DataFrame}


import org.apache.spark.sql.functions._

/** Table facade with the reference's query pipeline semantics
  * (`ray_select`/`ray_update`/insert/upsert/delete,
  * `/root/reference/core/query.c:607-654`, `core/update.c`):
  *
  *  - `select(mappings, where, by, take)` stages exactly as the reference:
  *    where → group → mappings → take (SURVEY.md §3.2);
  *  - under `by`, non-aggregate mappings default to first-per-group;
  *  - `select(by = …)` with no mappings returns the first row per group
  *    across ALL columns (`/root/reference/tests/lang.c:2876-2881`);
  *  - `update` rewrites columns in place (optionally only on `where`
  *    rows), returning a new immutable table (CoW semantics).
  *
  * "First" requires a row order; DataFrames have none, so `Tbl` pins the
  * scan order with a monotonic row id at construction — deterministic for
  * a given file layout, which is what the reference guarantees too (its
  * tables are stored row-ordered).
  */
final case class Tbl(df: DataFrame) {

  import Tbl._

  def cnt: Long = df.count()

  /** Schema as (name, type) pairs — the reference's `meta`. */
  def meta: Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString))

  /** Column access — the reference's `at` on a table. */
  def at(name: String): Column = df(name)

  def select(mappings: Seq[(String, Column)] = Nil,
             where: Column = null,
             by: Seq[String] = Nil,
             take: Int = 0): Tbl = {
    val withId = df.withColumn(rowIdCol, monotonically_increasing_id())
    val filtered = Option(where).map(withId.filter).getOrElse(withId)
    val result: DataFrame =
      if (by.isEmpty) {
        val projected =
          if (mappings.isEmpty) filtered.drop(rowIdCol)
          else filtered.select(mappings.map { case (n, c) => c.as(n) }: _*)
        projected
      } else if (mappings.isEmpty) {
        // first row per group, all columns, keyed on arrival order
        val dataCols = df.columns.filterNot(by.contains)
        filtered.groupBy(by.map(col): _*)
          .agg(min_by(struct((dataCols :+ rowIdCol).map(col): _*),
            col(rowIdCol)).as("__row"))
          .select(by.map(col) ++ dataCols.map(c => col(s"__row.$c").as(c)): _*)
      } else {
        val aggs = mappings.map { case (n, c) =>
          (if (isAggregate(c)) c else min_by(c, col(rowIdCol))).as(n)
        }
        filtered.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
    val taken = if (take > 0) result.limit(take) else result
    Tbl(taken.drop(rowIdCol))
  }

  /** Rewrite columns; with `where`, only matching rows change
    * (reference update, `/root/reference/core/update.c:49`). */
  def update(mappings: Seq[(String, Column)], where: Column = null): Tbl =
    Tbl(mappings.foldLeft(df) { case (d, (n, c)) =>
      val v = Option(where) match {
        case Some(w) if d.columns.contains(n) => when(w, c).otherwise(col(n))
        case Some(w) => when(w, c)
        case None => c
      }
      d.withColumn(n, v)
    })

  /** Append rows (reference insert). */
  def insert(rows: DataFrame): Tbl = Tbl(df.unionByName(rows))

  /** Keyed merge (reference upsert) — see operators.Upsert. */
  def upsert(source: DataFrame, keys: Seq[String]): Tbl =
    Tbl(operators.Upsert.upsert(df, source, keys))

  /** Remove matching rows (reference delete/remove). */
  def delete(where: Column): Tbl = Tbl(df.filter(!where || where.isNull))

  /** Multi-column sorts (reference xasc/xdesc). */
  def xasc(cols: String*): Tbl = Tbl(df.orderBy(cols.map(c => col(c).asc): _*))
  def xdesc(cols: String*): Tbl = Tbl(df.orderBy(cols.map(c => col(c).desc): _*))
}

object Tbl {
  private val rowIdCol = "__rid"

  private val aggNames = Set("sum", "avg", "mean", "min", "max", "count",
    "first", "last", "median", "med", "dev", "stddev", "stddev_pop",
    "stddev_samp", "collect_list", "collect_set", "min_by", "max_by",
    "percentile", "approx_count_distinct", "count_distinct")

  private val aggSqlRegex =
    ("\\b(" + aggNames.mkString("|") + ")\\s*\\(").r

  /** Does the column aggregate? Spark 4 Columns are ColumnNode trees
    * (catalyst conversion is deferred), so walk the node tree: named
    * function calls by name, SQL-string expressions by regex. */
  private[graft] def isAggregate(c: Column): Boolean =
    org.apache.spark.sql.graftshim.ColumnInternals
      .containsAggregate(c, aggNames, aggSqlRegex)

  /** Attach 0-based table positions (the reference's row indices —
    * `core/aggr.c:3118` aggr_row pushes scan positions). zipWithIndex is
    * the distributed-correct way: one extra partition-count pass, no
    * single-partition window, indices contiguous in table order. */
  def withRowIndex(df: org.apache.spark.sql.DataFrame,
                   name: String = "__rowidx"): org.apache.spark.sql.DataFrame = {
    val schema = df.schema.add(name, org.apache.spark.sql.types.LongType,
      nullable = false)
    val rdd = df.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
