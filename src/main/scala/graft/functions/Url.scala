package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl stage BEFORE text dedup: two
  * fetches of `HTTP://WWW.Ex.COM:80/a?utm_source=x#top` and
  * `http://ex.com/a` are the same page, and host-level caps/dedup are
  * meaningless until both spell the same. Pure string arithmetic
  * (lower / replace / two anchored-by-construction regexes), generated
  * from ONE home for BOTH dialects ([[canonSql]] — the Cms.bucketSql
  * pattern), so the DuckDB oracle replays it bit-for-bit.
  *
  * Rules (the standard crawl-frontier set):
  *   - fragment stripped (`#...` is client-side only);
  *   - scheme + authority lowercased; path/query case preserved;
  *   - `www.` host prefix dropped;
  *   - default ports stripped (`:80` for http, `:443` for https;
  *     non-default ports survive);
  *   - tracking params removed (`utm_*`, `fbclid`, `gclid`, `ref`) via
  *     the `?`→`?&` normalization trick: prefixing every first param
  *     with `&` makes one global `&name=[^&]*` replace handle first,
  *     middle, and last positions without lookbehind (RE2 has none) —
  *     and `&noref=` can never false-match because the `&` is the
  *     anchor; an emptied query drops its trailing `?`.
  *
  * Scale shape: a narrow per-row map — no shuffle, no UDF; the whole
  * chain is builtin string expressions inside codegen. Schemeless
  * inputs pass through with only fragment/query cleanup (the authority
  * prefix extract matches empty). */
object Url {

  private val TrackRe = "&(utm_[a-z0-9]+|fbclid|gclid|ref)=[^&]*"

  /** The canonicalization of SQL fragment `u`, in the Spark or DuckDB
    * dialect (they differ ONLY in regexp_replace's global flag —
    * Spark replaces all matches by default, DuckDB needs 'g'). */
  def canonSql(u: String, duck: Boolean): String = {
    def rrAll(x: String, pat: String): String =
      if (duck) s"regexp_replace($x, '$pat', '', 'g')"
      else s"regexp_replace($x, '$pat', '')"
    // 1. fragment off (the single regex eats to end-of-string)
    val noFrag =
      if (duck) s"regexp_replace($u, '#.*', '')"
      else s"regexp_replace($u, '#.*', '')"
    // 2. authority = scheme://host[:port], lowercased, www-stripped,
    //    default ports dropped (suffix tests via LIKE — no regex
    //    anchors, whose escaping differs across dialects)
    val pre0 =
      if (duck) s"regexp_extract($noFrag, '^[^:/?#]+://[^/?]*')"
      else s"regexp_extract($noFrag, '^[^:/?#]+://[^/?]*', 0)"
    val preL = s"replace(lower($pre0), '://www.', '://')"
    val preP = s"(CASE WHEN $preL LIKE 'http://%:80' " +
      s"THEN substr($preL, 1, length($preL) - 3) " +
      s"WHEN $preL LIKE 'https://%:443' " +
      s"THEN substr($preL, 1, length($preL) - 4) " +
      s"ELSE $preL END)"
    // 3. path + query with tracking params removed
    val rest0 = s"substr($noFrag, length($pre0) + 1)"
    val rest1 = s"replace($rest0, '?', '?&')"
    val rest2 = rrAll(rest1, TrackRe)
    val rest3 = s"replace($rest2, '?&', '?')"
    val rest4 = s"(CASE WHEN $rest3 LIKE '%?' " +
      s"THEN substr($rest3, 1, length($rest3) - 1) ELSE $rest3 END)"
    s"($preP || $rest4)"
  }

  /** The canonical host (lowercase, no www., no port) — the host-cap /
    * host-dedup key. Empty string for schemeless inputs. */
  def hostSql(u: String, duck: Boolean): String = {
    val canon = canonSql(u, duck)
    s"regexp_extract($canon, '://([^:/?#]*)', 1)"
  }

  /** Column forms (the Spark dialect through expr — same generated
    * arithmetic as the oracle). */
  def canon(urlCol: String): Column = expr(canonSql(urlCol, duck = false))
  def host(urlCol: String): Column = expr(hostSql(urlCol, duck = false))

  /** Host-level census + cap over a URL column — the t17
    * per-source-cap shape keyed on the CANONICAL host: per host,
    * n_urls (raw), n_canon (distinct canonical URLs — the dedup), and
    * n_kept = min(n_canon, cap) where the kept set is the cap
    * lowest-(first doc) canonical representatives (deterministic,
    * layout-invariant). One canonicalizing map + one (host, canon)
    * aggregation + one host aggregation — never a corpus self-join. */
  def hostCapCensus(df: DataFrame, idCol: String, urlCol: String,
                    cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val canoned = df.select(col(idCol).as("__id"),
      canon(urlCol).as("canon"), host(urlCol).as("host"))
    val perCanon = canoned.groupBy(col("host"), col("canon"))
      .agg(count(lit(1)).as("n_raw"), min(col("__id")).as("first_id"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host"))
      .orderBy(col("first_id").asc, col("canon").asc)
    perCanon.withColumn("rk", row_number().over(w))
      .groupBy(col("host"))
      .agg(sum(col("n_raw")).as("n_urls"),
        count(lit(1)).as("n_canon"),
        sum(when(col("rk") <= cap, 1L).otherwise(0L)).as("n_kept"),
        min(col("canon")).as("first_url"))
  }
}
