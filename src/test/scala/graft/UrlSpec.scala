package graft

import org.apache.spark.sql.functions._
import graft.functions.Url

/** t68 URL canonicalization: golden cases for the tricky URLs (case,
  * default vs real ports, fragments, tracking params in every
  * position, near-miss param names), and the host-cap census shape. */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(urls: Seq[String]): Map[String, String] =
    urls.toDF("url")
      .select($"url", Url.canon("url").as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("canonicalization goldens: case folds on authority only, " +
      "default ports and www. drop, fragments drop, tracking params " +
      "drop in first/middle/last position, near-miss names survive") {
    val cases = Seq(
      "HTTP://WWW.Ex.COM:80/a?utm_source=x" -> "http://ex.com/a",
      "https://Ex.com:443/A/B?x=1" -> "https://ex.com/A/B?x=1",
      "http://ex.com:8080/a" -> "http://ex.com:8080/a", // real port kept
      "https://ex.com/a#frag" -> "https://ex.com/a",
      "http://ex.com/a?ref=tw" -> "http://ex.com/a",
      "http://ex.com/a?fbclid=1&id=2" -> "http://ex.com/a?id=2",
      "http://ex.com/a?id=1&gclid=z" -> "http://ex.com/a?id=1",
      "http://ex.com/a?id=1&utm_campaign=z&x=2" ->
        "http://ex.com/a?id=1&x=2",
      // near-miss param names must NOT be stripped (& is the anchor)
      "http://ex.com/a?noref=1&xref=2" -> "http://ex.com/a?noref=1&xref=2",
      // path/query case preserved; only the authority lowers
      "HTTPS://WWW.EX.COM/Path?Q=UPPER#X" -> "https://ex.com/Path?Q=UPPER",
      // everything at once
      "HTTP://WWW.A.Example.COM:80/docs/3?utm_source=f&id=9&ref=t#top" ->
        "http://a.example.com/docs/3?id=9",
      // schemeless input: only fragment/query cleanup applies
      "ex.com/a?utm_source=x#f" -> "ex.com/a")
    val got = canonOf(cases.map(_._1))
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"'$in' -> '${got(in)}', want '$want'")
    }
    // hosts
    val hosts = cases.map(_._1).toDF("url")
      .select($"url", Url.host("url").as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(hosts("HTTP://WWW.Ex.COM:80/a?utm_source=x") == "ex.com")
    assert(hosts("http://ex.com:8080/a") == "ex.com")
    assert(hosts("ex.com/a?utm_source=x#f") == "") // schemeless
  }

  test("host-cap census: canonical dupes collapse, the cap binds per " +
      "host, kept set is deterministic and layout-invariant") {
    val docs = Seq(
      (1L, "HTTP://WWW.A.com:80/p1?utm_source=x"),
      (2L, "http://a.com/p1#frag"),          // same canon as 1
      (3L, "http://a.com/p2"),
      (4L, "http://a.com/p3"),
      (5L, "http://a.com/p4"),               // 4 canon > cap 3
      (6L, "https://B.com:443/q?ref=t"),
      (7L, "https://b.com/q")                // same canon as 6
    ).toDF("doc_id", "url")
    def run(df: org.apache.spark.sql.DataFrame) =
      Url.hostCapCensus(df, "doc_id", "url", cap = 3)
        .orderBy($"host").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSeq
    val got = run(docs)
    assert(got == Seq(
      ("a.com", 5L, 4L, 3L, "http://a.com/p1"),
      ("b.com", 2L, 1L, 1L, "https://b.com/q")), got.toString)
    assert(run(docs.repartition(5)) == got, "layout variant")
    intercept[IllegalArgumentException](
      Url.hostCapCensus(docs, "doc_id", "url", cap = 0))
  }
}
