package graft

/** SQL surface: the function library registered into the session
  * (reference `loadfn` parity) and queried via spark.sql text. */
class GraftSqlSpec extends SparkSpec {

  test("registered functions evaluate from SQL text") {
    Graft.enableSql(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  euclid_div(-7, 2) AS ed, euclid_mod(-7, 2) AS em,
        |  xbar(100, 1234) AS xb""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == -4L)
    assert(r.getLong(2) == 1L)
    assert(r.getInt(3) == 1200)
  }

  test("surprisal64 from SQL matches the column implementation and is " +
      "exact at powers of two") {
    Graft.enableSql(spark)
    val r = spark.sql(
      "SELECT surprisal64(1) a, surprisal64(8) b, surprisal64(3) c")
      .collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 192L)
    import spark.implicits._
    (1L to 1000L).toDF("q")
      .select(operators.NgramLm.surprisal64($"q").as("col"), $"q")
      .createOrReplaceTempView("sq")
    val diff = spark.sql("SELECT count(*) FROM sq WHERE col != surprisal64(q)")
      .collect().head.getLong(0)
    assert(diff == 0L, s"$diff mismatches vs the column form")
  }

  test("dot_product coerces non-double arrays instead of misreading them") {
    Graft.enableSql(spark)
    // float arrays would be silently byte-misread without the cast/type check
    val r = spark.sql(
      """SELECT dot_product(cast(array(1.0, 2.0) AS array<float>),
        |                   cast(array(3.0, 4.0) AS array<float>)) AS d
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    // the Column API (no builder cast) must reject wrong types at analysis
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(1.0f), Array(2.0))).toDF("f", "d")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.VectorExprs.dot($"f", $"d")).collect()
    }
  }

  test("sorted_intersect_size callable from SQL; extensions install cleanly") {
    Graft.enableSql(spark)
    val n = spark.sql(
      """SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS n"""
    ).collect().head.getInt(0)
    assert(n == 2)
    // the config-time path registers the same builders without error
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // inputs differing only in element containsNull analyze fine: a
    // literal array (containsNull=false) vs split() output (true)
    val m = spark.sql(
      """SELECT sorted_intersect_size(array('a','b'),
        |  sort_array(split('b a', ' '))) AS n""".stripMargin)
      .collect().head.getInt(0)
    assert(m == 2)
  }

  test("the text/dedup expression library is SQL-callable") {
    Graft.enableSql(spark)
    val r = spark.sql(
      """SELECT lang_id('the quick brown fox and the dog') AS lang,
        |  simhash64('a b c') AS sh,
        |  size(ngram_hashes('a b c d', 2)) AS ngrams,
        |  quality_stats('Hello world this is fine.').ntok AS words
        |""".stripMargin).collect().head
    assert(r.getString(0) == "en")
    // pinned equal to the Column-API form every d-query uses
    import spark.implicits._
    val viaCol = Seq("a b c").toDF("t")
      .select(functions.SimHashExpr.simhash64($"t")).collect().head.getLong(0)
    assert(r.getLong(1) == viaCol)
    assert(r.getInt(2) == 3)
    assert(r.getInt(3) == 5)
  }

  test("the centroid-assignment kernels are SQL-callable, with float " +
      "arrays coerced") {
    Graft.enableSql(spark)
    val r = spark.sql(
      """SELECT
        |  nearest_centroid_l2(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |    array(array(0.0d, 1.0d), array(1.0d, 0.1d))) AS l2,
        |  nearest_centroid(array(1.0d, 0.0d),
        |    array(array(0.0d, 1.0d), array(0.9d, 0.1d))) AS cos,
        |  nearest_centroid_l2(array(1.0d, 0.0d),
        |    array(array(1.0d, 0.0d), array(1.0d, 0.0d))) AS tie
        |""".stripMargin).collect().head
    assert(r.getInt(0) == 1) // nearer in L2
    assert(r.getInt(1) == 1) // higher cosine
    assert(r.getInt(2) == 0) // equal distances -> lowest index
    // the quantization kernels: residual subtract, SQ8 encode, ADC sum
    val r2 = spark.sql(
      """SELECT
        |  array_sub(array(3.0d, 1.0d), array(1.0d, 1.0d)) AS sub,
        |  sq8_codes(array(0.0d, 10.0d),
        |    array(array(0.0d, 0.0d), array(10.0d, 10.0d))) AS codes,
        |  adc_lookup(array(1, 0), array(5.0d, 7.0d, 11.0d, 13.0d)) AS adc,
        |  sq8_dot(array(10.0d, 0.0d),
        |    array(array(0.0d, 0.0d), array(10.0d, 10.0d),
        |          array(1.0d, 1.0d))) AS sdot
        |""".stripMargin).collect().head
    assert(r2.getSeq[Double](0) == Seq(2.0, 0.0))
    assert(r2.getSeq[Long](1) == Seq(0L, 255L))
    assert(r2.getDouble(2) == 7.0 + 11.0) // table[0*2+1] + table[1*2+0]
    assert(r2.getDouble(3) == 10.0)       // deq = [10, 0] · [1, 1]
  }

  test("SQL-exposed kernels fail fast on null elements and dimension " +
      "mismatches instead of misreading row-buffer bytes") {
    Graft.enableSql(spark)
    def boom(sql: String, msg: String): Unit = {
      val e = intercept[Exception](spark.sql(s"SELECT $sql").collect())
      def all(t: Throwable): String =
        if (t == null) "" else t.getMessage + "|" + all(t.getCause)
      assert(all(e).contains(msg), s"for $sql got ${all(e)}")
    }
    // null elements: each kernel names the offending operand
    boom("adc_lookup(array(0, NULL), array(1.0d, 2.0d, 3.0d, 4.0d))",
      "null codes element")
    boom("array_sub(array(1.0d, NULL), array(1.0d, 2.0d))",
      "null input element")
    boom("sq8_codes(array(1.0d, NULL), array(array(0.0d, 0.0d), array(1.0d, 1.0d)))",
      "null vector element")
    boom("sq8_dot(array(1.0d, NULL), array(array(0.0d, 0.0d), array(1.0d, 1.0d), array(0.5d, 0.5d)))",
      "null vector element")
    boom("nearest_centroid_l2(array(1.0d, NULL), array(array(0.0d, 0.0d)))",
      "null vector element")
    // dimension mismatch: fail like the ANSI element_at HOF forms would
    boom("array_sub(array(1.0d), array(1.0d, 2.0d))", "lengths differ")
    boom("sq8_codes(array(1.0d), array(array(0.0d, 0.0d), array(1.0d, 1.0d)))",
      "dimension mismatch")
    boom("sq8_dot(array(1.0d), array(array(0.0d, 0.0d), array(1.0d, 1.0d), array(0.5d, 0.5d)))",
      "dimension mismatch")
  }

  test("sign_pack / hamming_dist are SQL-callable, match the column " +
      "kernels, coerce float arrays, and fail fast on nulls/mismatch") {
    Graft.enableSql(spark)
    val s = spark
    import s.implicits._
    val packed = spark.sql(
      "SELECT sign_pack(array(1.0d, -1.0d, -0.0d, 2.0d))")
      .head.getSeq[Long](0)
    assert(packed == Seq(0xDL), packed.toString) // bits 0,2,3
    // float arrays coerce through the Cast (the nearest_centroid rule)
    val viaFloat = spark.sql(
      "SELECT sign_pack(array(CAST(-1.5 AS FLOAT), CAST(3.5 AS FLOAT)))")
      .head.getSeq[Long](0)
    assert(viaFloat == Seq(0x2L), viaFloat.toString)
    val hd = spark.sql(
      "SELECT hamming_dist(sign_pack(array(1.0d, -1.0d)), " +
        "sign_pack(array(-1.0d, -1.0d)))").head.getInt(0)
    assert(hd == 1, hd.toString)
    // column-form parity on a real row
    val emb = Tables.load(spark, sf, "embeddings").limit(1)
      .select($"embedding".cast("array<double>").as("v"))
    val viaCol = emb
      .select(graft.functions.VectorExprs.signPack($"v")).head.getSeq[Long](0)
    emb.createOrReplaceTempView("graft_sp_one")
    val viaSql = spark.sql("SELECT sign_pack(v) FROM graft_sp_one")
      .head.getSeq[Long](0)
    assert(viaCol == viaSql)
    def boom(sql: String, msg: String): Unit = {
      val e = intercept[Exception](spark.sql(s"SELECT $sql").collect())
      def all(t: Throwable): String =
        if (t == null) "" else t.getMessage + "|" + all(t.getCause)
      assert(all(e).contains(msg), s"for $sql got ${all(e)}")
    }
    boom("sign_pack(array(1.0d, NULL))", "null vec element")
    boom("hamming_dist(array(1L, NULL), array(1L, 2L))", "null left element")
    boom("hamming_dist(array(1L), array(1L, 2L))", "length mismatch")
  }

  test("bootstrap registers tables for SQL use") {
    Graft.bootstrap(spark, sf)
    val n = spark.sql("SELECT COUNT(*) FROM lineitem").collect().head.getLong(0)
    assert(n > 0)
  }

  test("round-15 text kernels are SQL-callable: url_canon/url_host, " +
      "html_extract, char_grams; nulls propagate; non-literal params " +
      "fail fast") {
    Graft.enableSql(spark)
    val r = spark.sql(
      """SELECT
        |  url_canon('HTTPS://WWW.Example.com:443/a?utm_source=x&q=1#frag') u,
        |  url_host('HTTPS://WWW.Example.com:443/a?utm_source=x&q=1#frag') h,
        |  html_extract('<p>hello world</p><div>x</div>', 2) e,
        |  char_grams('abcd', 3) g,
        |  url_canon(CAST(NULL AS STRING)) un,
        |  char_grams(CAST(NULL AS STRING), 3) gn""".stripMargin)
      .collect().head
    assert(r.getString(0) == "https://example.com/a?q=1", r.getString(0))
    assert(r.getString(1) == "example.com")
    val e = r.getStruct(2)
    assert(e.getString(0) == "hello world", e.toString) // boiler 'x' dropped
    assert(r.getSeq[String](3) == Seq("abc", "bcd"))
    assert(r.isNullAt(4) && r.isNullAt(5))
    // column-form parity: the registry splice is the SAME chain t68 runs
    import spark.implicits._
    val urls = Seq("http://a.com:80/p?gclid=1&x=2",
      "relative/path?fbclid=z", "https://B.org/#top").toDF("u")
    urls.createOrReplaceTempView("gsql_urls")
    val viaSql = spark.sql("SELECT url_canon(u) c FROM gsql_urls")
      .collect().map(_.getString(0)).toSeq
    val viaCol = urls.select(functions.Url.canon("u").as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(viaSql == viaCol, s"$viaSql vs $viaCol")
    // literal-only params fail fast at build time, not silently misplan
    intercept[Exception](
      spark.sql("SELECT char_grams('ab', CAST(NULL AS INT))").collect())
    intercept[Exception](spark.sql(
      "SELECT html_extract('<p>x</p>', length('ab'))").collect())
  }

  test("char_entropy64 / lzw_phrases are SQL-callable and match the " +
      "column forms; null input yields null") {
    import graft.functions.EntropyExpr
    val viaSql = spark.sql(
      "SELECT char_entropy64('aabb'), lzw_phrases('ababab')").head
    assert(viaSql.getLong(0) === 256L)
    assert(viaSql.getLong(1) === 4L)
    import spark.implicits._
    val docs = Seq((1L, "aabb"), (2L, null.asInstanceOf[String]))
      .toDF("id", "txt")
    docs.createOrReplaceTempView("gsql_ent")
    val sqlRows = spark.sql(
      "SELECT char_entropy64(txt) e, lzw_phrases(txt) p FROM gsql_ent " +
        "ORDER BY id").collect()
    val colRows = docs.orderBy($"id")
      .select(EntropyExpr.charEntropy64($"txt").as("e"),
        EntropyExpr.lzwPhrases($"txt").as("p")).collect()
    assert(sqlRows.map(_.toSeq).toSeq === colRows.map(_.toSeq).toSeq)
    assert(sqlRows(1).isNullAt(0) && sqlRows(1).isNullAt(1))
  }

  test("lang_nb: a fitted folded language-ID kernel registers as a " +
      "session SQL function and matches predictFast bit-for-bit") {
    import spark.implicits._
    val train = Seq(
      ("en", "the quick brown fox jumps over the lazy dog and then some"),
      ("en", "this is another english sentence with the usual words"),
      ("de", "der schnelle braune fuchs springt und dann noch etwas mehr"),
      ("de", "dies ist ein weiterer deutscher satz mit den ueblichen"))
      .toDF("lang", "text")
    val m = operators.LangNb.fit(train, "text", "lang")
    val k = operators.LangNb.kernel(m)
    Graft.registerLangNb(spark, k)
    val docs = Seq((1L, "the brown fox and the dog"),
      (2L, "der braune fuchs und der satz"),
      (3L, "zz"), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    docs.createOrReplaceTempView("gsql_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, coalesce(lang_nb(text), 'unknown') lang_pred " +
        "FROM gsql_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val viaKernel = operators.LangNb.predictFast(docs, "doc_id", "text", k)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaSql == viaKernel, s"$viaSql vs $viaKernel")
    assert(viaSql.map(_._2) == Seq("en", "de", "unknown", "unknown"))
  }

  test("registerWordPiece: the fitted greedy encoder is SQL-callable, " +
      "matches encodeWord word-for-word, nulls pass through, and an " +
      "empty vocabulary fails fast") {
    import spark.implicits._
    val vocab = Set("un", "aff", "##aff", "##able", "##ord", "a", "##b")
    Graft.registerWordPiece(spark, vocab)
    val docs = Seq((1L, "unaffable afford"), (2L, "xyz un"),
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    docs.createOrReplaceTempView("gsql_wp")
    val viaSql = spark.sql(
      "SELECT doc_id, wordpiece_encode(text) p FROM gsql_wp ORDER BY doc_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    def direct(t: String) = t.split(" ", -1).toSeq.filter(_.nonEmpty)
      .flatMap(w => operators.WordPiece.encodeWord(w, vocab))
    assert(viaSql(1L) == direct("unaffable afford"))
    assert(viaSql(1L) == Seq("un", "##aff", "##able", "aff", "##ord"))
    assert(viaSql(2L) == Seq("[UNK]", "un")) // whole-word UNK fallback
    assert(viaSql(3L) == Seq.empty)
    assert(viaSql(4L) == null)
    val e = intercept[IllegalArgumentException] {
      Graft.registerWordPiece(spark, Set.empty)
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("registerUnigram: the fitted Viterbi segmenter is SQL-callable " +
      "and matches Unigram.viterbi word-for-word") {
    import spark.implicits._
    // census over end-marked symbol strings (the Bpe.toSyms domain):
    // make 'ab</w>'-style merges cheap so segmentation is non-trivial
    val census = Map("ab" -> 50L, "c" -> 10L, "a" -> 5L, "b" -> 5L)
    val cv = census.values.sum + census.size
    Graft.registerUnigram(spark, census, cv, maxPieceSyms = 4)
    val docs = Seq((1L, "abc ab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("gsql_ug")
    val viaSql = spark.sql(
      "SELECT doc_id, unigram_segment(text) p FROM gsql_ug ORDER BY doc_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    def direct(t: String) = t.split(" ", -1).toSeq.filter(_.nonEmpty)
      .flatMap { w =>
        operators.Unigram.viterbi(graft.operators.Bpe.toSyms(w),
          census.get, cv, 4)._2
      }
    assert(viaSql(1L) == direct("abc ab"), s"${viaSql(1L)} vs ${direct("abc ab")}")
    assert(viaSql(2L) == null)
    // non-string input is an analysis-time failure, not a wrong answer
    val err = intercept[Exception] {
      spark.sql("SELECT unigram_segment(42)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"), err.getMessage)
  }
}
