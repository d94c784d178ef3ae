package graft

import org.apache.spark.sql.functions._
import graft.operators.LangNb

/** t66 trained language ID: the NB char-trigram model beats the
  * marker-word heuristic on a planted multilingual fixture whose test
  * sentences contain NO marker words, is layout-invariant (pure counts
  * + total-order tie-breaks), and degrades to 'unknown' on sub-trigram
  * docs. (The sf testdata's `lang` labels are synthetic — text there
  * is the same vocabulary for every label — so accuracy is pinned on
  * the planted fixture; the t66 oracle pins engine parity on the real
  * table.) */
class LangNbSpec extends SparkSpec {
  import spark.implicits._

  // labeled training sentences per language
  private def trainFix = Seq(
    ("en", "the quick brown fox jumps over the lazy dog and runs to the hills"),
    ("en", "this is a simple english sentence with plain words that works well"),
    ("en", "reading writing and thinking in english all day long is the way"),
    ("de", "der schnelle braune fuchs springt über den faulen hund und rennt weg"),
    ("de", "das ist ein einfacher deutscher satz mit klaren wörtern und sinn"),
    ("de", "lesen schreiben und denken auf deutsch ist wunderbar und macht spass"),
    ("es", "el rápido zorro marrón salta sobre el perro perezoso que duerme"),
    ("es", "esta es una frase sencilla en español con palabras claras y buenas"),
    ("es", "leer escribir y pensar en español todo el día está muy bien"),
    ("fr", "le rapide renard brun saute par dessus le chien paresseux du parc"),
    ("fr", "ceci est une phrase simple en français avec des mots clairs"),
    ("fr", "lire écrire et penser en français toute la journée est agréable"))
    .toDF("lang", "text")

  // marker-free test set: the heuristic's vote is 0 everywhere →
  // it answers 'unknown' on every row
  private def testFix = Seq(
    (1L, "en", "quick brown foxes jump high every morning"),
    (2L, "de", "schnelle braune füchse springen hoch über faule hunde"),
    (3L, "es", "zorros marrones rápidos saltan alto sobre perros dormidos"),
    (4L, "fr", "renards bruns rapides sautent très haut chaque matin"))
    .toDF("doc_id", "lang", "text")

  test("trained char-trigram NB beats the marker heuristic on a " +
      "marker-free planted fixture (heuristic: 0/4 'unknown'; " +
      "NB: 4/4)") {
    val m = LangNb.fit(trainFix, "text", "lang")
    val pred = LangNb.predict(testFix, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = testFix.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val heur = testFix
      .select($"doc_id",
        graft.functions.LangIdExpr.langId($"text").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(heur.values.forall(_ == "unknown"),
      s"fixture not marker-free: $heur")
    val nbAcc = truth.count { case (id, l) => pred(id) == l }
    val heurAcc = truth.count { case (id, l) => heur(id) == l }
    assert(nbAcc > heurAcc, s"nb=$pred heuristic=$heur")
    assert(nbAcc == 4, s"NB misclassified: $pred")
  }

  test("per-line consistency card (the t76 shape): a planted English " +
      "banner makes non-English pages 2/3-consistent with majority = " +
      "the page's own language; English pages read 3/3") {
    import org.apache.spark.sql.functions._
    val m = LangNb.fit(trainFix, "text", "lang")
    val banner = "Please accept all cookies to continue using this website"
    // long sentences (vocabulary-adjacent to the training set) so each
    // HALF carries enough trigram evidence on its own — the operator's
    // granularity is the line, and a 4-word half is below any model's
    // floor
    val pages = Seq(
      (1L, "en", "reading and writing simple english words all day " +
        "long is the way that works well for the quick brown fox and " +
        "the lazy dog in the hills"),
      (2L, "de", "lesen und schreiben auf deutsch macht spass und der " +
        "schnelle braune fuchs springt über den faulen hund mit " +
        "klaren wörtern und sinn"),
      (3L, "es", "leer y escribir en español todo el día está muy " +
        "bien y el rápido zorro marrón salta sobre el perro perezoso " +
        "con palabras claras y buenas"),
      (4L, "fr", "lire et écrire en français toute la journée est " +
        "agréable et le rapide renard brun saute par dessus le chien " +
        "paresseux avec des mots clairs")).toDF("doc_id", "lang", "text")
    val lines = pages.select($"doc_id", posexplode(array(
        expr("substring(text, 1, length(text) div 2)"),
        expr("substring(text, length(text) div 2 + 1, length(text))"),
        lit(banner))).as(Seq("pos", "line")))
      .select(($"doc_id" * 4L + $"pos").as("line_id"), $"line")
    val counts = LangNb.predict(lines, "line_id", "line", m)
      .select(expr("line_id div 4").as("doc_id"), $"lang_pred")
      .groupBy($"doc_id", $"lang_pred").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val en = Seq((9L, "en", "reading and writing simple english words " +
      "all day long works well for the quick brown fox and the lazy " +
      "dog")).toDF("doc_id", "lang", "text")
    pages.collect().foreach { r =>
      val (id, lang) = (r.getLong(0), r.getString(1))
      assert(counts((id, lang)) == (if (lang == "en") 3L else 2L),
        s"doc $id ($lang) halves must classify as $lang: $counts")
      if (lang != "en")
        assert(counts((id, "en")) == 1L,
          s"doc $id: the banner must classify en: $counts")
    }
    // an English page is fully consistent: all three lines read en
    val enLines = en.select($"doc_id", posexplode(array(
        expr("substring(text, 1, length(text) div 2)"),
        expr("substring(text, length(text) div 2 + 1, length(text))"),
        lit(banner))).as(Seq("pos", "line")))
      .select(($"doc_id" * 4L + $"pos").as("line_id"), $"line")
    val enPred = LangNb.predict(enLines, "line_id", "line", m)
      .collect().map(_.getString(1)).toSeq
    assert(enPred == Seq("en", "en", "en"), enPred.toString)
  }

  test("persisted model: loadModel predicts bit-identically to the " +
      "in-memory fit (kernel AND stage paths); missing parts fail " +
      "fast; the streaming twin equals batch and replays as a no-op") {
    val m = LangNb.fit(trainFix, "text", "lang")
    val base = java.nio.file.Files.createTempDirectory("langnb").toString
    LangNb.saveModel(m, s"$base/model")
    val loaded = LangNb.loadModel(spark, s"$base/model")
    def preds(mm: LangNb.Model) =
      LangNb.predict(testFix, "doc_id", "text", mm)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def stagePreds(mm: LangNb.Model) =
      LangNb.predictStages(testFix, "doc_id", "text", mm)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(loaded) == preds(m))
    assert(stagePreds(loaded) == stagePreds(m))
    intercept[IllegalArgumentException](
      LangNb.loadModel(spark, s"$base/nope"))
    // streaming twin: classify the held-out feed against the store
    testFix.select($"doc_id", $"text").write.parquet(s"$base/feed")
    def run() = streaming.Streams.langIdStream(spark, s"$base/feed",
      testFix.select($"doc_id", $"text"), "doc_id", "text",
      s"$base/model", s"$base/out", s"$base/ckpt")
    val streamed = run().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == preds(m), "stream must equal batch")
    assert(run().count() == testFix.count(),
      "drained replay must append nothing")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("fit + predict are layout-invariant, and sub-trigram docs " +
      "predict 'unknown'") {
    val m1 = LangNb.fit(trainFix, "text", "lang")
    val m2 = LangNb.fit(trainFix.repartition(7), "text", "lang")
    def run(m: LangNb.Model) =
      LangNb.predict(testFix, "doc_id", "text", m)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(run(m1) == run(m2), "layout-variant fit")
    val short = Seq((10L, "ab"), (11L, "")).toDF("doc_id", "text")
    val p = LangNb.predict(short, "doc_id", "text", m1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(p == Set((10L, "unknown"), (11L, "unknown")), p.toString)
  }

  test("the codegen CharGrams expression equals the HOF substr chain " +
      "on multilingual text incl. CJK/emoji/short/empty strings (the " +
      "oracle replays the substr arithmetic — this pin is the parity " +
      "bridge)") {
    import org.apache.spark.sql.functions._
    val texts = Seq("hello world", "次の実験は5回目です。", "ab", "a", "",
      "🙂👍 emoji", "naïve café", "สวัสดีครับ", "x" * 300)
    val df = texts.toDF("t")
    val hof = df.select($"t",
        expr(graft.operators.LangNb.gramArrSql("t")).as("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val cg = df.select($"t",
        graft.functions.CharGrams.charGrams($"t", 3).as("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for (t <- texts)
      assert(cg(t) == hof(t), s"gram drift on '${t.take(20)}'")
  }

  test("the folded serving kernel (predictFast) equals the stage-form " +
      "predictStages BIT-FOR-BIT — planted fixture, real documents " +
      "table, and degenerate docs (the injective 3x21-bit gram pack " +
      "means no aliasing, unlike the hash-space LM); predict ROUTES " +
      "through the fold under the gate") {
    val docs = Tables.load(spark, sf, "documents")
    val m = LangNb.fit(docs.filter($"doc_id" % 5 =!= 4L), "text", "lang")
    val k = LangNb.kernel(m)
    assert(m.foldKernel.isDefined,
      "a maxGrams-capped model must fold — the gate regressed")
    def both(df: org.apache.spark.sql.DataFrame, id: String,
             tc: String): Unit = {
      val slow = LangNb.predictStages(df, id, tc, m)
        .collect().map(r => (r.get(0), r.getString(1))).toSet
      val fast = LangNb.predictFast(df, id, tc, k)
        .collect().map(r => (r.get(0), r.getString(1))).toSet
      assert(fast == slow, s"kernel drift: ${fast.diff(slow)}")
      val routed = LangNb.predict(df, id, tc, m)
        .collect().map(r => (r.get(0), r.getString(1))).toSet
      assert(routed == slow, s"routed-predict drift: ${routed.diff(slow)}")
    }
    both(docs, "doc_id", "text")
    both(testFix, "doc_id", "text")
    val weird = Seq((1L, "ab"), (2L, ""), (3L, "次の実験です"),
      (4L, "🙂👍🙂👍"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    both(weird, "doc_id", "text")
  }

  test("confidence margins equal a stage-form replica built from the " +
      "Model tables BIT-FOR-BIT on the real corpus; unknown docs read " +
      "(0, 0, 0); the per-gram gate is length-invariant") {
    val docs = Tables.load(spark, sf, "documents")
    val m = LangNb.fit(docs.filter($"doc_id" % 5 =!= 4L), "text", "lang")
    val k = LangNb.kernel(m)
    val test = docs.filter($"doc_id" % 5 === 4L)
    val got = LangNb.confidence(test, "doc_id", "text", k, 2L)
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))).toMap
    // independent stage replica: gram explode + model joins + two-row
    // window over score64 (the oracle's shape, in Spark)
    import graft.operators.NgramLm
    val grams = test.select($"doc_id",
        explode(graft.functions.CharGrams.charGrams($"text", 3)).as("gram"))
      .join(broadcast(m.vocab), "gram")
    val nv = grams.groupBy($"doc_id").agg(count(lit(1)).as("nv"))
    val hits = grams.join(broadcast(m.model), Seq("gram"))
      .groupBy($"doc_id", $"lang").agg(sum($"w64").as("sw"))
    val sc = nv.crossJoin(broadcast(m.base))
      .join(hits, Seq("doc_id", "lang"), "left")
      .select($"doc_id", $"nv", $"lang",
        (coalesce($"sw", lit(0L)) - $"nv" * $"b64").as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"s".desc, $"lang".asc)
    val exp = sc.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 2)
      .groupBy($"doc_id", $"nv")
      .agg(max(when($"rk" === 1, $"lang")).as("lp"),
        (max(when($"rk" === 1, $"s")) - max(when($"rk" === 2, $"s")))
          .as("mg"))
      .collect()
      .map(r => (r.getLong(0), (r.getString(2), r.getLong(3), r.getLong(1),
        if (r.getLong(3) >= 2L * r.getLong(1)) 1 else 0))).toMap
    exp.foreach { case (id, e) =>
      assert(got(id) === e, s"doc $id kernel-vs-stage margin drift")
    }
    // every test doc not in the replica had zero vocab grams
    (got.keySet -- exp.keySet).foreach { id =>
      assert(got(id) === (("unknown", 0L, 0L, 0)), s"doc $id")
    }
  }

  test("confidence stats: a top-score tie reads margin 0; nv = 0 reads " +
      "(-1, 0, 0); a single-language kernel fails fast") {
    import org.apache.spark.unsafe.types.UTF8String
    // symmetric two-lang fit: any text with equal gram evidence ties
    val m = LangNb.fit(Seq(("aa", "xyzxyz"), ("bb", "xyzxyz"))
      .toDF("lang", "text"), "text", "lang")
    val k = LangNb.kernel(m)
    val st = graft.functions.LangNbScore.computeStats(
      UTF8String.fromString("xyzxyz"), k).toLongArray()
    assert(st(1) === 0L && st(2) > 0L, st.toSeq.toString) // tie → margin 0
    val none = graft.functions.LangNbScore.computeStats(
      UTF8String.fromString("q"), k).toLongArray()
    assert(none.toSeq === Seq(-1L, 0L, 0L))
    val m1 = LangNb.fit(Seq(("aa", "xyzxyz")).toDF("lang", "text"),
      "text", "lang")
    val e = intercept[IllegalArgumentException] {
      LangNb.confidence(Seq((1L, "xyz")).toDF("id", "t"), "id", "t",
        LangNb.kernel(m1), 2L)
    }
    assert(e.getMessage.contains(">= 2 languages"))
  }

  test("the vocabulary cap binds: maxGrams = 8 still fits and " +
      "predicts deterministically; maxGrams <= 0 fails fast") {
    val m = LangNb.fit(trainFix, "text", "lang", maxGrams = 8)
    assert(m.vocab.count() == 8L)
    val p1 = LangNb.predict(testFix, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val p2 = LangNb.predict(testFix.repartition(3), "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(p1 == p2)
    intercept[IllegalArgumentException](
      LangNb.fit(trainFix, "text", "lang", maxGrams = 0))
  }
}
