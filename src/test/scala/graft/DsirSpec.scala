package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dsir, NgramLm}

/** The t34 DSIR importance selector: model arithmetic, domain ranking,
  * edge cases, and the in-domain uplift on the real documents table. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("fit: totals are exact gram counts, bucket tables are bounded, " +
      "and k64 agrees with the column surprisal implementation") {
    val target = Seq("a b a b c", "a b").toDF("text") // 4 + 1 bigrams
    val raw = Seq("a b a b c", "a b", "x y z").toDF("text") // + 2
    val m = Dsir.fit(target, raw, "text", n = 2, buckets = 256)
    assert(m.nTarget == 5L && m.nRaw == 7L)
    assert(m.target.count() <= 256 && m.raw.count() <= 256)
    assert(m.target.agg(sum($"c")).collect().head.getLong(0) == 5L)
    // local k64 == the codegen surprisal64 column on the same operands
    val Seq(sr, st) = Seq(m.nRaw + 256, m.nTarget + 256).map { q =>
      Seq(q).toDF("q").select(NgramLm.surprisal64($"q"))
        .collect().head.getLong(0)
    }
    assert(m.k64 == sr - st)
  }

  test("selectTopK: in-domain docs outrank off-domain ones; a doc with " +
      "no bigrams survives with n_gram 0 and lw64 0") {
    val target = Seq("a b c a b c a b c").toDF("text")
    val raw = Seq("a b c a b c a b c", "z w q z w q").toDF("text")
    val m = Dsir.fit(target, raw, "text", n = 2, buckets = 1 << 12)
    val corpus = Seq((1L, "a b c a b"), (2L, "z w q z w"), (3L, "solo"))
      .toDF("doc_id", "text")
    val r = Dsir.selectTopK(corpus, "doc_id", "text", m, 3).collect()
    assert(r.map(_.getLong(0)).toSeq.head == 1L,
      s"target-like doc must rank first: ${r.mkString(";")}")
    val solo = r.find(_.getLong(0) == 3L).get
    assert(solo.getLong(1) == 0L && solo.getLong(2) == 0L)
    // in-domain weight strictly above off-domain
    val byId = r.map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(byId(1L) > byId(2L))
  }

  test("a persisted model selects bit-identically to the in-memory fit") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m = Dsir.fit(docs.filter($"lang" === "en"), docs, "text",
      n = 2, buckets = 1 << 12)
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    Dsir.saveModel(m, dir)
    val m2 = Dsir.loadModel(spark, dir)
    assert((m2.nTarget, m2.nRaw, m2.buckets, m2.n) ==
      ((m.nTarget, m.nRaw, m.buckets, m.n)) && m2.k64 == m.k64)
    def run(x: Dsir.Model) =
      Dsir.selectTopK(docs, "doc_id", "text", x, 50).collect().toSeq
    assert(run(m2) == run(m))
    intercept[IllegalArgumentException](Dsir.loadModel(spark, dir + "/no"))
  }

  test("t34 on the documents table: the en-targeted selection holds an " +
      "en share strictly above the corpus base rate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val m = Dsir.fit(docs.filter($"lang" === "en"), docs, "text",
      n = 2, buckets = 1 << 16)
    val sel = Dsir.selectTopK(docs, "doc_id", "text", m, 100)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val enSel = sel.filter($"lang" === "en").count().toDouble / sel.count()
    val enBase = docs.filter($"lang" === "en").count().toDouble / docs.count()
    assert(enSel > enBase, s"selected en share $enSel <= base $enBase")
  }

  test("streaming DSIR equals batch scoring from the persisted model; " +
      "drained replay appends nothing; top-k over the streamed scores " +
      "equals batch selectTopK") {
    val docs = Tables.load(spark, sf, "documents")
    val base = s"/tmp/graft_dsirstream_spec/${System.nanoTime()}"
    val (feed, model) = (s"$base/feed", s"$base/model")
    docs.write.parquet(feed)
    val m = Dsir.fit(docs.filter($"lang" === "en"), docs, "text",
      n = 2, buckets = 1 << 16)
    Dsir.saveModel(m, model)
    def run() = streaming.Streams.dsirStream(spark, feed, docs,
      "doc_id", "text", model, s"$base/out", s"$base/ckpt")
    val streamed = run().orderBy($"doc_id").collect().toSeq
    val batch = Dsir.scoreAll(docs, "doc_id", "text", m)
      .orderBy($"doc_id").collect().toSeq
    assert(streamed == batch)
    // replay over the drained feed appends nothing
    assert(run().count() == batch.length.toLong)
    // the batch selection = top-k over the streamed weights
    val topStream = run().orderBy($"lw64".desc, $"doc_id".asc).limit(100)
      .collect().toSeq
    val topBatch = Dsir.selectTopK(docs, "doc_id", "text", m, 100)
      .collect().toSeq
    assert(topStream == topBatch)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("gumbelKey64: the column form equals the scalar replay; the " +
      "draw is seed-sensitive and id-pure; selection frequency grows " +
      "with the weight across seeds") {
    // scalar replay from first principles (NOT via the column code)
    def hashOf(id: Long, seed: Long): Long = {
      val x = id ^ seed
      val lo = x & 0x7FFFFFFFL
      val hi = (x >> 31) & 0x7FFFFFFFL
      ((lo * 2654435761L) % 4294967296L +
        (hi * 2246822519L) % 4294967296L) % 4294967296L
    }
    def keyOf(id: Long, lw: Long, seed: Long): Long = {
      val h = math.max(hashOf(id, seed), 1L)
      val m = 2048L - NgramLm.surprisal64Long(h)
      lw - NgramLm.surprisal64Long(m)
    }
    val rows = (0L until 64L).map(i => (i, i * 37L - 1000L))
    val df = rows.toDF("id", "lw64")
    val got = df.select($"id",
        Dsir.gumbelKey64($"id", $"lw64", 20260816L).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, lw) =>
      assert(got(id) == keyOf(id, lw, 20260816L), s"id $id")
    }
    // different seeds give different draws (id-pure per seed)
    val got2 = df.select($"id",
        Dsir.gumbelKey64($"id", $"lw64", 7L).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.exists { case (id, _) => got(id) != got2(id) })
    // frequency ∝ weight: doc A carries 2³ × doc B's weight → A wins
    // the k=1 race w.p. 8/9; over 200 seeds A dominates but B still
    // wins sometimes — that IS the resampling; top-k would NEVER pick B
    val (lwA, lwB) = (64L * 3L, 0L)
    var aWins = 0; var bWins = 0
    (1L to 200L).foreach { seed =>
      if (keyOf(1L, lwA, seed) >= keyOf(2L, lwB, seed)) aWins += 1
      else bWins += 1
    }
    assert(aWins > 150, s"heavy doc won only $aWins/200")
    assert(bWins > 0, s"light doc never sampled — that's top-k, not " +
      s"resampling ($bWins)")
  }
}
