package graft

import org.apache.spark.sql.functions._
import graft.functions.{AcAutomaton, AcCounts, CharEntropy64, LzwPhrases}
import graft.operators.{CorpusStats, NgramLm, TextRank}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local text-stat kernels (t90/t91/t93) + TextRank (t92):
  * goldens, brute-force property pins, and the operator cards. */
class TextStatsSpec extends SparkSpec {

  private def ent(s: String): Long =
    CharEntropy64.compute(UTF8String.fromString(s))

  private def lzw(s: String): Long =
    LzwPhrases.compute(UTF8String.fromString(s))

  // ------------------------------------------------------------ entropy

  test("charEntropy64 goldens: empty, uniform, balanced") {
    assert(ent("") === 0L)
    assert(ent("aaaa") === 0L) // single symbol → zero entropy
    // "ab": 2·s64(2) − 2·s64(1) = 128 → 1 bit/char exactly
    assert(ent("ab") === 128L)
    // "aabb": 4·s64(4) − 2·(2·s64(2)) = 4·128 − 4·64 = 256 → 1 bit/char
    assert(ent("aabb") === 256L)
  }

  test("charEntropy64 counts CODE POINTS (surrogate pairs are one symbol)") {
    // 😀😀a = 3 code points, census {😀:2, a:1}
    val s = "😀😀a"
    val n = 3L
    val exp = n * NgramLm.surprisal64Long(n) -
      (2L * NgramLm.surprisal64Long(2L) + 1L * NgramLm.surprisal64Long(1L))
    assert(ent(s) === exp)
  }

  test("charEntropy64 equals an independent census replica on the corpus") {
    val docs = Tables.load(spark, sf, "documents").limit(40)
      .select($"doc_id", $"text").collect()
    docs.foreach { r =>
      val s = r.getString(1)
      val cen = s.codePoints().toArray.groupBy(identity).map(_._2.length.toLong)
      val n = cen.sum
      val exp = n * NgramLm.surprisal64Long(n) -
        cen.map(c => c * NgramLm.surprisal64Long(c)).sum
      assert(ent(s) === exp, s"doc ${r.getLong(0)}")
    }
  }

  test("charEntropy operator bands are cross-multiplied cuts") {
    val df = spark.createDataFrame(Seq(
      (1L, "aaaaaaaaaaaaaaaa"),          // 0 bits → low
      (2L, "the quick brown fox jumps"), // ~3.8 bits → mid at 4.0 cut
      (3L, "qWx7!Kp2#vB9@mZ4$yT6&uJ1%")  // all-distinct → high
    )).toDF("id", "txt")
    val out = CorpusStats.charEntropy(df, "id", "txt", 256L, 288L)
      .orderBy($"id").collect()
    assert(out.map(_.getString(4)).toSeq === Seq("low", "mid", "high"))
    // exact rational carried: ent_den = 64·n
    assert(out(0).getLong(3) === 64L * 16L)
  }

  // ---------------------------------------------------------------- lzw

  test("lzwPhrases goldens") {
    assert(lzw("") === 0L)
    assert(lzw("a") === 1L)
    assert(lzw("aaaa") === 3L)   // a | aa | a
    assert(lzw("ababab") === 4L) // a | b | ab | ab
  }

  test("lzwPhrases equals the naive greedy replica on random strings") {
    def naive(s: String): Long = {
      val dict = scala.collection.mutable.Set[String]()
      var ph = 0L; var start = 0; var wlen = 0; val n = s.length
      while (start < n) {
        if (start + wlen < n &&
            (wlen == 0 || dict.contains(s.substring(start, start + wlen + 1))))
          wlen += 1
        else {
          ph += 1
          if (start + wlen < n) dict += s.substring(start, start + wlen + 1)
          start += wlen; wlen = 0
        }
      }
      ph
    }
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = (0 until rnd.nextInt(40)).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString
      assert(lzw(s) === naive(s), s"input '$s'")
    }
  }

  test("lzw ratio separates repetitive from novel text") {
    val rep = "ab" * 50
    assert(lzw(rep) * 3 < rep.length * 2) // compresses well → flagged
    val novel = "the quick brown fox jumps over the lazy dog XYZW 0123"
    assert(lzw(novel) * 3 >= novel.length * 2)
  }

  // ------------------------------------------------------ aho–corasick

  private def acArr(text: String, phrases: Seq[String]): Array[Long] = {
    val auto = AcAutomaton.build(phrases)
    AcCounts.compute(UTF8String.fromString(text), auto)
      .toLongArray()
  }

  test("acCounts counts ALL occurrences including overlapping") {
    val out = acArr("banana", Seq("ana", "na", "ban"))
    assert(out.take(3).toSeq === Seq(2L, 2L, 1L)) // ana×2 overlap, na×2, ban×1
    assert(out(3) === 5L) // total
    assert(out(4) === 3L) // phrases present
    assert(out(5) === 0L) // top = 'ana' (tie with 'na' → lowest index)
  }

  test("acCounts suffix links: 'scan' also yields 'can' and 'an'") {
    val out = acArr("scan the scanner", Seq("scan", "can", "an"))
    assert(out.take(3).toSeq === Seq(2L, 2L, 2L))
  }

  test("acCounts clean text: top index is -1") {
    val out = acArr("nothing here", Seq("xyz", "qqq"))
    assert(out.toSeq === Seq(0L, 0L, 0L, 0L, -1L))
  }

  test("acCounts equals the brute-force position census on random input") {
    val rnd = new scala.util.Random(7)
    val alpha = "abc"
    (1 to 100).foreach { _ =>
      val s = (0 until rnd.nextInt(60)).map(_ => alpha(rnd.nextInt(3))).mkString
      val phrases = (1 to 4).map(_ =>
        (0 until 1 + rnd.nextInt(3)).map(_ => alpha(rnd.nextInt(3))).mkString)
        .distinct
      val got = acArr(s, phrases).take(phrases.size).toSeq
      val exp = phrases.map { p =>
        (0 to s.length - p.length).count(i => s.regionMatches(i, p, 0, p.length)).toLong
      }
      assert(got === exp, s"text '$s' phrases $phrases")
    }
  }

  test("blocklistCensus: clean docs carry NULL top_phrase, hits flag") {
    val df = spark.createDataFrame(Seq(
      (1L, "clean words only"),
      (2L, "banana banana banana")
    )).toDF("id", "txt")
    val out = CorpusStats.blocklistCensus(df, "id", "txt",
      Seq("ana", "banana"), flagMin = 3L).orderBy($"id").collect()
    assert(out(0).getLong(1) === 0L && out(0).isNullAt(3) &&
      out(0).getInt(4) === 0)
    // 3 bananas → ana×6 (2 per banana), banana×3, total 9, top 'ana'
    assert(out(1).getLong(1) === 9L && out(1).getString(3) === "ana" &&
      out(1).getInt(4) === 1)
  }

  // ---------------------------------------------------------------- zipf

  test("zipfCard: exact octave slopes on constructed frequencies " +
      "(f halving per octave reads slope64 = 64), non-octave ranks " +
      "excluded, rank 1 slope NULL") {
    val txt = (Seq.fill(16)("a") ++ Seq.fill(8)("b") ++ Seq.fill(4)("c")
      ++ Seq.fill(2)("d") ++ Seq("e")).mkString(" ")
    val df = spark.createDataFrame(Seq((1L, txt))).toDF("id", "txt")
    val out = CorpusStats.zipfCard(df, "id", "txt", maxRank = 64)
      .orderBy($"rank").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L)) // octaves only
    assert(out.map(_.getString(1)).toSeq === Seq("a", "b", "d"))
    assert(out(0).isNullAt(3)) // rank 1 has no previous octave
    // s64(16)-s64(8) = 64 exactly (one bit per octave = exponent 1);
    // s64(8)-s64(2) = 128 (two bits over one octave = exponent 2)
    assert(out(1).getLong(3) === 64L)
    assert(out(2).getLong(3) === 128L)
  }

  // ------------------------------------------------------- properties

  test("charEntropy64 properties: 0 <= ent <= n*s64(n) (all-distinct " +
      "attains the max), permutation-invariant (census-based)") {
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val s = (0 until rnd.nextInt(50)).map(_ => ('a' + rnd.nextInt(6)).toChar)
        .mkString
      val e = ent(s)
      val n = s.length.toLong
      assert(e >= 0L, s"'$s'")
      if (n > 0) assert(e <= n * NgramLm.surprisal64Long(n), s"'$s'")
      val shuffled = rnd.shuffle(s.toSeq).mkString
      assert(ent(shuffled) === e, s"permutation changed entropy: '$s'")
    }
    // all-distinct attains the bound exactly: s64(1) = 0
    assert(ent("abcdef") === 6L * NgramLm.surprisal64Long(6L))
  }

  test("lzwPhrases bounds: 1 <= phrases <= n for nonempty input; " +
      "all-distinct text parses one phrase per char") {
    val rnd = new scala.util.Random(13)
    (1 to 100).foreach { _ =>
      val s = (0 until 1 + rnd.nextInt(50))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val p = lzw(s)
      assert(p >= 1L && p <= s.length.toLong, s"'$s' -> $p")
    }
    assert(lzw("abcdef") === 6L) // nothing repeats → no phrase grows
  }

  test("acCounts is phrase-order equivariant: permuting the list " +
      "permutes the per-phrase counts, totals unchanged") {
    val text = "scan the banana scanner table"
    val ph = Seq("scan", "ana", "table", "an")
    val a = acArr(text, ph)
    val perm = Seq(2, 0, 3, 1) // table, scan, an, ana
    val b = acArr(text, perm.map(ph))
    perm.zipWithIndex.foreach { case (orig, i) =>
      assert(b(i) === a(orig), s"slot $i")
    }
    assert(b(ph.size) === a(ph.size), "total must not depend on order")
    assert(b(ph.size + 1) === a(ph.size + 1))
  }

  test("twap is invariant under a whole-microsecond time shift") {
    import spark.implicits._
    def ev(shift: Long) = Seq(
      (1L, 0L + shift, 10.0, 1L),
      (1L, 7000000L + shift, 20.0, 2L),
      (1L, 40000000L + shift, 15.0, 3L),
      (1L, 61000000L + shift, 30.0, 4L))
      .toDF("user_id", "ts", "value", "event_id")
    val base = Queries.twapOf(ev(0L)).collect().head.getDouble(2)
    val moved = Queries.twapOf(ev(5000000L)).collect().head.getDouble(2)
    assert(base === moved)
  }

  test("q78 OHLC chain: open/close by time with same-microsecond ties " +
      "broken by event_id; high/low independent of order") {
    import spark.implicits._
    // hour 0: open 10.0 (t=0), close 30.0 (the HIGHER event_id of two
    // same-us events at t=7000us), high 40.0, low 10.0
    val ev = Seq(
      (1L, 0L, 10.0, 5L),
      (1L, 3000000L, 40.0, 6L),
      (1L, 7000000L, 25.0, 7L),
      (1L, 7000000L, 30.0, 8L), // same us as 7 -> event_id breaks the tie
      (1L, 3600000000000L, 99.0, 9L)) // next hour
      .toDF("user_id", "ts", "value", "event_id")
    val out = Queries.ohlcOf(ev).orderBy($"hour").collect()
    assert(out.length === 2)
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(4),
      out(0).getLong(5), out(0).getLong(6)) === ((4L, 1000L, 4000L, 1000L, 3000L)))
    assert((out(1).getLong(2), out(1).getLong(3), out(1).getLong(6))
      === ((1L, 9900L, 9900L)))
  }

  test("q84 drawdown chain: running-peak deficit; the FIRST event " +
      "attaining the max drawdown wins ties; single-event user reads 0") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1000000000L, 10.0, 1L), // peak 1000c, dd 0
      (1L, 2000000000L, 4.0, 2L),  // dd 600 — first max
      (1L, 3000000000L, 8.0, 3L),  // dd 200
      (1L, 4000000000L, 4.0, 4L),  // dd 600 again — tie, NOT the winner
      (1L, 5000000000L, 12.0, 5L), // new peak 1200c, dd 0
      (2L, 1000000000L, 5.0, 9L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Queries.drawdownOf(ev).orderBy($"user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq((1L, 5L, 1200L, 600L, 2L), (2L, 1L, 500L, 0L, 9L)),
      out.toString)
  }

  test("q88 Bollinger chain: a flat 19-row tail flags ANY deviation " +
      "(the degenerate-σ edge), direction splits on the sign, warm-up " +
      "windows never flag, the cents bound aborts row-level") {
    import spark.implicits._
    // user 1: 20 × 10.00, then 11.00 (up breach), then 9.00 (down —
    // hand-checked: dev² = 4e6 > 4·(n·SS − S²) = 1.6e6); user 2: 19
    // rows only — never a full window, zero flags
    val rows =
      (1 to 20).map(i => (1L, i * 1000000000L, 10.0, i.toLong)) ++
      Seq((1L, 21000000000L, 11.0, 21L), (1L, 22000000000L, 9.0, 22L)) ++
      (1 to 19).map(i => (2L, i * 1000000000L, 5.0, (100 + i).toLong))
    val out = Queries.bollingerOf(
        rows.toDF("user_id", "ts", "value", "event_id"))
      .orderBy($"user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L, 1L, 22L), (2L, 0L, 0L, 19L)),
      out.toSeq.toString)
    val e = intercept[Exception] {
      Queries.bollingerOf(Seq((1L, 1000000000L, 99999.0, 1L))
        .toDF("user_id", "ts", "value", "event_id")).collect()
    }
    assert(e.getMessage.contains("cents"), e.getMessage)
  }

  test("q89 VWAP chain: volume-weighted cents on a hand-computed hour; " +
      "null and zero volumes drop") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1000000000L, 10.0, """{"k": 2}""", 1L),
      (2L, 2000000000L, 20.0, """{"k": 1}""", 2L),
      (3L, 3000000000L, 77.0, """{"nope": 5}""", 3L), // no volume -> drop
      (4L, 4000000000L, 88.0, """{"k": 0}""", 4L),    // zero -> drop
      (5L, 3600L * 1000000000L * 2, 30.0, """{"k": 4}""", 5L))
      .toDF("user_id", "ts", "value", "props", "event_id")
    val out = Queries.vwapOf(ev).orderBy($"hr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 3L, 4000.0 / 3.0), // (1000·2 + 2000·1) / 3
      (2L, 1L, 4L, 3000.0)), out.toSeq.toString)
  }

  test("t103 burstiness chain: hand-computed cf/df bands on a planted " +
      "fixture; repeated whitespace never mints empty-string terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "x y x"),   // a: x cf3 df2 -> band 1; y cf1 df1 -> band 0
      (2L, "a", "x z"),     //    z(a) cf1 df1 -> band 0
      (3L, "b", "z z z z"), // b: z cf4 df1 -> 4 > 2 -> band 2
      (4L, "c", "w  w "))   // c: w cf2 df1 -> band 1; empties dropped
      .toDF("doc_id", "lang", "text")
    val out = Queries.burstinessOf(docs)
      .orderBy($"lang", $"band").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      ("a", 0L, 2L, 2L, 1L), ("a", 1L, 1L, 3L, 3L),
      ("b", 2L, 1L, 4L, 4L), ("c", 1L, 1L, 2L, 2L)), out.toString)
  }

  // ---------------------------------------------------------------- twap

  test("q77 TWAP chain: prevailing-interval weighting on hand-computed " +
      "intervals; single-event users drop") {
    import spark.implicits._
    // ns timestamps: v=10.00 holds 10000 us, v=20.00 holds 30000 us
    // TWAP = (10000*1000 + 30000*2000) / 40000 / 100 = 17.5
    val ev = Seq(
      (1L, 0L, 10.0, 1L),
      (1L, 10000000L, 20.0, 2L),
      (1L, 40000000L, 30.0, 3L),
      (2L, 5000L, 99.0, 4L)) // single event -> no interval -> dropped
      .toDF("user_id", "ts", "value", "event_id")
    val out = Queries.twapOf(ev).orderBy($"user_id").collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 1L && out(0).getLong(1) === 3L)
    assert(out(0).getDouble(2) === 17.5)
  }

  // ------------------------------------------------------------ textrank

  test("textrank: hub word of a star graph ranks first, run is deterministic") {
    val df = spark.createDataFrame(Seq(
      (1L, "hub aa hub bb hub cc"),
      (2L, "hub dd hub aa hub bb"),
      (3L, "hub cc hub dd hub aa")
    )).toDF("id", "txt")
    val out = TextRank.keywords(df, "txt",
      minDf = 2L, maxNodes = 16, iters = 5, k = 5).collect()
    assert(out.head.getString(0) === "hub")
    assert(out.head.getLong(1) > out(1).getLong(1)) // strictly dominant
    val again = TextRank.keywords(df, "txt",
      minDf = 2L, maxNodes = 16, iters = 5, k = 5).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("dictPairCodes: the fused dictionary walk equals the " +
      "arrays_zip + string-filter replica on fuzzed strings") {
    import spark.implicits._
    val dict = Seq("aa", "bb", "cc", "dd")
    val rnd = new scala.util.Random(17)
    // "" entries make double spaces — the t69 trailing-empty semantics
    // and the empty-token adjacency break must match the replica
    val toks = Array("aa", "bb", "cc", "dd", "ee", "", "aa", "zz")
    val docs = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(12))
        .map(_ => toks(rnd.nextInt(toks.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val ws = split($"text", " ", -1)
    val m = greatest(size(ws) - 1, lit(0))
    val rep = docs.select(explode(arrays_zip(
        slice(ws, lit(1), m).as("wa"), slice(ws, lit(2), m).as("wb"))).as("z"))
      .select($"z.wa".as("ea"), $"z.wb".as("eb"))
      .filter($"ea" =!= "" && $"eb" =!= "" && $"ea" =!= $"eb")
      .filter($"ea".isin(dict: _*) && $"eb".isin(dict: _*))
      .groupBy($"ea", $"eb").agg(count(lit(1)).as("w"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val got = TextRank.edgeCensus(docs, "text", dict.toArray)
      .collect()
      .map(r => ((dict(r.getInt(0)), dict(r.getInt(1))), r.getLong(2)))
      .toMap
    assert(got == rep, s"walk=$got replica=$rep")
    assert(got.nonEmpty, "fuzz corpus must produce edges")
  }

  // ------------------------------------------------------------ streams

  test("streaming blocklist census equals the batch census; drained " +
      "replay appends nothing; empty feed yields the census schema") {
    val docs = Tables.load(spark, sf, "documents")
    val base = s"/tmp/graft_blockstream_spec/${System.nanoTime()}"
    val feed = s"$base/feed"
    docs.write.parquet(feed)
    val phrases = Seq("scan", "table", "slow")
    def run() = streaming.Streams.blocklistStream(spark, feed, docs,
      "doc_id", "text", phrases, flagMin = 3L, s"$base/out", s"$base/ckpt")
    val streamed = run().orderBy($"doc_id").collect().toSeq
    val batch = CorpusStats.blocklistCensus(docs, "doc_id", "text",
      phrases, flagMin = 3L).orderBy($"doc_id").collect().toSeq
    assert(streamed == batch)
    assert(streamed.exists(_.getInt(4) == 1), "fixture must flag something")
    assert(run().count() == batch.length.toLong) // checkpointed replay
    val emptyBase = s"$base/empty"
    new java.io.File(s"$emptyBase/feed").mkdirs()
    val empty = streaming.Streams.blocklistStream(spark, s"$emptyBase/feed",
      docs, "doc_id", "text", phrases, 3L, s"$emptyBase/out",
      s"$emptyBase/ckpt")
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq ===
      Seq("doc_id", "n_hits", "n_phr", "top_phrase", "flagged"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("streaming gate stack equals the batch stack; drained replay " +
      "appends nothing; empty feed yields the card schema") {
    import graft.operators.LangNb
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
    val m = LangNb.fit(Tables.load(spark, sf, "documents")
      .filter($"doc_id" % 5 =!= 4L), "text", "lang")
    val k = LangNb.kernel(m)
    val phrases = Seq("scan", "table", "slow")
    val base = s"/tmp/graft_gatestream_spec/${System.nanoTime()}"
    docs.write.parquet(s"$base/feed")
    def run() = streaming.Streams.gateStackStream(spark, s"$base/feed",
      docs, "doc_id", "text", k, phrases, 250L, 8L, 1L, 0.72,
      s"$base/out", s"$base/ckpt")
    val streamed = run().orderBy($"doc_id").collect().toSeq
    val batch = CorpusStats.gateStack(docs, "doc_id", "text", k, phrases,
      250L, 8L, 1L, 0.72).orderBy($"doc_id").collect().toSeq
    assert(streamed == batch)
    assert(streamed.exists(_.getInt(5) == 1) &&
      streamed.exists(_.getInt(5) == 0), "both outcomes must occur")
    assert(run().count() == batch.length.toLong) // checkpointed replay
    val emptyBase = s"$base/empty"
    new java.io.File(s"$emptyBase/feed").mkdirs()
    val empty = streaming.Streams.gateStackStream(spark,
      s"$emptyBase/feed", docs, "doc_id", "text", k, phrases,
      250L, 8L, 1L, 0.72, s"$emptyBase/out", s"$emptyBase/ckpt")
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq ===
      Seq("doc_id", "ent_ok", "block_ok", "lang_ok", "q_ok", "keep"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  // ---------------------------------------------------------------- kl

  test("sourceKl equals a driver replica in exact integers; planted " +
      "drift flags; uniform slices do not") {
    val rows = Seq(
      ("a", "x y x y"), ("a", "x y"),
      ("b", "x y x y"), ("b", "x y"),
      ("c", "z z z z z z")) // c's tokens are all its own → high KL
    val df = spark.createDataFrame(rows).toDF("src", "txt")
    val out = CorpusStats.sourceKl(df, "src", "txt", 1L, 10L)
      .orderBy($"src").collect()
    // driver replica
    val toks = rows.flatMap { case (s, t) => t.split(" ").map(s -> _) }
    val cen = toks.groupBy(identity).map { case ((s, w), g) =>
      (s, w, g.size.toLong) }.toSeq
    val d = cen.groupBy(_._2).map { case (w, g) => w -> g.map(_._3).sum }
    val ns = cen.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    val m = cen.map(_._3).sum
    val exp = ns.keys.toSeq.sorted.map { s =>
      val num = cen.filter(_._1 == s).map { case (_, w, c) =>
        c * (NgramLm.surprisal64Long(c * m) -
          NgramLm.surprisal64Long(d(w) * ns(s)))
      }.sum
      (s, ns(s), num, 64L * ns(s))
    }
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === exp)
    // the flag IS the cross-multiplied rational of the replica
    val expFlag = exp.map { case (_, _, num, den) =>
      if (num * 10L > den) 1 else 0 }
    assert(out.map(_.getInt(4)).toSeq === expFlag)
    // c's tokens are all its own → strictly the largest divergence
    // (a and b also diverge from the blend c shifts — KL is vs the
    // corpus MIXTURE, not vs each other)
    val bits = exp.map { case (s, _, num, den) => s -> num.toDouble / den }
      .toMap
    assert(bits("c") > bits("a") && bits("c") > bits("b"))
    assert(bits("a") === bits("b")) // identical slices → identical card
  }

  test("textrank fails fast on an empty node set") {
    val df = spark.createDataFrame(Seq((1L, "all unique words here")))
      .toDF("id", "txt")
    val e = intercept[IllegalArgumentException] {
      TextRank.keywords(df, "txt", minDf = 5L,
        maxNodes = 8, iters = 2, k = 3).collect()
    }
    assert(e.getMessage.contains("at least one node"))
  }
}
