package graft

import graft.operators.Bpe
import graft.operators.Bpe.Merge

/** BPE subword tokenizer (Sennrich et al. 2016): training goldens on
  * the paper's classic corpus under this repo's deterministic
  * tie-break, the greedy-encode ≡ rank-order-application equivalence,
  * round-trip detokenization, and the census/row surfaces. */
class BpeSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    // the Sennrich corpus: low×5, lower×2, newest×6, widest×3
    Seq((1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("training goldens on the classic corpus: (count DESC, lhs, rhs) " +
      "tie-break, left-to-right passes") {
    val m = Bpe.trainMerges(corpus, "text", 6)
    assert(m == Seq(
      Merge(1, "e", "s"), Merge(2, "es", "t"), Merge(3, "est", "</w>"),
      Merge(4, "l", "o"), Merge(5, "lo", "w"), Merge(6, "e", "w")), m)
  }

  // ---------------------------------------------- byte-level (t65)

  test("byte-level pre-tokenization is a LOSSLESS partition — CJK one " +
      "pre-token per code point, runs elsewhere — and Spark's " +
      "regexp_extract_all matches the driver regex exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq(
      "次の実験は5回目です。",           // ja: kanji+kana, digit, punct
      "Hello, 世界! こんにちは",          // mixed latin/CJK
      "สวัสดีครับ ไปไหน",                // th: no-space letter runs
      "naïve café — résumé",             // combining-ish latin + dash
      "a b",                        // NBSP (neither \s nor letter)
      "🙂👍 emoji 12345",                // supplementary plane + digits
      "  \t tabs and  runs ")
    val p = java.util.regex.Pattern.compile(Bpe.preTokRe)
    def driverToks(t: String): Seq[String] = {
      val m = p.matcher(t); val b = Seq.newBuilder[String]
      while (m.find()) b += m.group(0)
      b.result()
    }
    val sparkToks = texts.toDF("text")
      .select($"text", regexp_extract_all($"text", lit(Bpe.preTokRe),
        lit(0)).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for (t <- texts) {
      val d = driverToks(t)
      assert(d.mkString == t, s"lossy partition of '$t': $d")
      assert(sparkToks(t) == d, s"engine drift on '$t'")
    }
    // pure-CJK text: one pre-token per code point
    assert(driverToks("次の実験") == Seq("次", "の", "実", "験"))
    // vs the space-split word form: the whole line is ONE "word" there
    assert("次の実験は5回目です。".split(" ").length == 1)
  }

  test("byte fallback: merges trained on an ENGLISH corpus still " +
      "encode CJK/Thai/emoji text — and decode is an exact round-trip") {
    val rk = Bpe.trainMerges(corpus, "text", 0) // even ZERO merges work
    val rk6 = Bpe.trainMergesBytesFromFreq(
      Bpe.byteWordFreq(corpus, "text"), 6)
      .map(m => (m.lhs, m.rhs) -> m.rank).toMap
    assert(rk.isEmpty)
    for (t <- Seq("次の実験は5回目です。", "สวัสดีครับ ไปไหน",
        "🙂👍 low lower newest", "mixed 次 and low",
        "a b  \t runs")) {
      val toks = Bpe.encodeTextBytes(t, rk6)
      assert(Bpe.decodeTokensBytes(toks) == t, s"round-trip broke: '$t'")
      assert(toks.nonEmpty)
    }
    // no token is ever OOV: every token is hex pairs (+ optional mark)
    val toks = Bpe.encodeTextBytes("次 low", rk6)
    assert(toks.forall(tk => tk == Bpe.EndMark ||
      tk.replace(Bpe.EndMark, "").forall(c =>
        (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F'))), toks)
  }

  test("byte-level training compresses like the char form: enough " +
      "merges collapse every classic-corpus word to ONE token that " +
      "decodes back to the word; CJK fertility is per CODE POINT, " +
      "not per line") {
    val rk = Bpe.trainMergesBytesFromFreq(
      Bpe.byteWordFreq(corpus, "text"), 60)
      .map(m => (m.lhs, m.rhs) -> m.rank).toMap
    for (w <- Seq("low", "lower", "newest", "widest")) {
      val e = Bpe.encodeWordBytes(w, rk)
      assert(e.length == 1, s"$w -> ${e.toSeq}")
      assert(Bpe.decodeTokensBytes(e.toSeq) == w)
    }
    // a repeated-kanji corpus: frequent chars compress to 1 token each
    val s = spark
    import s.implicits._
    val zh = Seq.fill(50)((1L, "数据 清洗 数据 训练")).toDF("doc_id", "text")
    val zf = Bpe.byteWordFreq(zh, "text")
    // per-code-point pre-tokens: 6 distinct kanji + the space run
    val words = zf.collect().map(_.getString(0)).toSet
    assert(words == Set("数", "据", "清", "洗", "训", "练", " "), words)
    val zrk = Bpe.trainMergesBytesFromFreq(zf, 30)
      .map(m => (m.lhs, m.rhs) -> m.rank).toMap
    // fertility: every kanji (3 UTF-8 bytes + mark = 4 seeds) reaches
    // a single merged token — tokens-per-pretoken = 1, sane fertility
    for (w <- Seq("数", "据", "清", "洗")) {
      val e = Bpe.encodeWordBytes(w, zrk)
      assert(e.length == 1, s"$w -> ${e.toSeq}")
      assert(Bpe.decodeTokensBytes(e.toSeq) == w)
    }
  }

  test("pre-tokenization breaks a letter run at the non-CJK→CJK " +
      "script boundary (round-15 verdict #4): 'iPhone超大' is " +
      "'iPhone' + one pre-token per ideograph, and the round-trip " +
      "stays lossless") {
    val re = Bpe.preTokRe.r
    def pre(s: String) = re.findAllIn(s).toList
    assert(pre("iPhone超大発売") ==
      List("iPhone", "超", "大", "発", "売"))
    assert(pre("超大iPhone") == List("超", "大", "iPhone"))
    assert(pre("한국어abc한글") ==
      List("한", "국", "어", "abc", "한", "글"))
    assert(pre("abc123日本語def") ==
      List("abc", "123", "日", "本", "語", "def"))
    // latin-with-marks runs survive intact; kana still per code point
    assert(pre("naïve café") == List("naïve", " ", "café"))
    assert(pre("ひらがな") == List("ひ", "ら", "が", "な"))
    // losslessness: concatenating pre-tokens reproduces the input
    for (s <- Seq("iPhone超大発売", "mixed 超text 123\n\tend",
        "한국어abc한글", "🙂次の5回", ""))
      assert(pre(s).mkString == s, s"lossy on '$s'")
  }

  test("incremental pair-index trainer is BIT-IDENTICAL to the " +
      "full-rescan reference loop (seeded corpus with ties and runs, " +
      "trained to full exhaustion)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef"
    // ~400 distinct words incl. repeated-letter runs (overlap cases)
    // and freq ties (same freq, different words → tie-break exercised)
    val entries: Array[(Array[String], Long)] =
      (0 until 400).map { i =>
        val len = 2 + rnd.nextInt(7)
        val w = (0 until len)
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        (Bpe.toSyms(w), (1 + rnd.nextInt(20)).toLong)
      }.toArray
    def clone2(e: Array[(Array[String], Long)]) =
      e.map { case (s, f) => (s.clone(), f) }
    // 5000 > the total symbol budget (~400 words × ≤8 syms), so both
    // trainers hit the exhaustion early-stop path
    val fast = Bpe.trainMergesLocal(clone2(entries), 5000)
    val ref = Bpe.trainMergesRescan(clone2(entries), 5000)
    assert(fast == ref,
      s"first divergence at ${fast.zip(ref).indexWhere(p => p._1 != p._2)}")
    assert(fast.length < 5000, s"expected exhaustion, got ${fast.length}")
    // and the Sennrich golden corpus agrees too (the t28 path)
    val sennrich = Array(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .map { case (w, f) => (Bpe.toSyms(w), f) }
    assert(Bpe.trainMergesLocal(clone2(sennrich), 40) ==
      Bpe.trainMergesRescan(clone2(sennrich), 40))
  }

  test("incremental trainer parity holds through a PRODUCTION-scale " +
      "merge budget (1000 merges on a corpus big enough not to " +
      "exhaust — the goldens above stop at exhaustion/40)") {
    val rnd = new scala.util.Random(20260815)
    val entries: Array[(Array[String], Long)] =
      (0 until 3000).map { _ =>
        val len = 4 + rnd.nextInt(9)
        val w = (0 until len)
          .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        (Bpe.toSyms(w), (1 + rnd.nextInt(50)).toLong)
      }.toArray
    def clone2(e: Array[(Array[String], Long)]) =
      e.map { case (s, f) => (s.clone(), f) }
    val fast = Bpe.trainMergesLocal(clone2(entries), 1000)
    val ref = Bpe.trainMergesRescan(clone2(entries), 1000)
    assert(fast.length == 1000, s"corpus exhausted at ${fast.length}")
    assert(fast == ref,
      s"first divergence at ${fast.zip(ref).indexWhere(p => p._1 != p._2)}")
  }

  test("greedy encode of an UNSEEN word composes trained subwords: " +
      "lowest -> [low, est</w>] (the paper's example)") {
    val rk = Bpe.trainMerges(corpus, "text", 6)
      .map(m => (m.lhs, m.rhs) -> m.rank).toMap
    assert(Bpe.encodeWord("lowest", rk).toSeq == Seq("low", "est</w>"))
    // untrained symbols survive as singletons
    assert(Bpe.encodeWord("lox", rk).toSeq == Seq("lo", "x", "</w>"))
  }

  test("greedy encode equals applying merges in rank order (one " +
      "left-to-right pass each) for every trained word") {
    val merges = Bpe.trainMerges(corpus, "text", 6)
    val rk = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    for (w <- Seq("low", "lower", "newest", "widest")) {
      var syms = Bpe.toSyms(w)
      merges.foreach(m => syms = Bpe.mergePass(syms, m.lhs, m.rhs))
      assert(Bpe.encodeWord(w, rk).toSeq == syms.toSeq, w)
    }
  }

  test("overlapping occurrences merge left-to-right: aaa under (a,a) " +
      "-> [aa, a]") {
    assert(Bpe.mergePass(Array("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
  }

  test("tokens detokenize: concatenation minus the end mark rebuilds " +
      "the word") {
    val rk = Bpe.trainMerges(corpus, "text", 6)
      .map(m => (m.lhs, m.rhs) -> m.rank).toMap
    for (w <- Seq("low", "lowered", "newest", "zzz"))
      assert(Bpe.encodeWord(w, rk).mkString.stripSuffix(Bpe.EndMark) == w)
  }

  test("wordTokenCounts: the broadcastable word -> subword-count table " +
      "equals per-word greedy encode lengths") {
    val wf = Bpe.wordFreq(corpus, "text")
    val merges = Bpe.trainMergesFromFreq(wf, 6)
    val rk = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val got = Bpe.wordTokenCounts(wf, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (w <- Seq("low", "lower", "newest", "widest"))
      assert(got(w) == Bpe.encodeWord(w, rk).length.toLong, w)
  }

  test("the model persists: save/load round-trips the merge table and " +
      "the loaded model encodes identically") {
    val merges = Bpe.trainMerges(corpus, "text", 6)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe")
    val p = s"$dir/model"
    Bpe.saveModel(spark, merges, p)
    val loaded = Bpe.loadModel(spark, p)
    assert(loaded == merges)
    val rk = loaded.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    assert(Bpe.encodeWord("lowest", rk).toSeq == Seq("low", "est</w>"))
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("tokenCensus aggregates freq-weighted subword counts; " +
      "withBpeTokens flattens per-row tokens consistently") {
    val merges = Bpe.trainMerges(corpus, "text", 6)
    val census = Bpe.tokenCensus(corpus, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // est</w> closes newest (6) and widest (3); low opens low (5),
    // lower (2) — after merge 6 'newest' is n,ew,est</w>
    assert(census("est</w>") == 9L, census)
    assert(census("low") == 7L, census)
    assert(census("ew") == 6L, census)
    val rk = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val rows = Bpe.withBpeTokens(corpus, "text", merges, "toks")
      .select("toks").collect()
    val flat = rows.head.getSeq[String](0)
    val expect = corpus.collect().head.getString(1).split(" ").toSeq
      .flatMap(w => Bpe.encodeWord(w, rk))
    assert(flat == expect)
    // census == the flat stream's counts (one doc, so they must agree)
    assert(flat.groupBy(identity).view.mapValues(_.size.toLong).toMap ==
      census)
  }

  test("t37 shard invariants on the documents table: token mass is " +
      "conserved, interior chunks are exactly full, ids stay inside " +
      "the vocab, and a doc's ids concatenate in encode order") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val out = SparkEntry.queries("t37_bpe_shards")(spark, sf).collect()
    val rows = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3).split("-").map(_.toLong).toSeq))
    // n_tokens == the emitted id count, every chunk holds ≤ 512
    rows.foreach { case (sh, ch, n, ids) =>
      assert(n == ids.length && n <= 512L, s"shard $sh chunk $ch")
    }
    // interior chunks (not the shard's last) are exactly full
    rows.groupBy(_._1).foreach { case (sh, rs) =>
      val last = rs.map(_._2).max
      rs.filter(_._2 < last).foreach { case (_, ch, n, _) =>
        assert(n == 512L, s"shard $sh interior chunk $ch has $n") }
    }
    // total mass == the per-doc token totals
    val docs = Tables.load(spark, sf, "documents")
    val wf = operators.Bpe.wordFreq(docs, "text")
    val merges = operators.Bpe.trainMergesFromFreq(wf, 40)
    val total = operators.Bpe
      .docTokenCounts(docs, "doc_id", "text", wf, merges)
      .agg(sum($"n_btok")).collect().head.getLong(0)
    assert(rows.map(_._3).sum == total)
    // ids < vocab size
    val vocabN = operators.Bpe.tokenCensusFromFreq(wf, merges).count()
    assert(rows.flatMap(_._4).forall(id => id >= 0 && id < vocabN))
    // shard 0's id stream == the concatenated encodings of its docs in
    // doc order (the packing preserves encode order end-to-end)
    val rk = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val censusIds = operators.Bpe.tokenCensusFromFreq(wf, merges)
      .orderBy($"freq".desc, $"token".asc).collect()
      .map(_.getString(0)).zipWithIndex.toMap
    val expect = docs.filter($"doc_id" % 4 === 0).orderBy($"doc_id")
      .select($"text").as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty)
        .flatMap(w => operators.Bpe.encodeWord(w, rk)))
      .map(t => censusIds(t).toLong).toSeq
    val got = rows.filter(_._1 == 0L).sortBy(_._2).flatMap(_._4).toSeq
    assert(got == expect)
  }

  test("unigram viterbi: globally optimal (cost, n_pieces) vs " +
      "brute-force enumeration; never worse than greedy BPE under the " +
      "same costs; segs reassemble; multi-symbol pieces are in-census") {
    import graft.operators.Unigram
    val docs = Tables.load(spark, sf, "documents")
    val wf = Bpe.wordFreq(docs, "text")
    val merges = Bpe.trainMergesFromFreq(wf, 40)
    val census = Bpe.tokenCensusFromFreq(wf, merges)
    val (cm, cv) = Unigram.censusCosts(census)
    def pieceCost(c: Long) = operators.NgramLm.surprisal64Long(cv) -
      operators.NgramLm.surprisal64Long(c + 1)
    val rk = merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val got = Unigram.viterbiTable(wf, census, maxSyms = 12,
      topWords = 500, maxPieceSyms = 8).collect()
    assert(got.nonEmpty)
    var vitTotal = 0L; var greedyTotal = 0L
    got.foreach { r =>
      val (w, np, c, seg) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3))
      val pieces = seg.split("-").toSeq
      assert(pieces.length == np && pieces.mkString == w + "</w>")
      pieces.filter(p => Bpe.toSyms(p).length > 2 ||
        (p.length > 1 && p != "</w>")).foreach(p =>
        assert(cm.contains(p), s"piece $p of $w not in census"))
      // greedy BPE is feasible for the same vocabulary: never cheaper
      val greedy = Bpe.encodeWord(w, rk)
        .map(p => pieceCost(cm.getOrElse(p, 0L))).sum
      assert(c <= greedy, s"$w: viterbi $c > greedy $greedy")
      vitTotal += c; greedyTotal += greedy
      // brute-force global optimum on short words
      val syms = Bpe.toSyms(w)
      if (syms.length <= 7) {
        def enum(i: Int): Seq[(Long, Int)] =
          if (i == syms.length) Seq((0L, 0))
          else (i + 1 to math.min(syms.length, i + 8)).flatMap { j =>
            val piece = syms.slice(i, j).mkString
            val cnt = if (j - i == 1) Some(cm.getOrElse(piece, 0L))
                      else cm.get(piece)
            cnt.toSeq.flatMap(cc =>
              enum(j).map { case (rc, rn) => (pieceCost(cc) + rc, rn + 1) })
          }
        val best = enum(0).min
        assert((c, np) == best, s"$w: dp ($c,$np) vs brute $best")
      }
    }
    assert(vitTotal <= greedyTotal)
  }

  test("streaming tokenize-and-count equals batch docTokenCounts from " +
      "the persisted merge table; drained replay appends nothing") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, sf, "documents").limit(60)
      .select($"doc_id", $"text")
    val base = java.nio.file.Files.createTempDirectory("tokstream").toString
    val wf = Bpe.wordFreq(docs, "text")
    val merges = Bpe.trainMergesFromFreq(wf, 40)
    Bpe.saveModel(spark, merges, s"$base/model")
    docs.write.parquet(s"$base/feed")
    def run() = streaming.Streams.tokenizeCountStream(spark,
      s"$base/feed", docs, "doc_id", "text", s"$base/model",
      s"$base/out", s"$base/ckpt")
    val streamed = run().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Bpe.docTokenCounts(docs, "doc_id", "text", wf, merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, "stream must equal batch")
    assert(run().count() == batch.size.toLong,
      "drained replay must append nothing")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("t72 unigram hard-EM: per-pass weighted total cost never " +
      "increases; unused pieces prune out of the census; the fitted " +
      "segmentations are brute-force optimal UNDER THE FITTED MODEL " +
      "and reassemble") {
    import graft.operators.Unigram
    val docs = Tables.load(spark, sf, "documents")
    val wf = Bpe.wordFreq(docs, "text")
    val merges = Bpe.trainMergesFromFreq(wf, 40)
    val census = Bpe.tokenCensusFromFreq(wf, merges)
    val (cm0, cv0) = Unigram.censusCosts(census)
    val words = Unigram.selectWords(wf, maxSyms = 10, topWords = 300)
    val (cm, cv, totals) =
      Unigram.emFit(words, cm0, cv0, rounds = 3, maxPieceSyms = 8)
    assert(totals.length == 4, "rounds + 1 per-pass totals")
    totals.sliding(2).foreach { w =>
      assert(w(1) <= w(0), s"likelihood regressed across passes: $totals")
    }
    assert(totals.last < totals.head,
      "EM must actually improve the fit on this corpus")
    // pruning: only pieces some Viterbi path uses survive — a strict
    // subset of the seed BPE census over this bounded word universe
    assert(cm.size < cm0.size, s"census must shrink: ${cm.size} vs ${cm0.size}")
    cm.keys.foreach(p => assert(
      cm0.contains(p) || Bpe.toSyms(p).length == 1,
      s"fitted piece $p is neither seed-census nor a single symbol"))
    def pieceCost(c: Long) = operators.NgramLm.surprisal64Long(cv) -
      operators.NgramLm.surprisal64Long(c + 1)
    val table = Unigram.emTable(wf, census, rounds = 3, maxSyms = 10,
      topWords = 300, maxPieceSyms = 8).collect()
    assert(table.length == words.length)
    table.foreach { r =>
      val (w, np, c, seg) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3))
      val pieces = seg.split("-").toSeq
      assert(pieces.length == np && pieces.mkString == w + "</w>")
      val syms = Bpe.toSyms(w)
      if (syms.length <= 7) {
        def enum(i: Int): Seq[(Long, Int)] =
          if (i == syms.length) Seq((0L, 0))
          else (i + 1 to math.min(syms.length, i + 8)).flatMap { j =>
            val piece = syms.slice(i, j).mkString
            val cnt = if (j - i == 1) Some(cm.getOrElse(piece, 0L))
                      else cm.get(piece)
            cnt.toSeq.flatMap(cc =>
              enum(j).map { case (rc, rn) => (pieceCost(cc) + rc, rn + 1) })
          }
        val best = enum(0).min
        assert((c, np) == best, s"$w: dp ($c,$np) vs brute $best")
      }
    }
  }

  test("t43 fertility card: every word is at least one token " +
      "(fertility >= 1), token mass matches docTokenCounts, and word " +
      "counts match the raw split") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t43_bpe_fertility")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nw, nt, nc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (fert, cpt) = (r.getDouble(4), r.getDouble(5))
      assert(nt >= nw, s"lang ${r.getString(0)}: fewer tokens than words")
      assert(fert == nt.toDouble / nw && cpt == nc.toDouble / nt)
    }
    val docs = Tables.load(spark, sf, "documents")
    val words = docs
      .select(explode(split($"text", " ")).as("w")).filter($"w" =!= "")
      .count()
    assert(out.map(_.getLong(1)).sum == words)
    val wf = operators.Bpe.wordFreq(docs, "text")
    val merges = operators.Bpe.trainMergesFromFreq(wf, 40)
    val total = operators.Bpe
      .docTokenCounts(docs, "doc_id", "text", wf, merges)
      .agg(sum($"n_btok")).collect().head.getLong(0)
    assert(out.map(_.getLong(2)).sum == total)
  }

  test("writeShards materializes (shard, chunk, array<long>) parquet " +
      "bit-exact against t37's dash-joined strings, partitioned by " +
      "shard for pruned loader reads") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    operators.Packing.writeShards(Queries.t37PackedRows(spark, sf), dir)
    // shard=N partition layout on disk → loader partition pruning
    assert(new java.io.File(dir).list().count(_.startsWith("shard=")) == 4)
    val back = operators.Packing.readShards(spark, dir)
      .select($"shard".cast("long"), $"chunk", $"n_tokens",
        concat_ws("-", transform($"token_ids", x => x.cast("string"))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    val q = SparkEntry.queries("t37_bpe_shards")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(back == q)
    // single-shard read returns exactly that shard's chunks
    val one = operators.Packing.readShards(spark, dir, Some(2))
    assert(one.select(countDistinct($"shard")).collect().head.getLong(0)
      == 1L)
    assert(one.count() == q.count(_._1 == 2L).toLong)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  // ---------------------------------------------- WordPiece (t82)

  test("wordpiece: likelihood objective beats raw frequency — a rare " +
      "pair of rare symbols outscores a frequent pair of frequent " +
      "symbols; ## continuation prefixes carry correctly") {
    import graft.operators.WordPiece
    // pair (a,##b) cnt 10 but cnt(a)=100, cnt(##b)=10: score 2^40/100;
    // pair (x,##y) cnt 5 with cnt(x)=cnt(##y)=5: score 2^40/5 — wins
    val entries: Array[(Array[String], Long)] = Array(
      (WordPiece.toSymsWp("ab"), 10L),
      (WordPiece.toSymsWp("a"), 90L),
      (WordPiece.toSymsWp("xy"), 5L))
    val m = WordPiece.trainLocal(entries.map { case (s, f) => (s.clone(), f) }, 1)
    assert(m.head.lhs == "x" && m.head.rhs == "##y" &&
      m.head.token == "xy", m.toString)
    assert(m.head.score64 == (1L << 40) / 5L, m.head.toString)
    // continuation-pair merge keeps the ## prefix: "abc"×3 has both
    // adjacent pairs at cnt 3 and all symbols at 3 -> score tie,
    // cnt tie -> lexicographic: "##b" < "a" so (##b,##c) merges first
    // into "##bc", then (a,##bc) -> "abc"
    val abc = Array((WordPiece.toSymsWp("abc"), 3L))
    val m2 = WordPiece.trainLocal(abc.map { case (s, f) => (s.clone(), f) }, 2)
    assert(m2.map(x => (x.lhs, x.rhs, x.token)) ==
      Seq(("##b", "##c", "##bc"), ("a", "##bc", "abc")), m2.toString)
  }

  test("wordpiece: incremental trainer is bit-identical to the " +
      "full-rescan reference to exhaustion (random corpus + goldens)") {
    import graft.operators.WordPiece
    val rnd = new scala.util.Random(20260816)
    val entries: Array[(Array[String], Long)] =
      (0 until 400).map { _ =>
        val len = 1 + rnd.nextInt(8)
        val w = (0 until len)
          .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
        (WordPiece.toSymsWp(w), (1 + rnd.nextInt(20)).toLong)
      }.toArray
    def clone2(e: Array[(Array[String], Long)]) =
      e.map { case (s, f) => (s.clone(), f) }
    val fast = WordPiece.trainLocal(clone2(entries), 5000)
    val ref = WordPiece.trainRescan(clone2(entries), 5000)
    assert(fast == ref,
      s"first divergence at ${fast.zip(ref).indexWhere(p => p._1 != p._2)}")
    assert(fast.length < 5000, s"expected exhaustion, got ${fast.length}")
  }

  test("wordpiece lifecycle: save/load round-trips the model exactly, " +
      "streaming meter == batch docTokenCounts, drained replay is a " +
      "no-op, a never-fired feed returns schema-correct empty") {
    import graft.operators.{Bpe, WordPiece}
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
    val wf = Bpe.wordFreq(docs, "text")
    val (m, v) = WordPiece.fitFromFreq(wf, 12)
    val dir = java.nio.file.Files.createTempDirectory("wpmodel").toString
    WordPiece.saveModel(spark, m, v, s"$dir/model")
    val (m2, v2) = WordPiece.loadModel(spark, s"$dir/model")
    assert(m2 == m, "merge table round-trip")
    assert(v2 == v, "vocab round-trip")
    val batch = WordPiece.docTokenCounts(docs, "doc_id", "text", wf, v)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    docs.write.mode("overwrite").parquet(s"$dir/feed")
    def run() = graft.streaming.Streams.wordpieceMeterStream(spark,
        s"$dir/feed", docs, "doc_id", "text", s"$dir/model",
        s"$dir/out", s"$dir/ckpt")
      .dropDuplicates("doc_id").orderBy($"doc_id").collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("n_wptok")))).toSeq
    assert(run() == batch, "stream == batch")
    assert(run() == batch, "drained replay is a no-op")
    new java.io.File(s"$dir/feed2").mkdirs()
    val empty = graft.streaming.Streams.wordpieceMeterStream(spark,
      s"$dir/feed2", docs, "doc_id", "text", s"$dir/model",
      s"$dir/out2", s"$dir/ckpt2")
    assert(empty.columns.toSeq == Seq("doc_id", "n_wptok"), empty.columns.toSeq)
    assert(empty.count() == 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("wordpiece: score64 BigInt fallback equals the exact formula " +
      "beyond the Long fast path; greedy longest-match encoding and " +
      "the [UNK] wholesale rule") {
    import graft.operators.WordPiece
    // beyond the fast path: cnt > 2^23 forces the BigInt route
    val big = 1L << 30
    assert(WordPiece.score64(big, big, big) ==
      ((BigInt(big) << 40) / (BigInt(big) * BigInt(big))).toLong)
    assert(WordPiece.score64(3L, 5L, 7L) == (3L << 40) / 35L)
    val vocab = Set("a", "##b", "##c", "##bc", "abc")
    assert(WordPiece.encodeWord("abc", vocab) == Seq("abc"))
    assert(WordPiece.encodeWord("ab", vocab) == Seq("a", "##b"))
    assert(WordPiece.encodeWord("abcbc", vocab) ==
      Seq("abc", "##bc"), "longest-match-first at each position")
    assert(WordPiece.encodeWord("az", vocab) == Seq("[UNK]"),
      "unmatchable position -> wholesale UNK")
    assert(WordPiece.encodeWord("", vocab).isEmpty)
    // '##'-initial words: a '##%' vocab string is continuation-ONLY
    // (the oracle's vp rule) — it must not match at word start even
    // when the word literally begins with '##'. Vocab of the word
    // '##x' itself: seeds {'#', '###', '##x'}; greedy = head '#',
    // then cont '#' (cand '###'), then cont 'x' (cand '##x').
    val hashVocab = Set("#", "###", "##x")
    assert(WordPiece.encodeWord("##x", hashVocab) ==
      Seq("#", "###", "##x"), "##-initial word takes the head-# path")
    // and the degenerate '##' piece is unreachable at any position
    assert(WordPiece.encodeWord("##", Set("##", "#", "###")) ==
      Seq("#", "###"))
  }
}
