package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontam, Packing}

/** Sequence packing + benchmark decontamination. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // lengths chosen to exercise: exact fit, overflow rollover, an
  // over-budget doc (gets its own bin), and a zero-length doc
  private val docs = Seq(
    (0L, 60L), (4L, 50L), (8L, 0L), (12L, 150L), (16L, 40L), (20L, 90L),
    (1L, 100L), (5L, 100L), (9L, 1L), (13L, 99L), (17L, 300L), (21L, 10L),
    (2L, 128L), (6L, 128L), (10L, 128L), (14L, 1L),
    (3L, 7L), (7L, 11L), (11L, 13L)
  ).toDF("id", "len")

  test("chunkOverlap: full coverage, fixed overlap, clipped tail, and the " +
      "boundary cases (len == size, len < stride, empty doc)") {
    val fixture = Seq((1L, 200L), (2L, 64L), (3L, 10L), (4L, 0L), (5L, 65L))
      .toDF("id", "len")
    val got = Packing.chunkOverlap(fixture, "id", $"len", size = 64, stride = 48)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    // len 200: chunks = 1 + ceil(136/48) = 4; starts 1,49,97,145
    val c1 = got(1L).sortBy(_._2)
    assert(c1.map(c => (c._3, c._4)).toSeq ==
      Seq((1L, 64L), (49L, 112L), (97L, 160L), (145L, 200L)))
    // every token covered, consecutive windows overlap by exactly 16
    // (except the clipped tail, which may overlap more)
    c1.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._4 + 1, "gap in coverage")
    }
    assert(c1.last._4 == 200L)
    // len == size → exactly one full window
    assert(got(2L).map(c => (c._3, c._4)).toSeq == Seq((1L, 64L)))
    // len < stride → one clipped window
    assert(got(3L).map(c => (c._3, c._4, c._5)).toSeq == Seq((1L, 10L, 10L)))
    // empty doc → no chunks
    assert(!got.contains(4L))
    // len = size+1 → second window starts at stride+1, covers the tail
    assert(got(5L).sortBy(_._2).map(c => (c._3, c._4)).toSeq ==
      Seq((1L, 64L), (49L, 65L)))
  }

  test("fuzzyClean = corpus minus exactly the fuzzyReport-flagged ids") {
    val words = (0 until 40).map(i => s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"x$i").mkString(" ")
    val corpus = Seq((1L, words), (2L, other),
      (3L, words.split(" ").take(35).mkString(" "))).toDF("doc_id", "text")
    val bench = Seq((9L, words.split(" ").take(30).mkString(" ")))
      .toDF("doc_id", "text")
    val flagged = Decontam.fuzzyReport(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3, numHashes = 8, bands = 4)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val kept = Decontam.fuzzyClean(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3, numHashes = 8, bands = 4)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L) -- flagged)
    assert(flagged.nonEmpty)
  }

  test("bloomReport: no false negatives vs the exact report, clean is the " +
      "exact complement, and the codegen probe matches a Column replay " +
      "of the position arithmetic") {
    import graft.functions.{NgramHashes, Text}
    import graft.functions.NgramHashExpr.ngramHashes
    val words = (0 until 40).map(i => s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"x$i").mkString(" ")
    val corpus = Seq(
      (1L, words),                                        // full overlap
      (2L, other),                                        // no overlap
      (3L, words.split(" ").take(10).mkString(" ")),      // partial overlap
      (4L, "a b"),                                        // too short for 3-grams
      (5L, (200 until 230).map(i => s"y$i").mkString(" ")) // no overlap
    ).toDF("doc_id", "text")
    val bench = Seq((9L, words.split(" ").take(30).mkString(" ")))
      .toDF("doc_id", "text")
    val (n, k, mBits) = (3, 3, 1 << 12)
    val bits = Decontam.bloomBits(bench, "text", n, k, mBits)
    val bloom = Decontam.bloomReport(corpus, "doc_id", "text", n, k, mBits, bits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every exact hit is a bloom hit, count >= exact
    val exact = Decontam.report(corpus, "doc_id", "text", bench, "text", n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (id, nh) =>
      assert(bloom.contains(id) && bloom(id) >= nh,
        s"doc $id: bloom ${bloom.get(id)} < exact $nh")
    }
    assert(exact.keySet == Set(1L, 3L)) // the fixture's true overlaps
    // clean = corpus minus exactly the bloom-flagged ids
    val kept = Decontam.bloomClean(corpus, "doc_id", "text", n, k, mBits, bits)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L) -- bloom.keySet)
    // Column replay of the probe: distinct (doc, gram), the 3 position
    // expressions, all-in-set filter, per-doc count — must equal the
    // codegen expression exactly (false positives included)
    val P = Text.minhashPrime
    val posSet = (0 until k).flatMap { j =>
      bench.select(explode(ngramHashes($"text", n)).as("g")).distinct()
        .select((($"g" % P) * NgramHashes.keys(j) + NgramHashes.keys(j + 3))
          % P % mBits)
        .collect().map(_.getLong(0))
    }.toSet
    val replay = corpus
      .select($"doc_id", explode(ngramHashes($"text", n)).as("g")).distinct()
      .select(($"doc_id" +: (0 until k).map(j =>
        ((($"g" % P) * NgramHashes.keys(j) + NgramHashes.keys(j + 3))
          % P % mBits).as(s"p$j"))): _*)
      .collect()
      .filter(r => (1 to k).forall(j => posSet.contains(r.getLong(j))))
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.length.toLong }
    assert(replay == bloom)
  }

  test("bloom filter lifecycle: save/load round-trips bit-exact with " +
      "params; append(A);append(B) == build(A union B) bit for bit and " +
      "is idempotent; load without a build fails fast") {
    val mkDoc = (id: Long, lo: Int) =>
      (id, (lo until lo + 20).map(i => s"w$i").mkString(" "))
    val a = Seq(mkDoc(1L, 0), mkDoc(2L, 50)).toDF("doc_id", "text")
    val b = Seq(mkDoc(3L, 100)).toDF("doc_id", "text")
    val (n, k, mBits) = (3, 2, 1 << 10)
    val base = s"/tmp/graft_bloom_spec/${System.nanoTime()}"
    val built = Decontam.buildBloomFilter(a, "text", n, k, mBits, s"$base/f")
    val loaded = Decontam.loadBloomFilter(spark, s"$base/f")
    assert(loaded.n == n && loaded.k == k && loaded.mBits == mBits)
    assert(java.util.Arrays.equals(loaded.bits, built.bits))
    assert(java.util.Arrays.equals(built.bits,
      Decontam.bloomBits(a, "text", n, k, mBits)))
    // append == rebuild over the union, and appending B again is a no-op
    val appended = Decontam.appendToBloomFilter(b, "text", s"$base/f")
    val rebuilt = Decontam.bloomBits(a.union(b), "text", n, k, mBits)
    assert(java.util.Arrays.equals(appended.bits, rebuilt))
    val again = Decontam.appendToBloomFilter(b, "text", s"$base/f")
    assert(java.util.Arrays.equals(again.bits, rebuilt))
    assert(java.util.Arrays.equals(
      Decontam.loadBloomFilter(spark, s"$base/f").bits, rebuilt))
    val miss = intercept[IllegalArgumentException] {
      Decontam.loadBloomFilter(spark, s"$base/nowhere")
    }
    assert(miss.getMessage.contains("buildBloomFilter"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  private def referenceGreedy(rows: Seq[(Long, Long)], budget: Long)
      : Map[Long, Int] = {
    var bin = 0; var filled = 0L; var first = true
    rows.sortBy(_._1).map { case (id, len) =>
      if (first) { first = false; filled = len }
      else if (filled + len <= budget) filled += len
      else { bin += 1; filled = len }
      id -> bin
    }.toMap
  }

  test("packGreedy matches the sequential reference fill per shard") {
    val got = Packing.packGreedy(docs, "id", $"len", budget = 256L, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byShard = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy { case (id, _) => id % 4 }
    for ((shard, rows) <- byShard) {
      val want = referenceGreedy(rows.toSeq, 256L)
      for ((id, s, bin) <- got if s == shard)
        assert(bin == want(id), s"doc $id in shard $shard: bin $bin != ${want(id)}")
    }
  }

  test("packGreedy: bins respect the budget except single oversized docs") {
    val got = Packing.packGreedy(docs, "id", $"len", budget = 256L, shards = 4)
      .join(docs, docs("id") === col("doc_id"))
      .groupBy($"shard", $"bin")
      .agg(sum($"len").as("fill"), count(lit(1)).as("n"))
      .collect()
    for (r <- got) {
      val fill = r.getLong(2); val n = r.getLong(3)
      assert(fill <= 256L || n == 1L, s"overfull shared bin: $r")
    }
  }

  test("packGreedy is stable under input repartitioning") {
    val a = Packing.packGreedy(docs, "id", $"len", 256L, 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    val b = Packing.packGreedy(docs.repartition(7), "id", $"len", 256L, 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(a == b)
  }

  test("chunkSpans: offsets bounded, spans ordered, tokens conserved") {
    val got = Packing.chunkSpans(docs, "id", $"len", budget = 100L, shards = 2)
      .join(docs, docs("id") === col("doc_id")).collect()
    for (r <- got) {
      val start = r.getLong(r.fieldIndex("start_chunk"))
      val end = r.getLong(r.fieldIndex("end_chunk"))
      val off = r.getLong(r.fieldIndex("chunk_offset"))
      val len = r.getLong(r.fieldIndex("len"))
      assert(off >= 0 && off < 100)
      assert(end >= start)
      // a doc's last token lands where its start offset + length says
      if (len > 0) assert(end == start + (off + len - 1) / 100)
    }
    // per shard: the last chunk touched is where token (total-1) lands
    val totals = docs.groupBy(($"id" % 2).as("shard")).agg(sum($"len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxEnd = got.groupBy(_.getLong(1)).map { case (s, rs) =>
      s -> rs.map(r => r.getLong(r.fieldIndex("end_chunk"))).max
    }
    for ((s, total) <- totals)
      assert(maxEnd(s) == (total - 1) / 100, s"shard $s: $maxEnd vs $total")
  }

  test("decontam report matches brute-force n-gram intersection") {
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "x y z w v"),
      (3L, "c d e q r"),
      (4L, "one two")  // shorter than n=3: no grams
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "b c d e z z")).toDF("doc_id", "text")
    val got = Decontam.report(corpus, "doc_id", "text", bench, "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // bench grams: {b c d, c d e, d e z, e z z}
    // doc 1 grams: {a b c, b c d, c d e, d e f} → hits {b c d, c d e} = 2
    // doc 3 grams: {c d e, d e q, e q r}       → hits {c d e} = 1
    assert(got == Map(1L -> 2L, 3L -> 1L))
  }

  test("decontam clean drops exactly the reported docs") {
    val corpus = Seq(
      (1L, "a b c d e f"), (2L, "x y z w v"), (3L, "c d e q r")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "b c d e z z")).toDF("doc_id", "text")
    val kept = Decontam.clean(corpus, "doc_id", "text", bench, "text", 3)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  // independent restatement of Text.tokenCodeSql / MinHashes.tokenCode
  private def refTokenCode(w: String): Long = {
    val cps = w.codePoints().toArray
    val first3 = cps.take(3).zip(Seq(1L, 31L, 961L)).map { case (c, m) => c * m }
    first3.sum + 29791L * cps.length
  }

  test("ngramHashes mirrors the string-gram structure, gram by gram") {
    import graft.functions.NgramHashExpr
    val tricky = Seq(
      "a b c d e f", "a  b", " leading", "trailing ", "", "one two",
      "héllo wörld ☃ snow man here", "a b c a b c a b c")
    val df = tricky.toDF("text")
    for (n <- Seq(1, 2, 3, 5)) {
      val hashed = df.select(
        NgramHashExpr.ngramHashes($"text", n).as("h"))
        .collect().map(_.getSeq[Long](0))
      val strings = df.select(
        graft.operators.Decontam.ngrams($"text", n).as("g"))
        .collect().map(_.getSeq[String](0))
      // same gram count per doc
      assert(hashed.map(_.length).toSeq == strings.map(_.length).toSeq)
      // equality structure matches across ALL docs (no collisions on
      // this set): hash(i)==hash(j) iff gram(i)==gram(j)
      val pairs = hashed.flatten.toSeq.zip(strings.flatten.toSeq)
      assert(pairs.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 1))
      assert(pairs.groupBy(_._2).forall(_._2.map(_._1).distinct.length == 1))
      // and each hash is the XOR-of-keyed-token-codes reference
      val want = strings.flatten.map { g =>
        val toks = g.split(" ", -1)
        toks.indices.map(j => refTokenCode(toks(j)) *
          graft.functions.NgramHashes.keys(j)).reduce(_ ^ _)
      }
      assert(hashed.flatten.toSeq == want.toSeq)
    }
  }

  test("ngrams guards the short-doc descending-sequence trap") {
    val got = Seq("a b", "", "a b c").toDF("text")
      .select(Decontam.ngrams($"text", 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq.empty)
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("a b c"))
  }
}
