package graft

import org.apache.spark.sql.functions._
import graft.operators.NgramLm

/** The t33 bigram-LM quality filter: surprisal arithmetic bounds, a
  * hand-computed model on a toy corpus, edge cases, and the CCNet
  * in-domain separation on the real documents table. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("surprisal64 is the 1/64-step interpolated log2: exact at powers " +
      "of two, within 0.09 bits below log2 elsewhere, monotone") {
    val qs = (1L to 4096L) ++ Seq(65535L, 65536L, 65537L, 1L << 40)
    val got = qs.toDF("q")
      .select($"q", NgramLm.surprisal64($"q").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var prev = -1L
    for (q <- qs.sorted) {
      val s = got(q)
      val exact = math.log(q.toDouble) / math.log(2.0)
      // linear mantissa interpolation UNDERestimates log2(1+f) by at
      // most 1−(1+ln ln 2)/ln 2 ≈ 0.0861, plus the 1/64 floor step
      assert(s / 64.0 <= exact + 1e-9, s"q=$q s=$s over log2=$exact")
      assert(s / 64.0 >= exact - 0.0861 - 1.0 / 64 - 1e-9,
        s"q=$q s=$s too far under log2=$exact")
      if ((q & (q - 1)) == 0) // power of two: exactly 64·log2
        assert(s == 64L * java.lang.Long.numberOfTrailingZeros(q), s"q=$q")
      assert(s >= prev, s"not monotone at q=$q")
      prev = s
    }
  }

  test("surprisal64Long (the one driver-side scalar home of the " +
      "formula) is bit-equal to the Column form over a dense + " +
      "boundary range") {
    val qs = (1L to 2048L) ++
      Seq(65535L, 65536L, 65537L, 1L << 40, (1L << 57) - 1)
    val col = qs.toDF("q")
      .select($"q", NgramLm.surprisal64($"q").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (q <- qs)
      assert(NgramLm.surprisal64Long(q) == col(q), s"drift at q=$q")
    intercept[IllegalArgumentException](NgramLm.surprisal64Long(0L))
  }

  test("fitKn fails fast on a model whose counts overflow the integer " +
      "surprisal chain (the 2^57 shift bound), with the shard-the-" +
      "model message") {
    val lm = NgramLm.fit(Seq("a b a b").toDF("text"), "text")
    // a synthetic over-bound bigram table: one count near 2^56 pushes
    // (2*c_max + V')*(C+V') far past 2^57
    val big = lm.copy(bigrams =
      Seq(("a", "b", 1L << 56)).toDF("m1", "m2", "cbi"))
    val e = intercept[IllegalArgumentException](NgramLm.fitKn(big))
    assert(e.getMessage.contains("shard the model"), e.getMessage)
    // the real model is far under the bound and fits fine
    NgramLm.fitKn(lm)
  }

  test("fitKn bound uses the RUNTIME prefix sum, not the per-bigram " +
      "max: a high-branching prefix whose individual counts would " +
      "pass a max(cbi)-based bound still fails fast (scoreKn's q2 = " +
      "2*cpre*cv is the actual surprisal operand)") {
    val lm = NgramLm.fit(Seq("a b a b").toDF("text"), "text")
    // 8 continuations of one prefix, each 2^52: max(cbi) = 2^52 keeps
    // the OLD bound (2*c_max + V')*(C+V') ≈ 2^53·11 UNDER 2^57, but
    // cpre = 2^55 makes the real operand 2*cpre*cv ≈ 2^59.5 — overflow
    val rows = (0 until 8).map(i => ("a", s"t$i", 1L << 52))
    val big = lm.copy(bigrams = rows.toDF("m1", "m2", "cbi"))
    val cv = 8L + lm.vPrime // cTypes + V'
    assert((2L * (1L << 52) + lm.vPrime) <= (1L << 57) / cv,
      "fixture must sit under the old per-gram bound to prove the point")
    val e = intercept[IllegalArgumentException](NgramLm.fitKn(big))
    assert(e.getMessage.contains("shard the model"), e.getMessage)
  }

  test("fit on a toy corpus: hand-computed vocab, bigram and prefix " +
      "counts, with the OOV class folding under the vocab cap") {
    val train = Seq("a b a b c", "a b x").toDF("text")
    // cap the vocab at 3: counts a=3 b=3 c=1 x=1 → vocab {a,b,c}
    // (count DESC, tok ASC); x maps to UNK
    val lm = NgramLm.fit(train, "text", maxVocab = 3)
    assert(lm.vPrime == 4L)
    assert(lm.vocab.orderBy($"tok").as[String].collect().toSeq ==
      Seq("a", "b", "c"))
    val bi = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs: (a,b)x2 (b,a) (b,c) from doc1; (a,b) (b,UNK) from doc2
    assert(bi == Map(("a", "b") -> 3L, ("b", "a") -> 1L,
      ("b", "c") -> 1L, ("b", NgramLm.Unk) -> 1L))
    val pre = lm.prefix.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pre == Map("a" -> 3L, "b" -> 3L))
  }

  test("score: seen bigrams cost less than unseen; short docs survive " +
      "with n_big 0 and keep 0; the keep gate is the integer rational") {
    val train = Seq("a b a b a b").toDF("text")
    val lm = NgramLm.fit(train, "text", maxVocab = 10)
    val docs = Seq((1L, "a b a b"), (2L, "z z z z"), (3L, "a"))
      .toDF("doc_id", "text")
    val r = NgramLm.score(docs, "doc_id", "text", lm, 2L, 1L)
      .orderBy($"doc_id").collect()
    val inDom = r(0)
    val offDom = r(1)
    val short = r(2)
    assert(inDom.getLong(2) == 3L) // n_big of "a b a b"
    assert(inDom.getLong(3) < offDom.getLong(3),
      "in-domain doc must accumulate fewer surprisal steps")
    assert(short.getLong(2) == 0L && short.isNullAt(4) &&
      short.getLong(5) == 0L)
    // keep = 1 iff s64·den ≤ num·64·n_big  (bpt ≤ 2 bits here)
    assert(inDom.getLong(5) ==
      (if (inDom.getLong(3) * 1L <= 2L * 64L * inDom.getLong(2)) 1L
       else 0L))
  }

  test("a persisted model scores bit-identically to the in-memory fit " +
      "(the fit-once/score-anywhere production split)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lm = NgramLm.fit(docs.filter($"lang" === "en"), "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    NgramLm.saveModel(lm, dir)
    val lm2 = NgramLm.loadModel(spark, dir)
    assert(lm2.vPrime == lm.vPrime && lm2.hinted == lm.hinted)
    def run(m: NgramLm.BigramLm) =
      NgramLm.score(docs, "doc_id", "text", m, 24L, 5L)
        .orderBy($"doc_id").collect().toSeq
    assert(run(lm2) == run(lm))
    intercept[IllegalArgumentException](
      NgramLm.loadModel(spark, dir + "/nope"))
  }

  test("Kneser-Ney is an EXACTLY proper distribution: for every seen " +
      "prefix the integer numerators sum to the denominator (the " +
      "scaladoc's Σp = 1 claim, checked in exact arithmetic)") {
    val train = Seq("a b a c a b d e", "b a a c e b").toDF("text")
    val lm = NgramLm.fit(train, "text", maxVocab = 4) // forces UNK
    val kn = NgramLm.fitKn(lm)
    val cv = kn.cTypes + kn.vPrime
    val bi = kn.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pre = kn.prefix2.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bplus = kn.cont.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabAll = lm.vocab.as[String].collect().toSeq :+ NgramLm.Unk
    assert(vocabAll.length.toLong == kn.vPrime)
    for ((m1, (cpre, n1)) <- pre) {
      val total = vocabAll.map { w2 =>
        val c12 = bi.getOrElse((m1, w2), 0L)
        math.max(2 * c12 - 1, 0L) * cv + n1 * (bplus.getOrElse(w2, 0L) + 1)
      }.sum
      assert(total == 2 * cpre * cv, s"prefix $m1 mass $total")
    }
  }

  test("t39 on the documents table: the KN model separates the " +
      "training domain like the add-one model (en keeps the largest " +
      "fraction), and the two models agree on the bulk of decisions") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lm = NgramLm.fit(docs.filter($"lang" === "en"), "text")
    val kn = NgramLm.fitKn(lm)
    val scored = NgramLm.scoreKn(docs, "doc_id", "text", kn, 24L, 5L)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val kept = scored.groupBy($"lang")
      .agg(avg($"keep".cast("double")).as("frac"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = kept.filter(_._1 != "en").values
    assert(others.nonEmpty && kept("en") > others.max, kept.toString)
    val a1 = NgramLm.score(docs, "doc_id", "text", lm, 24L, 5L)
      .select($"doc_id", $"keep".as("k1"))
    val agree = scored.select($"doc_id", $"keep".as("k2"))
      .join(a1, "doc_id")
      .agg(avg(when($"k1" === $"k2", 1.0).otherwise(0.0)))
      .collect().head.getDouble(0)
    assert(agree > 0.6, s"KN and add-one keep decisions agree on $agree")
  }

  test("trigram Kneser-Ney is an EXACTLY proper distribution at order " +
      "3: for every seen (w1,w2) context the integer numerators " +
      "D3(w3) sum to 2*c12*Q2 (trigram discount mass routes through " +
      "the PROPER bigram-KN distribution)") {
    val train = Seq("a b a c a b d e a b a", "b a a c e b a b")
      .toDF("text")
    val lm = NgramLm.fit(train, "text", maxVocab = 4) // forces UNK
    val m = NgramLm.fitKn3(train, "text", lm)
    val cv = m.kn.cTypes + m.kn.vPrime
    val tri = m.trigrams.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    val pre12 = m.prefix12.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val bi = m.kn.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pre = m.kn.prefix2.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bplus = m.kn.cont.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabAll = lm.vocab.as[String].collect().toSeq :+ NgramLm.Unk
    def q2(w2: String): Long = pre.get(w2) match {
      case Some((cpre, _)) => 2 * cpre * cv
      case None => cv
    }
    def p2(w2: String, w3: String): Long = pre.get(w2) match {
      case Some((_, n1)) =>
        math.max(2 * bi.getOrElse((w2, w3), 0L) - 1, 0L) * cv +
          n1 * (bplus.getOrElse(w3, 0L) + 1)
      case None => bplus.getOrElse(w3, 0L) + 1
    }
    assert(pre12.nonEmpty)
    for (((w1, w2), (c12, n12)) <- pre12) {
      val total = vocabAll.map { w3 =>
        math.max(2 * tri.getOrElse((w1, w2, w3), 0L) - 1, 0L) * q2(w2) +
          n12 * p2(w2, w3)
      }.sum
      assert(total == 2 * c12 * q2(w2), s"context ($w1,$w2) mass $total")
    }
  }

  test("t40 on the documents table: the trigram-KN model separates the " +
      "training domain (en keeps the largest fraction) with a " +
      "separation margin at least as wide as bigram KN's (more " +
      "context = sharper in-domain discrimination)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lm = NgramLm.fit(docs.filter($"lang" === "en"), "text")
    def fracs(scored: org.apache.spark.sql.DataFrame) = scored
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(avg($"keep".cast("double")).as("frac"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val m3 = NgramLm.fitKn3(docs.filter($"lang" === "en"), "text", lm)
    val kept3 = fracs(NgramLm.scoreKn3(docs, "doc_id", "text", m3, 24L, 5L))
    val others3 = kept3.filter(_._1 != "en").values
    assert(others3.nonEmpty && kept3("en") > others3.max, kept3.toString)
    val kn2 = NgramLm.fitKn(lm)
    val kept2 = fracs(NgramLm.scoreKn(docs, "doc_id", "text", kn2, 24L, 5L))
    val margin2 = kept2("en") - kept2.filter(_._1 != "en").values.max
    val margin3 = kept3("en") - others3.max
    assert(margin3 >= margin2,
      s"trigram separation margin $margin3 (kept3=$kept3) below " +
        s"bigram's $margin2 (kept2=$kept2)")
  }

  test("4-gram Kneser-Ney is an EXACTLY proper distribution at order " +
      "4: for every seen (w1,w2,w3) context the integer numerators " +
      "D4(w4) sum to 2*c123p*Q3 (the discount mass routes through the " +
      "proper trigram-KN distribution)") {
    val train = Seq("a b a c a b d e a b a c", "b a a c e b a b a c a")
      .toDF("text")
    val lm = NgramLm.fit(train, "text", maxVocab = 4) // forces UNK
    val m = NgramLm.fitKn4(train, "text", lm)
    val cv = m.kn3.kn.cTypes + m.kn3.kn.vPrime
    val qua = m.quads.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)) -> r.getLong(4)).toMap
    val pre123 = m.prefix123.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val tri = m.kn3.trigrams.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    val pre12 = m.kn3.prefix12.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val bi = m.kn3.kn.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pre = m.kn3.kn.prefix2.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bplus = m.kn3.kn.cont.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabAll = lm.vocab.as[String].collect().toSeq :+ NgramLm.Unk
    def q2(w: String): Long = pre.get(w) match {
      case Some((cpre, _)) => 2 * cpre * cv
      case None => cv
    }
    def p2(w3: String, w4: String): Long = pre.get(w3) match {
      case Some((_, n1)) =>
        math.max(2 * bi.getOrElse((w3, w4), 0L) - 1, 0L) * cv +
          n1 * (bplus.getOrElse(w4, 0L) + 1)
      case None => bplus.getOrElse(w4, 0L) + 1
    }
    def q3(w2: String, w3: String): Long = pre12.get((w2, w3)) match {
      case Some((c12, _)) => 2 * c12 * q2(w3)
      case None => q2(w3)
    }
    def p3(w2: String, w3: String, w4: String): Long =
      pre12.get((w2, w3)) match {
        case Some((_, n12)) =>
          math.max(2 * tri.getOrElse((w2, w3, w4), 0L) - 1, 0L) * q2(w3) +
            n12 * p2(w3, w4)
        case None => p2(w3, w4)
      }
    assert(pre123.nonEmpty)
    for (((w1, w2, w3), (c123p, n123)) <- pre123) {
      val total = BigInt(0) + vocabAll.map { w4 =>
        BigInt(math.max(2 * qua.getOrElse((w1, w2, w3, w4), 0L) - 1, 0L)) *
          q3(w2, w3) + BigInt(n123) * p3(w2, w3, w4)
      }.sum
      assert(total == BigInt(2) * c123p * q3(w2, w3),
        s"context ($w1,$w2,$w3) mass $total")
    }
  }

  test("5-gram Kneser-Ney is an EXACTLY proper distribution at order " +
      "5: for every seen (w1..w4) context the integer numerators " +
      "D5(w5) sum to 2*c1234p*Q4 (the discount mass routes through " +
      "the proper 4-gram-KN distribution)") {
    val train = Seq("a b a c a b d e a b a c", "b a a c e b a b a c a")
      .toDF("text")
    val lm = NgramLm.fit(train, "text", maxVocab = 4) // forces UNK
    val m = NgramLm.fitKn5(train, "text", lm)
    val kn3 = m.kn4.kn3
    val cv = kn3.kn.cTypes + kn3.kn.vPrime
    val qui = m.quints.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)) -> r.getLong(5)).toMap
    val pre1234 = m.prefix1234.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)) -> (r.getLong(4), r.getLong(5))).toMap
    val qua = m.kn4.quads.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)) -> r.getLong(4)).toMap
    val pre123 = m.kn4.prefix123.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val tri = kn3.trigrams.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    val pre12 = kn3.prefix12.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val bi = kn3.kn.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val pre = kn3.kn.prefix2.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bplus = kn3.kn.cont.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabAll = lm.vocab.as[String].collect().toSeq :+ NgramLm.Unk
    def q2(w: String): BigInt = pre.get(w) match {
      case Some((cpre, _)) => BigInt(2) * cpre * cv
      case None => BigInt(cv)
    }
    def p2(w4: String, w5: String): BigInt = pre.get(w4) match {
      case Some((_, n1)) =>
        BigInt(math.max(2 * bi.getOrElse((w4, w5), 0L) - 1, 0L)) * cv +
          BigInt(n1) * (bplus.getOrElse(w5, 0L) + 1)
      case None => BigInt(bplus.getOrElse(w5, 0L) + 1)
    }
    def q3(w3: String, w4: String): BigInt = pre12.get((w3, w4)) match {
      case Some((c12, _)) => BigInt(2) * c12 * q2(w4)
      case None => q2(w4)
    }
    def p3(w3: String, w4: String, w5: String): BigInt =
      pre12.get((w3, w4)) match {
        case Some((_, n12)) =>
          BigInt(math.max(2 * tri.getOrElse((w3, w4, w5), 0L) - 1, 0L)) *
            q2(w4) + BigInt(n12) * p2(w4, w5)
        case None => p2(w4, w5)
      }
    def q4(w2: String, w3: String, w4: String): BigInt =
      pre123.get((w2, w3, w4)) match {
        case Some((c123p, _)) => BigInt(2) * c123p * q3(w3, w4)
        case None => q3(w3, w4)
      }
    def p4(w2: String, w3: String, w4: String, w5: String): BigInt =
      pre123.get((w2, w3, w4)) match {
        case Some((_, n123)) =>
          BigInt(math.max(2 * qua.getOrElse((w2, w3, w4, w5), 0L) - 1,
            0L)) * q3(w3, w4) + BigInt(n123) * p3(w3, w4, w5)
        case None => p3(w3, w4, w5)
      }
    assert(pre1234.nonEmpty)
    for (((w1, w2, w3, w4), (c1234p, n1234)) <- pre1234) {
      val total = vocabAll.map { w5 =>
        BigInt(math.max(
          2 * qui.getOrElse((w1, w2, w3, w4, w5), 0L) - 1, 0L)) *
          q4(w2, w3, w4) + BigInt(n1234) * p4(w2, w3, w4, w5)
      }.sum
      assert(total == BigInt(2) * c1234p * q4(w2, w3, w4),
        s"context ($w1,$w2,$w3,$w4) mass $total")
    }
  }

  test("t67: the 5-gram-KN model separates the training domain with a " +
      "margin at least as wide as 4-gram KN's") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lm = NgramLm.fit(docs.filter($"lang" === "en"), "text")
    def fracs(scored: org.apache.spark.sql.DataFrame) = scored
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(avg($"keep".cast("double")).as("frac"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val m4 = NgramLm.fitKn4(docs.filter($"lang" === "en"), "text", lm)
    val kept4 = fracs(NgramLm.scoreKn4(docs, "doc_id", "text", m4, 24L, 5L))
    val m5 = NgramLm.fitKn5(docs.filter($"lang" === "en"), "text", lm)
    val kept5 = fracs(NgramLm.scoreKn5(docs, "doc_id", "text", m5, 24L, 5L))
    val others5 = kept5.filter(_._1 != "en").values
    assert(others5.nonEmpty && kept5("en") > others5.max, kept5.toString)
    val margin4 = kept4("en") - kept4.filter(_._1 != "en").values.max
    val margin5 = kept5("en") - others5.max
    assert(margin5 >= margin4,
      s"5-gram separation margin $margin5 (kept5=$kept5) below " +
        s"4-gram's $margin4 (kept4=$kept4)")
  }

  test("t58: the 4-gram-KN model separates the training domain with a " +
      "margin at least as wide as trigram KN's") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lm = NgramLm.fit(docs.filter($"lang" === "en"), "text")
    def fracs(scored: org.apache.spark.sql.DataFrame) = scored
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(avg($"keep".cast("double")).as("frac"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val m3 = NgramLm.fitKn3(docs.filter($"lang" === "en"), "text", lm)
    val kept3 = fracs(NgramLm.scoreKn3(docs, "doc_id", "text", m3, 24L, 5L))
    val m4 = NgramLm.fitKn4(docs.filter($"lang" === "en"), "text", lm)
    val kept4 = fracs(NgramLm.scoreKn4(docs, "doc_id", "text", m4, 24L, 5L))
    val others4 = kept4.filter(_._1 != "en").values
    assert(others4.nonEmpty && kept4("en") > others4.max, kept4.toString)
    val margin3 = kept3("en") - kept3.filter(_._1 != "en").values.max
    val margin4 = kept4("en") - others4.max
    assert(margin4 >= margin3,
      s"4-gram separation margin $margin4 (kept4=$kept4) below " +
        s"trigram's $margin3 (kept3=$kept3)")
  }

  test("hash-space scoring equals the exact path bit-for-bit on a " +
      "collision-free corpus with an untruncated vocab cap (the " +
      "documented aliasing is the ONLY divergence)") {
    // tokens distinct in (first 3 code points, length) → injective
    // tokenCode → no aliasing; maxVocab 100 → no cap tie-breaks
    val train = Seq("alpha beta alpha beta gamma", "alpha beta zeta")
      .toDF("text")
    val docs = Seq((1L, "alpha beta alpha"), (2L, "omega omega kappa"),
      (3L, "alpha"), (4L, "")).toDF("doc_id", "text")
    val ex = NgramLm.fit(train, "text", maxVocab = 100)
    val hs = NgramLm.fitHashed(train, "text", maxVocab = 100)
    assert(hs.vPrime == ex.vPrime)
    val a = NgramLm.score(docs, "doc_id", "text", ex, 24L, 5L)
      .orderBy($"doc_id").collect().toSeq
    val b = NgramLm.scoreHashed(docs, "doc_id", "text", hs, 24L, 5L)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b, s"hash-space drift:\n exact=$a\n hashed=$b")
    // and the documented aliasing: same 3-prefix + length collide
    val cTrain = Seq("apple apple apply").toDF("text")
    val cLm = NgramLm.fitHashed(cTrain, "text", maxVocab = 100)
    // "apple" and "apply" share tokenCode → ONE unigram hash row
    assert(cLm.vPrime == 2L,
      "tokenCode aliasing must fold apple/apply into one vocab row")
    // the folded one-pass plan equals the join paths bit-for-bit:
    // forceJoins = broadcast-join route, hinted=false = shuffle-join
    // route (the above-the-gate shapes)
    assert(hs.foldModel.isDefined, "default model must license the fold")
    val joinPath = NgramLm
      .scoreHashed(docs, "doc_id", "text", hs, 24L, 5L,
        forceJoins = true)
      .orderBy($"doc_id").collect().toSeq
    assert(joinPath == b, "fold path diverged from the broadcast joins")
    val shufflePath = NgramLm
      .scoreHashed(docs, "doc_id", "text", hs.copy(hinted = false),
        24L, 5L)
      .orderBy($"doc_id").collect().toSeq
    assert(shufflePath == b, "fold path diverged from the shuffle joins")
  }

  test("t33 on the documents table: the en-trained model separates the " +
      "training domain (en keeps a strictly larger fraction than any " +
      "other lang)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lm = NgramLm.fit(docs.filter($"lang" === "en"), "text")
    val kept = NgramLm.score(docs, "doc_id", "text", lm, 24L, 5L)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(avg($"keep".cast("double")).as("frac"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = kept.filter(_._1 != "en").values
    assert(others.nonEmpty && kept("en") > others.max,
      s"expected en to dominate keeps: $kept")
  }
}
