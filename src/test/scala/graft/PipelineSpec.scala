package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.{Dedup, Similarity}

/** Training-data pipeline operators: dedup, similarity, text analysis. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 0
    (2L, "the  quick brown fox jumps over the lazy dog"), // ws-variant of 0
    (3L, "completely different text about spark engines"),
    (4L, "another unrelated document mentioning databases")
  ).toDF("doc_id", "text")

  test("exact dedup: whitespace-normalized variants collapse") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .orderBy($"keep_id").collect()
    assert(got.length == 4) // 0 and 2 collapse
    assert(got.head.getLong(got.head.fieldIndex("keep_id")) == 0L)
    assert(got.head.getLong(got.head.fieldIndex("n_dups")) == 2L)
  }

  test("minhash-lsh finds the planted near-duplicate pair") {
    // 8 bands × 2 rows: catch probability 1-(1-j²)⁸ ≈ 0.9997 at j=7/9
    val cands = Dedup.lshCandidatePairs(docs, "doc_id", "text", 16, 8)
    val verified = Dedup.jaccardVerify(cands, docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.contains((0L, 1L)), s"missing planted pair, got $verified")
    assert(!verified.exists(p => p._2 == 3L || p._2 == 4L && p._1 == 3L))
  }

  test("persisted LSH index: build+append == one-shot rebuild, probe " +
      "matches the in-memory bucket join, missing index fails fast") {
    val base = java.nio.file.Files.createTempDirectory("lshidx").toString
    val all = Tables.load(spark, sf, "documents")
    val old = all.filter($"doc_id" % 4 < 2)
    val mid = all.filter($"doc_id" % 4 === 2)
    val neu = all.filter($"doc_id" % 4 === 3)
    Dedup.buildLshIndex(old, "doc_id", "text", 16, 2, s"$base/inc")
    Dedup.appendToLshIndex(mid, "doc_id", "text", s"$base/inc")
    Dedup.buildLshIndex(all.filter($"doc_id" % 4 < 3), "doc_id", "text",
      16, 2, s"$base/full")
    def pairs(p: String) = Dedup.probeLshIndex(neu, "doc_id", "text", p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = pairs(s"$base/inc")
    assert(inc == pairs(s"$base/full"), "incremental != rebuilt index")
    // the stored-signature join equals the in-memory bucket join
    val idxRows = Dedup.bucketRows(all.filter($"doc_id" % 4 < 3),
      "doc_id", "text", 16, 2)
      .select($"band", $"bucket", $"id".as("id_idx"))
    val newRows = Dedup.bucketRows(neu, "doc_id", "text", 16, 2)
      .select($"band", $"bucket", $"id".as("id_new"))
    val want = idxRows.join(newRows, Seq("band", "bucket"))
      .select($"id_idx", $"id_new").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == want && want.nonEmpty)
    intercept[IllegalArgumentException] {
      Dedup.probeLshIndex(neu, "doc_id", "text", s"$base/nope")
    }
  }

  test("prototype scoring: exactMean is layout-independent and exact; " +
      "anchor rows separate from the rest; keep == unrounded gate") {
    val emb = Tables.load(spark, sf, "embeddings")
    val anchor = emb.filter($"label" === 0)
    val m1 = Similarity.exactMean(anchor.repartition(7), "embedding")
    val m7 = Similarity.exactMean(anchor.coalesce(1), "embedding")
    assert(m1.map(java.lang.Double.doubleToLongBits) ==
      m7.map(java.lang.Double.doubleToLongBits), "layout changed the mean")
    // equals the straightforward exact-decimal mean of the collected rows
    val rows = anchor.select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0))
    val want = (0 until rows.head.length).map { i =>
      rows.map(r => java.math.BigDecimal.valueOf(r(i))
        .setScale(18, java.math.RoundingMode.HALF_UP))
        .reduce(_ add _).doubleValue() / rows.length
    }
    assert(m1 == want)
    val scored = Similarity.prototypeScore(emb, "vec_id", "embedding",
      m1, threshold = 0.2)
      .join(emb.select($"vec_id".as("id"), $"label"), "id")
      .collect()
    val (in, out) = scored.partition(_.getAs[Int]("label") == 0)
    def avg(xs: Array[Double]) = xs.sum / xs.length
    assert(avg(in.map(_.getAs[Double]("score"))) >
      avg(out.map(_.getAs[Double]("score"))) + 0.1,
      "anchor set does not separate from the rest")
    scored.foreach { r =>
      assert(r.getAs[Int]("keep") ==
        (if (r.getAs[Double]("score") >= 0.2) 1 else 0) ||
        // rounding can pull a just-above-τ score to the boundary; the
        // gate uses the unrounded value, so only scores that ROUND to
        // exactly 0.2 may disagree with the rounded reading
        math.abs(r.getAs[Double]("score") - 0.2) < 5e-7)
    }
  }

  test("ivfKnnJoin: probing ALL cells equals the exact knnJoin " +
      "bit-for-bit; at nProbe=2 average recall >= 0.75") {
    val emb = Tables.load(spark, sf, "embeddings")
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding", 4, 3)
    val qids = (0L until 8L).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"qid", $"rk").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exact = rows(Similarity.knnJoin(emb, "vec_id", "embedding", qids, 5))
    val full = rows(Similarity.ivfKnnJoin(emb, "vec_id", "embedding",
      qids, 5, nProbe = 4, cents))
    assert(full.toSeq == exact.toSeq, "full probe must equal exact knn")
    val approx = rows(Similarity.ivfKnnJoin(emb, "vec_id", "embedding",
      qids, 5, nProbe = 2, cents))
    val recall = qids.map { q =>
      val e = exact.filter(_._1 == q).map(_._3).toSet
      val a = approx.filter(_._1 == q).map(_._3).toSet
      (e intersect a).size.toDouble / e.size
    }.sum / qids.size
    assert(recall >= 0.75, s"recall $recall")
  }

  test("radiusJoin: equals the tau-filtered exact score table; " +
      "ivfRadiusJoin probing ALL cells equals it bit-for-bit; a probed " +
      "subset is a subset") {
    val emb = Tables.load(spark, sf, "embeddings")
    val qids = (0L until 8L).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"qid", $"id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val tau = 0.2
    val exact = rows(Similarity.radiusJoin(emb, "vec_id", "embedding",
      qids, tau))
    assert(exact.nonEmpty, "fixture must keep something at tau")
    assert(exact.forall(_._3 >= tau))
    // independent replica: huge-k knn (= the full score table) gated
    val viaKnn = Similarity.knnJoin(emb, "vec_id", "embedding", qids,
        k = Int.MaxValue)
      .filter($"score" >= tau)
      .orderBy($"qid", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(exact == viaKnn, "radius must equal the gated full score table")
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding", 4, 3)
    val full = rows(Similarity.ivfRadiusJoin(emb, "vec_id", "embedding",
      qids, tau, nProbe = 4, cents))
    assert(full == exact, "full probe must equal exact radius join")
    val pruned = rows(Similarity.ivfRadiusJoin(emb, "vec_id", "embedding",
      qids, tau, nProbe = 1, cents))
    assert(pruned.toSet.subsetOf(exact.toSet), "pruning may only drop")
  }

  test("dispersionCard: the ||sum v||^2 identity equals the brute-force " +
      "pairwise mean; identical vectors read mean_pair_dot == " +
      "mean_norm_sq; singleton labels drop") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", Seq(1.0, 0.0, 0.5)),
      (2L, "a", Seq(0.25, -1.0, 0.125)),
      (3L, "a", Seq(-0.5, 0.75, 2.0)),
      (4L, "b", Seq(0.5, 0.5, 0.5)),
      (5L, "b", Seq(0.5, 0.5, 0.5)),
      (6L, "c", Seq(9.0, 9.0, 9.0))) // singleton → dropped
    val df = rows.toDF("id", "label", "v")
    val out = operators.Similarity.dispersionCard(df, "v", "label")
      .orderBy($"label").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b"))
    // brute-force replica over the quantized integers
    def card(vs: Seq[Seq[Double]]): (Double, Double) = {
      val q = vs.map(_.map(x => math.floor(x * 1e6 + 0.5).toLong))
      val n = q.size
      val pair = (for {
        i <- q.indices; j <- q.indices if i != j
      } yield q(i).zip(q(j)).map { case (a, b) => BigInt(a) * b }.sum).sum
      val self = q.map(v => v.map(x => BigInt(x) * x).sum).sum
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      (r6(pair.toDouble / (n.toLong * (n - 1)) / 1e12),
        r6(self.toDouble / n / 1e12))
    }
    val (pa, na) = card(rows.filter(_._2 == "a").map(_._3))
    assert(out(0).getDouble(2) === pa && out(0).getDouble(3) === na)
    val b = out(1)
    assert(b.getDouble(2) === b.getDouble(3),
      "identical vectors: pairwise mean == norm mean (zero dispersion)")
  }

  test("cellBalanceCard: census matches assignCells counts, EMPTY cells " +
      "appear with n=0, the cross-multiplied skew flag fires on a " +
      "planted bloated cell") {
    val emb = Tables.load(spark, sf, "embeddings")
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding", 4, 3)
    val card = Similarity.cellBalanceCard(emb, "vec_id", "embedding",
      cents, skewNum = 3L, skewDen = 2L).orderBy($"cell").collect()
    assert(card.map(_.getInt(0)).toSeq === cents.map(_._1).toSeq.sorted)
    val total = card.map(_.getLong(1)).sum
    assert(total === emb.count())
    card.foreach { r =>
      val exp = if (r.getLong(1) * cents.length * 2L > 3L * total) 1 else 0
      assert(r.getInt(2) === exp, s"cell ${r.getInt(0)}")
    }
    // planted skew: every vector in one tight cluster + two far
    // centroids → one bloated flagged cell, the others EMPTY rows
    import spark.implicits._
    val one = (0L until 20L).map(i =>
      (i, Seq.fill(4)(1.0).updated(3, 1.0 + i * 1e-6))).toDF("id", "v")
    val farCents: Array[(Int, Seq[Double])] = Array(
      (0, Seq(1.0, 1.0, 1.0, 1.0)),
      (1, Seq(-1.0, 1.0, -1.0, 1.0)),
      (2, Seq(1.0, -1.0, 1.0, -1.0)))
    val c2 = Similarity.cellBalanceCard(one, "id", "v", farCents, 3L, 2L)
      .orderBy($"cell").collect()
    assert(c2.map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq ===
      Seq((0, 20L, 1), (1, 0L, 0), (2, 0L, 0)))
  }

  test("mmrRerank: lambda=1 equals bruteForceTopK bit-for-bit; the greedy " +
      "matches an independent replay over the collected rel/sim tables; " +
      "a planted near-duplicate is deferred at lambda=1/2") {
    val emb = Tables.load(spark, sf, "embeddings")
    // lambda = 1: no diversity term — selection order IS relevance order
    val pure = Similarity.mmrRerank(emb, "vec_id", "embedding",
      queryId = 0L, shortlist = 16, k = 6, lamNum = 5, lamDen = 5)
      .orderBy($"rank").collect()
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 6)
      .collect()
    assert(pure.map(_.getLong(1)).toSeq == brute.map(_.getLong(0)).toSeq,
      "lambda=1 must reduce to pure relevance ranking")
    // independent greedy replay from the SAME rounded rel/sim queries
    val got = Similarity.mmrRerank(emb, "vec_id", "embedding",
      queryId = 0L, shortlist = 16, k = 6, lamNum = 7, lamDen = 10)
      .orderBy($"rank").collect()
    val short = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 16)
      .collect()
    val ids = short.map(_.getLong(0))
    val rel = short.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val v = emb.select($"vec_id".as("id"),
      $"embedding".cast("array<double>").as("v"))
      .filter($"id".isin(ids.map(x => x: Any): _*))
    val sim = v.as("a").crossJoin(v.as("b")).filter($"a.id" =!= $"b.id")
      .select($"a.id".as("ia"), $"b.id".as("ib"),
        round(Similarity.cosine($"a.v", $"b.v"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    var chosen = Vector(ids.head) // rank 0 = argmax rel (shortlist head)
    while (chosen.size < 6) {
      val best = ids.filterNot(chosen.contains).map { c =>
        (7 * rel(c) - 3 * chosen.map(s => sim((c, s))).max, c)
      }.maxBy { case (m, id) => (m, -id) }
      chosen :+= best._2
    }
    assert(got.map(_.getLong(1)).toVector == chosen, "greedy ids diverge")
    assert(got.head.isNullAt(3) && got.drop(1).forall(!_.isNullAt(3)))
    // emitted mmr values match the formula on the collected tables
    got.drop(1).foreach { r =>
      val c = r.getLong(1)
      val before = chosen.takeWhile(_ != c)
      val expect = 7 * rel(c) - 3 * before.map(s => sim((c, s))).max
      assert(r.getDouble(3) == expect, s"mmr mismatch for $c")
    }
    // planted near-dup: rel top-2 nearly identical, diverse runner-up —
    // brute force keeps the dup at rank 1, MMR (lambda=1/2) defers it
    import spark.implicits._
    val planted = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),         // query
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),         // top rel
      (2L, Array(0.9f, 0.1001f, 0.0f, 0.0f)),      // its near-dup
      (3L, Array(0.5f, 0.0f, 0.5f, 0.0f)),         // diverse, decent rel
      (4L, Array(0.0f, 0.0f, 0.0f, 1.0f))          // orthogonal filler
    ).toDF("vec_id", "embedding")
    val bruteIds = Similarity.bruteForceTopK(planted, "vec_id", "embedding",
      0L, 3).collect().map(_.getLong(0)).toSeq
    assert(bruteIds.take(2).toSet == Set(1L, 2L), "fixture: dup must lead")
    val mmrIds = Similarity.mmrRerank(planted, "vec_id", "embedding",
      queryId = 0L, shortlist = 4, k = 3, lamNum = 1, lamDen = 2)
      .orderBy($"rank").collect().map(_.getLong(1)).toSeq
    // the near-dup (id 2) is pushed out of the top-3 entirely: even the
    // orthogonal filler's mmr (0 - 0) beats the dup's (rel - ~1)
    assert(mmrIds == Seq(1L, 3L, 4L),
      s"MMR must defer the near-dup: got $mmrIds")
  }

  test("jl projection matches a driver-side replay bit-for-bit; " +
      "projected top-k recall clears the floor vs full-space brute " +
      "force; null elements fail fast") {
    val emb = Tables.load(spark, sf, "embeddings")
    val dOut = 16
    val got = Similarity.jlProject(emb, "vec_id", "embedding", dOut)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // replay: the exact left-assoc ± chain per output dim
    val raw = emb.select($"vec_id",
      $"embedding".cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    raw.foreach { case (id, v) =>
      val expect = (0 until dOut).map { j =>
        var s = 0.0
        v.indices.foreach { i =>
          s += (if (graft.functions.JlProject.signPositive(i, j)) v(i)
                else -v(i))
        }
        s
      }
      assert(got(id) == expect, s"projection diverges for vec $id")
    }
    // recall@10 on a CLUSTERED corpus (in-cluster cos ≈ 1 vs cross ≈ 0
    // — gaps far above the ε ≈ √(ln n / d') distortion; the sf noise
    // embeddings have top-k gaps ≈ 0.03, under ε for ANY useful d',
    // so recall there is meaningless — the scaladoc's gap condition)
    import spark.implicits._
    def cvec(c: Int, i: Long): Seq[Double] = {
      val v = Array.fill(64)(0.0)
      (8 * c until 8 * c + 8).foreach(d => v(d) = 1.0)
      v((8 * c + (i % 8)).toInt) += 0.02 * (((i * 7) % 13) - 6) / 13.0
      v.toSeq
    }
    val clustered = (0L until 256L).map(i => (i, cvec((i % 8).toInt, i)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(clustered, "vec_id", "embedding",
      0L, 10).collect().map(_.getLong(0)).toSet
    val proj = Similarity.jlTopK(clustered, "vec_id", "embedding",
      0L, 10, dOut).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(proj).size.toDouble / exact.size
    assert(recall >= 0.9, s"jl recall@10 $recall below floor")
    val bad = Seq((1L, Seq[Option[Double]](Some(1.0), None)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.jlProject(bad, "vec_id", "embedding", 4).collect()
    }
    assert(e.getMessage.contains("null") ||
      Option(e.getCause).exists(_.getMessage.contains("null")))
  }

  test("split leakage: reported pairs = exactly the cross-split subset " +
      "of the near-dup pairs, with splits equal to splitAssign of the " +
      "ids; fixture is non-vacuous") {
    val docs = Tables.load(spark, sf, "documents")
    val all = Dedup.simhashNearDup64(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sb = Seq("train" -> 0.8, "val" -> 0.9)
    val splitOf = docs.select($"doc_id",
      operators.Sampling.splitAssign($"doc_id", sb, "test").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Queries.t55_split_leakage(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2), r.getString(3)))).toMap
    val expect = all.filter(p => splitOf(p._1) != splitOf(p._2))
    assert(got.keySet == expect, "cross-split pair set diverges")
    assert(expect.nonEmpty, "fixture must leak something")
    got.foreach { case ((a, b), (sa, sbv)) =>
      assert(sa == splitOf(a) && sbv == splitOf(b) && sa != sbv)
    }
  }

  test("k-center greedy matches a driver-side replay of the chain; the " +
      "coverage trace is non-decreasing; ids are distinct") {
    val emb = Tables.load(spark, sf, "embeddings")
    val got = Similarity.kCenterGreedy(emb, "vec_id", "embedding",
      k = 6, seedId = 0L).orderBy($"rank").collect()
    assert(got.length == 6 && got.map(_.getLong(1)).distinct.length == 6)
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    var chosen = Vector(0L)
    var fars = Vector(Option.empty[Double])
    while (chosen.size < 6) {
      val best = vecs.keysIterator.filterNot(chosen.contains)
        .map(id => (chosen.map(c => cos(vecs(c), vecs(id))).max, id))
        .minBy { case (mc, id) => (mc, id) }
      chosen :+= best._2; fars :+= Some(best._1)
    }
    assert(got.map(_.getLong(1)).toVector == chosen, "greedy ids diverge")
    got.zip(fars).foreach { case (r, f) =>
      assert(r.isNullAt(2) == f.isEmpty)
      f.foreach(mc => assert(math.abs(r.getDouble(2) - mc) < 5e-7))
    }
    val trace = got.drop(1).map(_.getDouble(2))
    assert(trace.zip(trace.drop(1)).forall { case (a, b) => b >= a },
      s"coverage trace must be non-decreasing: ${trace.mkString(",")}")
  }

  test("epoch mixing: budget covered with at-most-one-doc overshoot, " +
      "per-doc copies are full or full+1 with dense epoch ids, " +
      "layout-invariant, unbudgeted sources dropped") {
    import graft.operators.Sampling
    val all = Tables.load(spark, sf, "documents")
    val budgets = Map("src0" -> 800L, "src1" -> 50L, "src2" -> 0L)
    val mix = Sampling.epochMix(all, "doc_id", "source", "text", budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(mix.forall(m => budgets.contains(m._2)))
    val toks = all.select($"doc_id", $"source",
      size(split($"text", " ")).cast("long").as("n")).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    budgets.foreach { case (src, b) =>
      val srcToks = toks.collect { case (_, (s, n)) if s == src => n }
      val emitted = mix.filter(_._2 == src)
        .map(m => toks(m._1)._2).sum
      assert(emitted >= b && (srcToks.isEmpty ||
        emitted < b + srcToks.max),
        s"$src: emitted $emitted vs budget $b")
      val t = srcToks.sum
      if (t > 0) {
        val full = b / t
        mix.filter(_._2 == src).groupBy(_._1).foreach { case (_, copies) =>
          val es = copies.map(_._3).sorted
          assert(es == (0L until es.length).toVector.map(identity) ||
            es.toSeq == (0L until es.length),
            s"epoch ids not dense: $es")
          assert(es.length == full || es.length == full + 1)
        }
      }
    }
    val again = Sampling.epochMix(all.repartition(7), "doc_id", "source",
      "text", budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(mix.sortBy(m => (m._1, m._3)).toSeq ==
      again.sortBy(m => (m._1, m._3)).toSeq, "layout changed the mix")
  }

  test("drift census: d64 equals the scalar surprisal formula, counts " +
      "match the corpus, ordering is by |d64| desc") {
    import graft.operators.NgramLm.surprisal64Long
    val got = SparkEntry.queries("t50_drift_census")(spark, sf).collect()
    assert(got.nonEmpty)
    val docs = Tables.load(spark, sf, "documents")
    val counts = docs.select(($"doc_id" % 2 === 0).as("a"),
        explode(split($"text", " ")).as("tok")).filter($"tok" =!= "")
      .collect().map(r => (r.getBoolean(0), r.getString(1)))
    val ta = counts.count(_._1).toLong
    val tb = counts.size - ta
    got.foreach { r =>
      val (tok, ca, cb, d) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ca == counts.count(c => c._1 && c._2 == tok))
      assert(cb == counts.count(c => !c._1 && c._2 == tok))
      val want = (surprisal64Long(ca + 1) - surprisal64Long(ta + 1)) -
        (surprisal64Long(cb + 1) - surprisal64Long(tb + 1))
      assert(d == want, s"$tok: $d vs $want")
    }
    val mags = got.map(r => math.abs(r.getLong(3)))
    assert(mags.zip(mags.drop(1)).forall { case (x, y) => x >= y })
  }

  test("shingle minhashes = affine-min over the pinned gram hashes; " +
      "short docs take the sentinel") {
    import graft.functions.{NgramHashExpr, ShingleMinHashes}
    val P = ShingleMinHashes.P
    val seeds = Text.minhashSeeds(5)
    val tricky = docs.select($"text")
      .union(Seq("a b", "", "x  y", "solo").toDF("text"))
    val got = tricky.select(
      NgramHashExpr.shingleMinhashes($"text", 3, seeds).as("s"))
      .collect().map(_.getSeq[Long](0))
    val grams = tricky.select(
      NgramHashExpr.ngramHashes($"text", 3).as("g"))
      .collect().map(_.getSeq[Long](0))
    val want = grams.map { gs =>
      seeds.map { case (a, b) =>
        if (gs.isEmpty) P
        else gs.map(h => (a * (h % P) + b) % P).min
      }
    }
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
    // the sentinel rows really are the short ones
    assert(got(5).forall(_ == P) && got(6).forall(_ == P)) // "a b", ""
  }

  test("one-pass QualityStats equals the HOF quality forms, bit by bit") {
    import graft.functions.QualityExpr
    val tricky = docs.select($"text")
      .union(Seq("", " ", "a  b", "it is, it is! the: end.", "h\u00e9llo ☃ ;",
        "the quick. brown? fox; and: dog, it!", "   ", "a.b,c!d?e;f:g")
        .toDF("text"))
    val native = tricky.select(
      QualityExpr.punctRatio($"text").as("p"),
      QualityExpr.stopwordRatio($"text").as("s"),
      QualityExpr.qualityScore($"text").as("q"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val hof = tricky.select(
      Text.punctRatio($"text").as("p"),
      Text.stopwordRatio($"text").as("s"),
      Text.qualityScore($"text").as("q"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    // bit-exact, not approximate: the oracle hashes these doubles
    assert(native.map(t3 => (java.lang.Double.doubleToLongBits(t3._1),
      java.lang.Double.doubleToLongBits(t3._2),
      java.lang.Double.doubleToLongBits(t3._3))).toSeq ==
      hof.map(t3 => (java.lang.Double.doubleToLongBits(t3._1),
        java.lang.Double.doubleToLongBits(t3._2),
        java.lang.Double.doubleToLongBits(t3._3))).toSeq)
  }

  test("native MinHashes equals the SQL higher-order form, hash by hash") {
    // edge tokens too: consecutive / leading / trailing spaces, unicode
    val tricky = docs.select($"text")
      .union(Seq(" leading", "trailing ", "a  b", "", "h\u00e9llo wörld ☃")
        .toDF("text"))
    val seeds = Text.minhashSeeds(6)
    val native = tricky.select(
      graft.functions.MinHashExpr.minhashes($"text", seeds).as("mh"))
      .collect().map(_.getSeq[Long](0))
    val sql = tricky.select(array(seeds.map { case (a, b) =>
      Text.minhashExpr("text", a, b) }: _*).as("mh"))
      .collect().map(_.getSeq[Long](0))
    assert(native.toSeq == sql.toSeq)
  }

  test("native SimHash16 equals the SQL higher-order form") {
    val tricky = docs.select($"text")
      .union(Seq(" leading", "trailing ", "a  b", "", "h\u00e9llo wörld ☃")
        .toDF("text"))
    val native = tricky.select(
      graft.functions.SimHashExpr.simhash16($"text").as("sh"))
      .collect().map(_.getLong(0))
    val sql = tricky.select(Text.simhash16Expr("text").as("sh"))
      .collect().map(_.getLong(0))
    assert(native.toSeq == sql.toSeq)
  }

  test("native LshBucket equals the stacked higher-order form, bit by bit") {
    val dim = 8; val nBits = 8
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextGaussian()))).toDF("id", "v")
    val native = vecs
      .select(operators.Similarity.lshBucket($"v", dim, nBits).as("b"))
      .collect().map(_.getInt(0))
    // the pre-round-5 form: one zip_with/aggregate column per bit
    val sql = vecs.select(
      operators.Similarity.hyperplanes(dim, nBits).zipWithIndex.map {
        case (h, i) =>
          val planeLit = array(h.map(lit): _*)
          when(aggregate(zip_with($"v", planeLit, (x, y) => x * y),
            lit(0.0), _ + _) > 0, shiftleft(lit(1), i)).otherwise(lit(0))
      }.reduce(_ + _).as("b"))
      .collect().map(_.getInt(0))
    assert(native.toSeq == sql.toSeq)
  }

  test("jaccard is exact on token sets") {
    val j = docs.filter($"doc_id" === 0).crossJoin(
      docs.filter($"doc_id" === 1).select($"text".as("t2")))
      .select(Dedup.jaccard(Text.tokens($"text"), Text.tokens($"t2")).as("j"))
      .collect().head.getDouble(0)
    // tokens: {the,quick,brown,fox,jumps,over,lazy,dog} vs same with cat:
    // |inter|=7 (dog/cat differ), |union|=9
    assert(math.abs(j - 7.0 / 9.0) < 1e-12)
  }

  test("multi-permutation simhash is a superset of single-table blocking") {
    // rotation 0 IS the single-table scheme, so every d07-style pair
    // must reappear; the extra rotations may only ADD pairs (recall)
    val single = operators.Dedup.simhashNearDup(docs, "doc_id", "text",
      maxHamming = 3, blockBits = 8)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = operators.Dedup.simhashNearDupMulti(docs, "doc_id", "text",
      maxHamming = 3, blockBits = 8, rotations = Seq(0, 5, 11))
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(multi))
    // and every reported pair is a true near-dup at the hamming cap
    val overCap = operators.Dedup.simhashNearDupMulti(docs, "doc_id", "text",
      maxHamming = 3, blockBits = 8).filter($"hamming" > 3).count()
    assert(overCap == 0L)
  }

  test("simhash: near-dup texts within small hamming distance") {
    val pairs = Dedup.simhashNearDup(docs, "doc_id", "text",
      maxHamming = 4, blockBits = 16) // blockBits=16 -> single block
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)) || got.contains((0L, 2L)))
  }

  test("simhash64: 4x16-bit chunk blocking is pigeonhole-EXACT — every " +
      "hamming<=3 pair found, each exactly once (disjoint branches)") {
    // brute-force truth: all pairs within hamming 3 of the 63-bit sigs
    val sh = docs.select($"doc_id",
      graft.functions.SimHashExpr.simhash64($"text").as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- sh; (ib, sb) <- sh
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val gotAll = Dedup.simhashNearDup64(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotAll.toSet == want, "exact recall over all hamming<=3 pairs")
    assert(gotAll.length == gotAll.distinct.length,
      "first-match branches must be disjoint (no pair reported twice)")
    // signatures keep the sign bit clear (both engines' BIGINTs agree)
    assert(sh.forall(_._2 >= 0L))
  }

  test("connectedComponents: min-label clusters, chains collapse, " +
      "isolated nodes keep themselves") {
    val nodes = (1L to 6L).toDF("doc_id")
    // a 3-chain (1-2, 2-3), a pair (4-5), and isolated 6
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L)
    val got = Dedup.connectedComponents(nodes, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // cap 0 forces the distributed propagation path — same answer
    val dist = Dedup.connectedComponents(nodes, "doc_id", pairs,
      driverEdgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == want)
  }

  test("cosine matches hand-computed value") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val c = df.select(Similarity.cosine($"a", $"b").as("c"))
      .collect().head.getDouble(0)
    val want = 32.0 / (math.sqrt(14) * math.sqrt(77))
    assert(math.abs(c - want) < 1e-12)
  }

  test("brute-force topk is self-excluding, ordered, k-bounded") {
    val emb = Tables.load(spark, sf, "embeddings")
    val got = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 5)
      .collect()
    assert(got.length == 5)
    assert(!got.map(_.getLong(0)).contains(0L))
    val scores = got.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("lsh topk returns a subset consistent with brute force scores") {
    val emb = Tables.load(spark, sf, "embeddings")
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", 0L, 5, 64, 4)
      .collect()
    assert(approx.nonEmpty)
    // every approx hit's score must equal its brute-force cosine
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 1000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    approx.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(1)))
  }

  test("ivf topk: scores agree with brute force; k results from probed cells") {
    val emb = Tables.load(spark, sf, "embeddings")
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
      nCells = 8, nProbe = 2).collect()
    assert(ivf.length == 10)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 1000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(1)))
    // more probes → recall can only improve (same or more candidates)
    val wide = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
      nCells = 8, nProbe = 8).collect().map(_.getDouble(1)).toSeq
    assert(wide.head >= ivf.map(_.getDouble(1)).max)
  }

  test("ivf assignment is shuffle-free: no Exchange/Window before the write") {
    val emb = Tables.load(spark, sf, "embeddings")
    val v = emb.selectExpr("vec_id AS id", "CAST(embedding AS array<double>) AS v")
    val cents = (0 until 4).map(i => (i, Seq.fill(64)(i + 1.0)))
    val centLit = typedLit(cents.map(_._2))
    val assigned = v.withColumn("cell",
      graft.functions.VectorExprs.nearestCentroid($"v", centLit))
    val plan = assigned.queryExecution.executedPlan.toString
    // the r2 crossJoin+row_number assignment cost an n×nCells shuffle+sort;
    // the NearestCentroid expression must keep the scan narrow
    assert(!plan.contains("Exchange"), plan.take(600))
    assert(!plan.contains("Window"), plan.take(600))
    assert(!plan.contains("Join"), plan.take(600))
    // and agree with the brute-force argmax
    val got = assigned.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val local = v.collect().map { r =>
      val vec = r.getSeq[Double](1)
      val best = cents.map { case (i, c) =>
        val dot = vec.zip(c).map { case (a, b) => a * b }.sum
        val sim = dot / (math.sqrt(vec.map(x => x * x).sum) *
          math.sqrt(c.map(x => x * x).sum))
        (i, sim)
      }.maxBy(_._2)._1
      r.getLong(0) -> best
    }.toMap
    assert(got == local)
  }

  test("lloyd centroids move to the real clusters raw seeds miss, and " +
      "recall at nProbe=1 is at least the raw-seed baseline") {
    import spark.implicits._
    // skewed fixture: the first 128 ids (where ALL every-16th seeds come
    // from) sit in cluster 0; clusters 1-3 live entirely outside the
    // seed window — the raw-seed weakness Lloyd exists to fix
    def vec(cl: Int, i: Int): Seq[Double] = {
      val v = Array.fill(8)(0.0)
      v(cl) = 1.0
      v((cl + 1 + i % 3) % 8) = 0.01 * (1 + i % 7)
      v.toSeq
    }
    val rows = (0 until 128).map(i => (i.toLong, vec(0, i))) ++
      (128 until 158).map(i => (i.toLong, vec(1, i))) ++
      (158 until 188).map(i => (i.toLong, vec(2, i))) ++
      (188 until 288).map(i => (i.toLong, vec(3, i)))
    val df = rows.toDF("vec_id", "embedding")
    def maxCosTo(cents: Array[(Int, Seq[Double])], axis: Int): Double =
      cents.map { case (_, c) =>
        c(axis) / math.sqrt(c.map(x => x * x).sum)
      }.max
    val naive = Similarity.fitCentroids(df, "vec_id", "embedding", 8, 0)
    val fitted = Similarity.fitCentroids(df, "vec_id", "embedding", 8, 3)
    // raw seeds are all cluster-0 vectors: nothing points at cluster 3
    assert(maxCosTo(naive, 3) < 0.5, s"fixture broken: ${maxCosTo(naive, 3)}")
    // after Lloyd a centroid has migrated onto the cluster-3 mass
    assert(maxCosTo(fitted, 3) > 0.9, s"lloyd missed: ${maxCosTo(fitted, 3)}")
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", 200L, 5)
      .collect().map(_.getLong(0)).toSet
    def recall(iters: Int): Double = {
      val got = Similarity.ivfTopK(df, "vec_id", "embedding", 200L, 5,
        nCells = 8, nProbe = 1, lloydIters = iters)
        .collect().map(_.getLong(0)).toSet
      got.intersect(brute).size.toDouble / 5
    }
    val rN = recall(0); val rL = recall(3)
    assert(rL >= rN, s"lloyd recall $rL < raw-seed recall $rN")
    assert(rL >= 0.8, s"lloyd recall $rL too low on separable clusters")
  }

  test("kppSeed covers every cluster on id-sorted ingest with ZERO lloyd " +
      "iterations (the windowed rule needs lloyd to migrate)") {
    import spark.implicits._
    def vec(cl: Int, i: Int): Seq[Double] = {
      val v = Array.fill(8)(0.0)
      v(cl) = 1.0
      v((cl + 1 + i % 3) % 8) = 0.01 * (1 + i % 7)
      v.toSeq
    }
    val rows = (0 until 128).map(i => (i.toLong, vec(0, i))) ++
      (128 until 158).map(i => (i.toLong, vec(1, i))) ++
      (158 until 188).map(i => (i.toLong, vec(2, i))) ++
      (188 until 288).map(i => (i.toLong, vec(3, i)))
    val df = rows.toDF("vec_id", "embedding")
    def maxCosTo(cents: Array[(Int, Seq[Double])], axis: Int): Double =
      cents.map { case (_, c) =>
        c(axis) / math.sqrt(c.map(x => x * x).sum)
      }.max
    val kpp = Similarity.fitCentroids(df, "vec_id", "embedding", 8, 0,
      kppSeed = true)
    (1 to 3).foreach { cl =>
      assert(maxCosTo(kpp, cl) > 0.9,
        s"kpp seeds missed cluster $cl: ${maxCosTo(kpp, cl)}")
    }
  }

  test("sortedIntersectSize on i64 arrays equals size(array_intersect) " +
      "(randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(rnd.nextInt(30))(rnd.nextLong() % 50),
      Seq.fill(rnd.nextInt(30))(rnd.nextLong() % 50)))
    val df = rows.toDF("a", "b").select(
      sort_array(array_distinct($"a")).as("sa"),
      sort_array(array_distinct($"b")).as("sb"))
    val got = df.select(
      graft.functions.ArrayExprs.sortedIntersectSize($"sa", $"sb").as("m"),
      size(array_intersect($"sa", $"sb")).as("r")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("fuzzyReport flags the source doc of a benchmark snippet with full " +
      "containment; unrelated docs stay clean") {
    import spark.implicits._
    val words = (0 until 40).map(i => s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"x$i").mkString(" ")
    val corpus = Seq(
      (1L, words),                       // source of the leak
      (2L, other),                       // unrelated
      (3L, words.split(" ").take(35).mkString(" "))) // partial copy
      .toDF("doc_id", "text")
    val bench = Seq((9L, words.split(" ").take(30).mkString(" ")))
      .toDF("doc_id", "text")
    val got = operators.Decontam.fuzzyReport(
      corpus, "doc_id", "text", bench, "doc_id", "text",
      n = 3, numHashes = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    val byDoc = got.map(t => t._1 -> t).toMap
    // 30 tokens → 28 distinct 3-grams, all inside doc 1 (and doc 3)
    assert(byDoc.contains(1L) && byDoc(1L)._3 == byDoc(1L)._4)
    assert(byDoc.contains(3L))
    assert(!byDoc.contains(2L))
  }

  test("semDedup: within-cell cosine clusters resolve to min-id components; " +
      "cross-cell near-dups are out of scope by construction") {
    import spark.implicits._
    // 4 well-separated axis clusters (k-means must isolate them), two of
    // which contain near-identical vectors; singletons keep themselves.
    // 32+ rows so the every-16th seed window covers at least 2 vectors.
    def vec(axis: Int, eps: Double): Seq[Double] = {
      val v = Array.fill(8)(0.0); v(axis) = 1.0; v((axis + 4) % 8) = eps
      v.toSeq
    }
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 10L).map(i => i -> vec(0, 0.001 * i)) ++       // dup cluster A
      (10L until 20L).map(i => i -> vec(1, 0.001 * (i - 10))) ++ // dup cluster B
      (20L until 30L).map(i => i -> vec(2, 0.15 * (i - 19))) ++  // spread: no dups
      (30L until 36L).map(i => i -> vec(3, 0.001 * (i - 30)))    // dup cluster C
    val df = rows.toDF("vec_id", "embedding")
    val got = Dedup.semDedup(df, "vec_id", "embedding",
      nCells = 4, lloydIters = 3, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val comp = got.map(t => t._1 -> t._2).toMap
    val size = got.map(t => t._1 -> t._3).toMap
    // tight clusters collapse to their min id
    (0L until 10L).foreach(i => assert(comp(i) == 0L && size(i) == 10L, s"id $i"))
    (10L until 20L).foreach(i => assert(comp(i) == 10L && size(i) == 10L))
    (30L until 36L).foreach(i => assert(comp(i) == 30L && size(i) == 6L))
    // the spread cluster stays all-singleton at this threshold
    (20L until 30L).foreach(i => assert(comp(i) == i && size(i) == 1L))
  }

  test("semDedup nCells<=0 auto-sizes cells from the corpus " +
      "(n/targetCellSize, floor 8)") {
    import spark.implicits._
    val emb = Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val expectCells = math.max(8, (n / Dedup.semDedupTargetCellSize).toInt)
    // at this SF the auto size lands on the floor (8): auto == explicit 8
    assert(expectCells == 8, s"fixture assumption: n=$n")
    val auto = Dedup.semDedup(emb, "vec_id", "embedding",
      nCells = 0, lloydIters = 2, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val explicit = Dedup.semDedup(emb, "vec_id", "embedding",
      nCells = 8, lloydIters = 2, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(auto.sameElements(explicit))
  }

  test("persisted IVF index: partition-pruned probe, scores match brute force") {
    val emb = Tables.load(spark, sf, "embeddings")
    val path = s"/tmp/graft_ivf_spec/${System.nanoTime()}"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", nCells = 8, path)
    val qv = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).collect().head.getSeq[Double](0)
    val hits = Similarity.searchIvfIndex(spark, path, qv, k = 5, nProbe = 2,
      excludeId = 0L)
    // the scan must prune to the probed cells before any IO
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      plan.take(600))
    val rows = hits.collect()
    assert(rows.length == 5)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 1000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(1)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
  }

  test("appendToIvfIndex: appended vectors are immediately searchable, " +
      "scores stay brute-force-exact, and the old rows are untouched") {
    val emb = Tables.load(spark, sf, "embeddings")
    val first = emb.filter($"vec_id" < 250)
    val rest = emb.filter($"vec_id" >= 250)
    val path = s"/tmp/graft_ivf_append/${System.nanoTime()}"
    Similarity.buildIvfIndex(first, "vec_id", "embedding", nCells = 8, path)
    Similarity.appendToIvfIndex(rest, "vec_id", "embedding", path)
    val all = spark.read.parquet(s"$path/vectors")
    assert(all.count() == emb.count(), "append added exactly the new rows")
    val qv = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).collect().head.getSeq[Double](0)
    val hits = Similarity.searchIvfIndex(spark, path, qv, k = 5, nProbe = 8,
      excludeId = 0L).collect()
    assert(hits.length == 5)
    // probing ALL cells makes the index search exhaustive → must equal
    // brute force exactly, proving appended rows landed in real cells
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits.map(r => (r.getLong(0), r.getDouble(1))).toSeq == brute.toSeq)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
  }

  test("IVF recall: nProbe=2 of 8 cells keeps recall@10 >= 0.9 vs brute " +
      "force on a clustered corpus, including after appended drift") {
    import spark.implicits._
    // 8 tight axis-aligned clusters in 8-dim, interleaved so the seed
    // window sees every cluster; deterministic jitter on a second axis.
    def vec(c: Int, i: Long): Seq[Double] = {
      val v = Array.fill(8)(0.0)
      v(c) = 1.0
      v((c + 1) % 8) = 0.01 * (((i * 7) % 13) - 6) / 13.0
      v.toSeq
    }
    val base = (0L until 512L).map(i => (i, vec((i % 8).toInt, i)))
      .toDF("vec_id", "embedding")
    val path = s"/tmp/graft_ivf_recall/${System.nanoTime()}"
    Similarity.buildIvfIndex(base, "vec_id", "embedding", nCells = 8, path)

    def recallAt10(corpus: org.apache.spark.sql.DataFrame, qid: Long,
                   nProbe: Int): Double = {
      val truth = Similarity.bruteForceTopK(
        corpus, "vec_id", "embedding", qid, 10)
        .collect().map(_.getLong(0)).toSet
      val qv = corpus.filter($"vec_id" === qid)
        .select($"embedding".cast("array<double>"))
        .collect().head.getSeq[Double](0)
      val got = Similarity.searchIvfIndex(spark, path, qv, k = 10,
        nProbe = nProbe, excludeId = qid)
        .collect().map(_.getLong(0)).toSet
      truth.intersect(got).size / 10.0
    }
    assert(recallAt10(base, qid = 3L, nProbe = 2) >= 0.9)

    // drift: a new mode between axes 0 and 1 that the centroids were
    // never fitted on — the index must stay useful as data arrives
    val drifted = (512L until 576L).map { i =>
      val v = Array.fill(8)(0.0)
      v(0) = 0.7071; v(1) = 0.7071
      v(2) = 0.01 * (((i * 5) % 11) - 5) / 11.0
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(drifted, "vec_id", "embedding", path)
    val all = base.union(drifted)
    // the drifted mode sits between two fitted cells; probing both must
    // recover its neighborhood
    assert(recallAt10(all, qid = 520L, nProbe = 2) >= 0.9)

    // REBALANCE: refit on the accumulated set — must equal a
    // from-scratch rebuild exactly (deterministic seeds + Lloyd), and
    // the drifted mode should now have its own cell, restoring
    // single-probe recall on it
    Similarity.rebalanceIvfIndex(spark, path, nCells = 8)
    val rebuilt = s"/tmp/graft_ivf_recall_rebuild/${System.nanoTime()}"
    Similarity.buildIvfIndex(all, "vec_id", "embedding", nCells = 8, rebuilt)
    def snap(p: String) = (
      spark.read.parquet(s"$p/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq,
      spark.read.parquet(s"$p/vectors").select($"id", $"cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq)
    assert(snap(path) == snap(rebuilt),
      "rebalance must equal a from-scratch rebuild on the same set")
    assert(recallAt10(all, qid = 520L, nProbe = 1) >= 0.9,
      "post-rebalance the drifted mode is single-probe searchable")
    // the rewrite also compacted: one file per occupied cell partition
    val files = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(s"$path/vectors"),
        Array("parquet"), true)
    assert(files.size <= 8, s"compaction expected, got ${files.size} files")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(rebuilt))
  }

  test("gopher rules: integer gates pin handmade pass/fail per rule") {
    import spark.implicits._
    val docs = Seq(
      // 1: passes everything (8 words, the+a present, distinct-ish)
      (1L, "the a quick brown fox jumps over dog"),
      // 2: fails r_wc (3 words) and r_stop (no 2 stop hits)
      (2L, "quick brown fox"),
      // 3: fails r_uniq (one word repeated 8x) and r_mwl (mean len 2)
      (3L, "ab ab ab ab ab ab ab ab"),
      // 4: fails r_mwl high side (mean word length > 10)
      (4L, "the a abcdefghijklmnop qrstuvwxyzabcdef ghijklmnopqrstuv wxyzabcdefghijkl mnopqrstuvwxyzab cdefghijklmnopqr")
    ).toDF("doc_id", "text")
    val got = operators.QualityRules.gopher(docs, "doc_id", "text",
      minWords = 5, maxWords = 100)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got(1L) == ((1L, 1L, 1L, 1L, 1L)))
    assert(got(2L) == ((0L, 1L, 0L, 1L, 0L)))
    assert(got(3L) == ((1L, 0L, 0L, 0L, 0L)))
    assert(got(4L) == ((1L, 0L, 1L, 1L, 0L)))
  }

  test("redactPii: emails, IPv4s, 7+-digit runs become placeholders; " +
      "short numbers and plain text survive") {
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "server 192.168.001.1 port 80",
      "call 5551234567 ext 42",
      "version 1.2 of 3 things").toDF("t")
    val got = df.select(graft.functions.Text.redactPii($"t"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "mail <EMAIL> now",
      "server <IP> port 80",
      "call <NUM> ext 42",
      "version 1.2 of 3 things"))
  }

  test("line dedup: boilerplate lines (df > maxDf) drop from every " +
      "doc; in-doc repeats count once toward df; order is preserved; " +
      "all-boilerplate docs survive empty; trailing newlines are " +
      "engine-stable; layout-invariant") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (1L, "COOKIE\nbody one\nCOOKIE\nunique a"), // in-doc repeat
      (2L, "COOKIE\nbody two"),
      (3L, "COOKIE\nbody three"),
      (4L, "COOKIE"),                             // all boilerplate
      (5L, "COOKIE\nbody five\n")                 // trailing newline
    ).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.lineDedup(df, "doc_id", "text", maxDf = 2)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq
    val got = run(docs)
    // df(COOKIE) = 5 docs > 2 → dropped everywhere; others df <= 2
    assert(got == Seq(
      (1L, 4L, 2L, "body one\nunique a"),
      (2L, 2L, 1L, "body two"),
      (3L, 2L, 1L, "body three"),
      (4L, 1L, 0L, ""),
      (5L, 3L, 2L, "body five\n")), got.toString)
    assert(run(docs.repartition(3)) == got, "layout variant")
    intercept[IllegalArgumentException](
      CorpusStats.lineDedup(docs, "doc_id", "text", maxDf = 0))
  }

  test("paragraph dedup: a MULTI-LINE boilerplate block drops as a " +
      "unit while its individual lines are below any line-level df; " +
      "paragraph order is preserved; lines inside surviving " +
      "paragraphs are untouched") {
    import graft.operators.CorpusStats
    val banner = "COOKIE\nwe use cookies"       // 2-line block
    val docs = Seq(
      (1L, s"$banner\n\nbody A line1\nbody A line2\n\nunique a"),
      (2L, s"$banner\n\nbody B"),
      (3L, s"$banner\n\nbody C"),
      (4L, banner)                               // all boilerplate
    ).toDF("doc_id", "text")
    val got = CorpusStats.paragraphDedup(docs, "doc_id", "text", maxDf = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    // df(banner) = 4 > 2 → dropped as a unit; bodies df = 1 survive
    assert(got == Seq(
      (1L, 3L, 2L, "body A line1\nbody A line2\n\nunique a"),
      (2L, 2L, 1L, "body B"),
      (3L, 2L, 1L, "body C"),
      (4L, 1L, 0L, "")), got.toString)
    // line-dedup on the same corpus at the same cap drops the banner
    // LINES individually too (df counts are per line there), but a
    // HALF-shared block shows the scope difference: a paragraph whose
    // first line is frequent but whose block differs per doc survives
    // paragraph dedup intact.
    val half = Seq(
      (1L, "COOKIE\nvariant one\n\nbody A"),
      (2L, "COOKIE\nvariant two\n\nbody B"),
      (3L, "COOKIE\nvariant three\n\nbody C")
    ).toDF("doc_id", "text")
    val para = CorpusStats.paragraphDedup(half, "doc_id", "text", maxDf = 2)
      .orderBy($"doc_id").collect().map(_.getString(3)).toSeq
    assert(para == Seq(
      "COOKIE\nvariant one\n\nbody A",
      "COOKIE\nvariant two\n\nbody B",
      "COOKIE\nvariant three\n\nbody C"), "distinct blocks survive")
    // (line scope also drops the blank separator line — df = 3)
    val line = CorpusStats.lineDedup(half, "doc_id", "text", maxDf = 2)
      .orderBy($"doc_id").collect().map(_.getString(3)).toSeq
    assert(line.head == "variant one\nbody A",
      "line scope drops the shared first line individually: " + line)
  }

  test("redactPii breadth: formatted phones become <PHONE>, Luhn-VALID " +
      "cards become <CARD>, Luhn-invalid card-shaped numbers do NOT; " +
      "bare digit runs still fall to <NUM>") {
    val df = Seq(
      "call (555) 123-4567 today",
      "or +1-555-123-4567 or 555.123.4567",
      "pay 4111 1111 1111 1111 now",      // valid visa
      "pay 4111 1111 1111 1110 now",      // invalid Luhn
      "mc 5500-0000-0000-0004 done",      // valid mastercard
      "order 1234567890123456 shipped",   // 16 contiguous, invalid Luhn
      "date 2026-08-15 and 1.2.3",
      "id 999555-123-4567 raw").toDF("t")  // digit-run start (r15 ADVICE)
    val got = df.select(graft.functions.Text.redactPii($"t"))
      .collect().map(_.getString(0)).toSeq
    assert(got(0) == "call <PHONE> today", got(0))
    assert(got(1) == "or <PHONE> or <PHONE>", got(1))
    assert(got(2) == "pay <CARD> now", got(2))
    assert(!got(3).contains("<CARD>"), got(3)) // invalid stays un-carded
    assert(got(4) == "mc <CARD> done", got(4))
    assert(!got(5).contains("<CARD>") && got(5).contains("<NUM>"), got(5))
    assert(got(6) == "date 2026-08-15 and 1.2.3", got(6))
    // a match must not start INSIDE a digit run: the unanchored regex
    // produced the half-redaction '999<PHONE>' here
    assert(got(7) == "id 999555-123-4567 raw", got(7))
  }

  test("Luhn fuzz: for 500 random 16-digit numbers the checksum " +
      "decides redaction exactly — the valid check digit is unique " +
      "per prefix, and the Expression matches a driver Luhn oracle") {
    import graft.functions.PiiExpr
    val rnd = new scala.util.Random(20260815L)
    val prefixes = Seq.fill(500)(
      (1 to 15).map(_ => rnd.nextInt(10)).mkString)
    // driver oracle: the unique valid check digit per prefix
    def checkDigit(p: String): Int =
      (0 to 9).find(d => PiiExpr.luhnValid(p + d)).get
    val rows = prefixes.zipWithIndex.flatMap { case (p, i) =>
      val ok = checkDigit(p)
      Seq((i * 2L, s"x $p$ok y", true),
        (i * 2L + 1L, s"x $p${(ok + 3) % 10} y", false))
    }
    val got = rows.map { case (id, t, _) => (id, t) }.toDF("id", "t")
      .select($"id", graft.functions.Text.redactPii($"t").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, _, valid) =>
      assert(got(id).contains("<CARD>") == valid,
        s"row $id (valid=$valid): ${got(id)}")
    }
  }

  test("deterministic sampling: reproducible, repartition-stable, and " +
      "within 2% of the nominal rate at 100k ids") {
    import org.apache.spark.sql.functions._
    val ids = spark.range(100000L).toDF("id")
    val kept = ids.filter(operators.Sampling.keep($"id", lit(0.3)))
    val n1 = kept.count()
    assert(math.abs(n1 - 30000L) < 2000, s"rate off: $n1/100000 at 0.3")
    // same ids, different partitioning → identical sample
    val n2 = ids.repartition(7).filter(
      operators.Sampling.keep($"id", lit(0.3))).count()
    assert(n1 == n2)
    val first = kept.orderBy("id").limit(5).collect().map(_.getLong(0)).toSeq
    val again = kept.orderBy("id").limit(5).collect().map(_.getLong(0)).toSeq
    assert(first == again)
  }

  test("sampling decision is total on the full i64 id range (a 100 TB " +
      "corpus has > 2^31 docs) and matches the classic hash below 2^31") {
    import org.apache.spark.sql.functions._
    // ids straddling 2^31, 2^32 and Long extremes: no ANSI overflow,
    // every decision in [0,1)
    val big = Seq(0L, 1L, 2147483647L, 2147483648L, 4294967296L,
      4294967297L, 1L << 40, Long.MaxValue, -1L, Long.MinValue)
      .toDF("id")
    val ds = big.select($"id",
      operators.Sampling.decision($"id").as("u")).collect()
    ds.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) < 1.0,
      s"decision out of range for id ${r.getLong(0)}"))
    // uniformity sanity at scale: rate holds for ids around 2^40
    val n = spark.range(1L << 40, (1L << 40) + 100000L).toDF("id")
      .filter(operators.Sampling.keep($"id", lit(0.3))).count()
    assert(math.abs(n - 30000L) < 2000, s"rate off above 2^32: $n")
    // below 2^31 the hi word is 0: value equals id*K mod 2^32 (the t06
    // oracle's historical formula — small-id samples are unchanged)
    val small = spark.range(1000L).toDF("id").select($"id",
      operators.Sampling.decision($"id").as("u")).collect()
    small.foreach { r =>
      val want = java.lang.Math.floorMod(
        r.getLong(0) * 2654435761L, 4294967296L).toDouble / 4294967296.0
      assert(math.abs(r.getDouble(1) - want) < 1e-15)
    }
  }

  test("langId votes marker words deterministically") {
    val df = Seq("der hund und die katze ist da",
      "the cat and the dog", "xyzzy plugh").toDF("text")
    val got = df.select(Text.langId($"text").as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("de", "en", "unknown"))
  }

  test("native LangId equals the Column form on docs + tie/case edges") {
    val df = Seq("der hund und die katze ist da", "the cat and the dog",
      "xyzzy plugh", "", "THE Und", "le der the el",
      "The   and  of", "est une la que").toDF("text")
    val native = df.select(
      graft.functions.LangIdExpr.langId($"text").as("l"))
      .collect().map(_.getString(0)).toSeq
    val column = df.select(Text.langId($"text").as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(native == column)
  }

  test("quality score is in [0,1] and penalizes stopword soup") {
    val df = Seq("the a an and or of to in is it",
      "informative technical prose with varied vocabulary here").toDF("text")
    val got = df.select(Text.qualityScore($"text").as("q"))
      .collect().map(_.getDouble(0))
    assert(got.forall(q => q >= 0 && q <= 1))
    assert(got(1) > got(0))
  }

  test("RepStats pins handmade repetition fractions (0-bigram docs zero)") {
    import graft.functions.RepStatsExpr
    val df = Seq(
      "a b a b a b", // bigrams ab ba ab ba ab: 5 total, 2 distinct, top 3
      "x y z",       // 2 distinct of 2 → dup 0, top 1/2
      "w w w w",     // ww ww ww → dup 2/3, top 1
      "solo", "",    // no bigrams
      "repeat repeat repeat stop repeat repeat" // rr rr rs sr rr: top 3/5
    ).toDF("text")
    val got = df.select(RepStatsExpr.repStats($"text").as("st"))
      .select($"st.dup", $"st.top", $"st.nbig")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getInt(2)))
    assert(got(0) == ((3.0 / 5, 3.0 / 5, 5)))
    assert(got(1) == ((0.0, 0.5, 2)))
    assert(got(2) == ((2.0 / 3, 1.0, 3)))
    assert(got(3) == ((0.0, 0.0, 0)) && got(4) == ((0.0, 0.0, 0)))
    assert(got(5) == ((2.0 / 5, 3.0 / 5, 5)))
  }

  test("RepStats counts equal explode+groupBy over the same gram hashes") {
    import graft.functions.{NgramHashExpr, RepStatsExpr}
    val withId = docs.union(Seq((90L, "a b a b a b"), (91L, ""),
      (92L, "x  y x  y")).toDF("doc_id", "text"))
    val native = withId.select($"doc_id",
        RepStatsExpr.repStats($"text").as("st"))
      .select($"doc_id", $"st.dup", $"st.top", $"st.nbig")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getInt(3)))).toMap
    val sql = withId.select($"doc_id",
        explode(NgramHashExpr.ngramHashes($"text", 2)).as("g"))
      .groupBy($"doc_id", $"g").count()
      .groupBy($"doc_id")
      .agg(sum($"count").as("nbig"), max($"count").as("topc"),
        count(lit(1)).as("ndist"))
      .collect().map { r =>
        val nbig = r.getLong(1)
        r.getLong(0) -> (((nbig - r.getLong(3)).toDouble / nbig,
          r.getLong(2).toDouble / nbig, nbig.toInt))
      }.toMap
    sql.foreach { case (id, want) => assert(native(id) == want, s"doc $id") }
    assert(native(91L) == ((0.0, 0.0, 0))) // no-bigram doc absent from sql side
  }

  test("sampleToMix hits target proportions, keeps the binding stratum " +
      "whole, and drops untargeted strata") {
    import org.apache.spark.sql.functions._
    // 60k en, 20k de, 5k fr, 1k xx; targets 60/25/15 → fr binds:
    // total = 5000/0.15 = 33333.3, en rate=.333, de rate=.417, fr rate=1
    val df = spark.range(86000L).toDF("id").select($"id",
      when($"id" < 60000L, "en").when($"id" < 80000L, "de")
        .when($"id" < 85000L, "fr").otherwise("xx").as("lang"))
    val kept = operators.Sampling.sampleToMix(df, "id", "lang",
      Map("en" -> 0.6, "de" -> 0.25, "fr" -> 0.15))
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("xx"))
    assert(kept("fr") == 5000L, s"binding stratum thinned: $kept")
    val total = kept.values.sum.toDouble
    assert(math.abs(kept("en") / total - 0.6) < 0.02, s"en share: $kept")
    assert(math.abs(kept("de") / total - 0.25) < 0.02, s"de share: $kept")
    assert(math.abs(kept("fr") / total - 0.15) < 0.02, s"fr share: $kept")
    // deterministic: same input, same sample
    val again = operators.Sampling.sampleToMix(df, "id", "lang",
      Map("en" -> 0.6, "de" -> 0.25, "fr" -> 0.15)).count()
    assert(again == kept.values.sum)
  }

  test("temperatureSample: kept counts ∝ sqrt(n), smallest stratum whole, " +
      "rates are exactly sqrt(n_min/n)") {
    import org.apache.spark.sql.functions._
    // 40k en, 10k de, 2.5k fr → rates 1/4, 1/2, 1 (exact sqrt of 1/16,
    // 1/4, 1); kept ∝ sqrt(n): 10k, 5k, 2.5k expected
    val df = spark.range(52500L).toDF("id").select($"id",
      when($"id" < 40000L, "en").when($"id" < 50000L, "de")
        .otherwise("fr").as("lang"))
    val rates = operators.Sampling.temperatureRates(df, "lang")
    assert(rates("fr") == 1.0)
    assert(rates("de") == 0.5)   // sqrt(2500/10000) exactly
    assert(rates("en") == 0.25)  // sqrt(2500/40000) exactly
    val kept = operators.Sampling.temperatureSample(df, "id", "lang")
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("fr") == 2500L, s"smallest stratum thinned: $kept")
    assert(math.abs(kept("de") - 5000.0) / 5000.0 < 0.05, s"$kept")
    assert(math.abs(kept("en") - 10000.0) / 10000.0 < 0.05, s"$kept")
    // repartition-stable (the decision is a pure id function)
    val again = operators.Sampling.temperatureSample(
      df.repartition(7), "id", "lang").count()
    assert(again == kept.values.sum)
  }

  test("splitAssign: labels partition the corpus, agree with keep() at " +
      "the same bound, and stay in-domain on huge ids") {
    val df = spark.range(0, 20000).toDF("id")
    val lab = df.withColumn("s", operators.Sampling.splitAssign($"id",
      Seq("train" -> 0.8, "val" -> 0.9), "test"))
    val counts = lab.groupBy($"s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 20000L)
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02, s"$counts")
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.01, s"$counts")
    // the train slice IS the keep(0.8) sample — same hash, same bound
    val kept = df.filter(operators.Sampling.keep($"id", lit(0.8))).count()
    assert(kept == counts("train"))
    // full-i64 ids survive ANSI mode (the round-8 two-word hash domain)
    val big = Seq(Long.MaxValue - 1, 1L << 40).toDF("id")
      .withColumn("s", operators.Sampling.splitAssign($"id",
        Seq("train" -> 0.8, "val" -> 0.9), "test"))
    assert(big.select($"s").collect().length == 2)
  }

  test("tf-idf top keywords: exact ranks on a hand-computed corpus") {
    val c = Seq((0L, "apple banana apple"), (1L, "banana cherry"),
      (2L, "durian")).toDF("doc_id", "text")
    // N=3; df: apple 1, banana 2, cherry 1, durian 1
    // d0: apple 2*3/1=6.0 > banana 1*3/2=1.5; d1: cherry 3.0 > banana 1.5
    val got = operators.TfIdf.topKeywords(c, "doc_id", "text", 2)
      .orderBy($"doc_id", $"rnk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (0L, 1, "apple", 2L, 1L, 6.0), (0L, 2, "banana", 1L, 2L, 1.5),
      (1L, 1, "cherry", 1L, 1L, 3.0), (1L, 2, "banana", 1L, 2L, 1.5),
      (2L, 1, "durian", 1L, 1L, 3.0)))
  }

  test("corpus top n-grams: counts match a driver recompute") {
    val c = Seq((0L, "a b c a b c d"), (1L, "a b c x y z"),
      (2L, "x y z x y z")).toDF("doc_id", "text")
    val got = operators.CorpusStats.topNgrams(c, "doc_id", "text", 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver model: same NgramHashes arithmetic, counted in Scala
    val rows = c.collect().map(r => (r.getLong(0), r.getString(1)))
    val occ = rows.flatMap { case (id, s) =>
      functions.NgramHashes.gramHashes(s, 3).map(g => (g, id)) }
    val model = occ.groupBy(_._1).map { case (g, xs) =>
      (g, xs.length.toLong, xs.map(_._2).distinct.length.toLong) }
      .toSeq.sortBy(t => (-t._2, t._1)).take(5)
    assert(got.toSeq == model)
    // the twice-planted "x y z" gram: total 3, in 2 docs
    val xyz = functions.NgramHashes.gramHashes("x y z", 3).head
    assert(got.contains((xyz, 3L, 2L)))
  }

  test("scalar quantization: codes in range, errors within the half-step " +
      "bound, degenerate dimension codes to 0") {
    val vecs = Seq(
      (0L, Array(0.0f, 1.0f, 5.0f)), (1L, Array(2.0f, 1.0f, -3.0f)),
      (2L, Array(1.0f, 1.0f, 0.5f))).toDF("vec_id", "embedding")
    val (mins, maxs) = operators.Quantize.dimensionRanges(vecs, "embedding")
    assert(mins.toSeq == Seq(0.0, 1.0, -3.0) && maxs.toSeq == Seq(2.0, 1.0, 5.0))
    val got = operators.Quantize.quantize(vecs, "embedding", mins, maxs)
      .orderBy($"vec_id")
      .select($"codes", $"max_err").collect()
    val codes = got.map(_.getSeq[Long](0))
    assert(codes.forall(_.forall(v => v >= 0L && v <= 255L)))
    assert(codes.forall(_.apply(1) == 0L)) // constant dim → 0
    // half-step reconstruction bound: span/255/2 per dimension
    val bound = (0 until 3).map(i => (maxs(i) - mins(i)) / 255.0 / 2.0).max
    assert(got.map(_.getDouble(1)).forall(_ <= bound + 1e-12))
    // exact endpoints: min → 0, max → 255
    assert(codes(0).toSeq == Seq(0L, 0L, 255L))
    // the fused Sq8Codes/Sq8MaxErr kernels must equal the HOF column
    // forms bit for bit on a real corpus (codegen rewrite, same chain)
    val emb = Tables.load(spark, sf, "embeddings")
    val hof = emb.select($"vec_id",
        operators.Quantize.codes($"embedding", mins3, maxs3).as("c"),
        array_max(zip_with($"embedding".cast("array<double>"),
          operators.Quantize.dequantize(
            operators.Quantize.codes($"embedding", mins3, maxs3),
            mins3, maxs3),
          (x, r) => abs(x - r))).as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getDouble(2)))
    val fused = operators.Quantize.quantize(emb, "embedding", mins3, maxs3)
      .select($"vec_id", $"codes", $"max_err")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getDouble(2)))
    assert(fused.sortBy(_._1).toSeq == hof.sortBy(_._1).toSeq)
  }

  private lazy val (mins3, maxs3) = operators.Quantize.dimensionRanges(
    Tables.load(spark, sf, "embeddings"), "embedding")

  test("SQ8 search: top-k over dequantized codes tracks the float " +
      "brute force (8-bit reconstruction error is sub-ranking)") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (mins, maxs) = operators.Quantize.dimensionRanges(emb, "embedding")
    val sq8 = operators.Quantize.sq8TopK(emb, "vec_id", "embedding",
      0L, 10, mins, maxs).collect()
    assert(sq8.length == 10)
    // scores descend with the id tie-break
    val scores = sq8.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    // float-side brute force by the same (dot-product) metric
    val rows = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val qv = rows.find(_._1 == 0L).get._2
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val exact = rows.filter(_._1 != 0L)
      .map { case (id, v) => (id, dot(qv, v)) }
      .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1).toSet
    val recall = (exact & sq8.map(_.getLong(0)).toSet).size / 10.0
    info(s"sq8 recall@10 = $recall")
    assert(recall >= 0.8, s"sq8 recall $recall")
    // the fused Sq8Dot kernel must equal the stacked HOF column form
    // (transform→transform→dot) BIT FOR BIT on every row — the codegen
    // rewrite is a performance change only
    val qdeq = operators.Quantize.dequantLocal(qv, mins, maxs)
    val hof = emb
      .select($"vec_id", operators.Quantize.dequantize(
        operators.Quantize.codes($"embedding", mins, maxs), mins, maxs).as("dv"))
      .select($"vec_id", functions.VectorExprs.dot(
        $"dv", array(qdeq.map(lit(_)): _*)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fused = emb
      .select($"vec_id", functions.VectorExprs.sq8Dot(
        $"embedding".cast("array<double>"),
        typedLit(Seq(mins.toSeq, maxs.toSeq, qdeq))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused == hof)
  }

  test("dup-span coverage: overlapping frequent spans count positions " +
      "once; untouched docs report zero") {
    val c = Seq(
      (0L, "a b c d e"),            // "a b c" frequent → positions 0-2
      (1L, "a b c x y"),
      (2L, "a b c z w"),
      (3L, "p q r s"),              // no frequent gram
      (4L, "a b c a b c a b c")     // 3 disjoint hits tile all 9 tokens
    ).toDF("doc_id", "text")
    val got = operators.CorpusStats
      .dupSpanCoverage(c, "doc_id", "text", n = 3, minDocs = 3)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // only "a b c" is in ≥3 docs ("b c a"/"c a b" live in doc 4 alone)
    assert(got.toSeq == Seq(
      (0L, 5L, 3L, 0.6), (1L, 5L, 3L, 0.6), (2L, 5L, 3L, 0.6),
      (3L, 4L, 0L, 0.0), (4L, 9L, 9L, 1.0)))
  }

  test("dup-span removal: planted spans excised, adjacent hits merge to " +
      "one maximal span, untouched docs round-trip") {
    val c = Seq(
      (0L, "a b c d e"),            // "a b c" frequent → excise tokens 0-2
      (1L, "a b c x y"),
      (2L, "a b c z w"),
      (3L, "p q r s"),              // no frequent gram → verbatim
      (4L, "a b c a b c a b c")     // hits at 0,3,6 tile → ONE merged span
    ).toDF("doc_id", "text")
    val got = operators.CorpusStats
      .dupSpanRemove(c, "doc_id", "text", n = 3, minDocs = 3)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 5L, 1L, 3L, "d e", 6L),
      (1L, 5L, 1L, 3L, "x y", 6L),
      (2L, 5L, 1L, 3L, "z w", 6L),
      (3L, 4L, 0L, 0L, "p q r s", 0L),
      (4L, 9L, 1L, 9L, "", 17L)))
  }

  test("dup-span removal: OVERLAPPING frequent grams merge into one span") {
    // both "a b c" (pos 0) and "b c d" (pos 1) are in all 3 docs →
    // intervals [0,2] and [1,3] overlap → single span covering 0-3
    val c = Seq(
      (0L, "a b c d x"), (1L, "a b c d y"), (2L, "a b c d z")
    ).toDF("doc_id", "text")
    val got = operators.CorpusStats
      .dupSpanRemove(c, "doc_id", "text", n = 3, minDocs = 3)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.toSeq == Seq(
      (0L, 1L, 4L, "x"), (1L, 1L, 4L, "y"), (2L, 1L, 4L, "z")))
  }

  test("dup-span removal minSpanTokens: merged spans under the length " +
      "floor survive, longer ones are still excised") {
    // "a b c" (3 tokens) is frequent in all docs; doc 3 additionally
    // carries the 6-token run "a b c a b c" (hits at 0 and 3 merge)
    val c = Seq(
      (0L, "a b c d e"), (1L, "a b c x y"), (2L, "a b c z w"),
      (3L, "a b c a b c t")
    ).toDF("doc_id", "text")
    val got = operators.CorpusStats
      .dupSpanRemove(c, "doc_id", "text", n = 3, minDocs = 4,
        minSpanTokens = 5)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getString(4)))
    // docs 0-2: span [0,2] is 3 < 5 tokens → kept verbatim;
    // doc 3: merged run [0,5] is 6 ≥ 5 → excised
    assert(got.toSeq == Seq(
      (0L, 0L, 0L, "a b c d e"), (1L, 0L, 0L, "a b c x y"),
      (2L, 0L, 0L, "a b c z w"), (3L, 1L, 6L, "t")))
  }

  test("knn join: each query's block equals the single-query brute force") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)), (3L, Array(0.1f, 0.9f, 0.1f)),
      (4L, Array(0.5f, 0.5f, 0.0f)), (5L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.knnJoin(vecs, "vec_id", "embedding", Seq(0L, 2L), 3)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
    for (q <- Seq(0L, 2L)) {
      val single = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got(q) == single, s"query $q diverges from bruteForceTopK")
    }
  }

  test("shard shuffle: a partition of the corpus, reproducible, " +
      "repartition-stable, positions contiguous from 0 per shard") {
    import graft.operators.Sampling
    val df = spark.range(0, 1000).toDF("doc_id")
    val s1 = Sampling.shardShuffle(df, "doc_id", 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    // every row lands in exactly one shard
    assert(s1.length == 1000 && s1.map(_._1).distinct.length == 1000)
    assert(s1.forall(x => x._2 >= 0 && x._2 < 8))
    // positions are 0..n_s-1 within each shard
    s1.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $s positions not contiguous")
    }
    // reproducible and stable under a different partitioning
    val s2 = Sampling.shardShuffle(df.repartition(7), "doc_id", 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(s1.toSeq == s2.toSeq)
    // the hash balances shards without a global sort (loose 2x bound)
    val sizes = s1.groupBy(_._2).values.map(_.length)
    assert(sizes.min > 1000 / 8 / 2 && sizes.max < 1000 / 8 * 2, sizes)
  }

  test("shard shuffle rejects inputs that already carry a reserved " +
      "column name instead of silently clobbering it") {
    import graft.operators.Sampling
    val withShard = spark.range(0, 10).toDF("doc_id")
      .withColumn("shard", org.apache.spark.sql.functions.lit(1))
    val e = intercept[IllegalArgumentException] {
      Sampling.shardShuffle(withShard, "doc_id", 4)
    }
    assert(e.getMessage.contains("shard"))
  }

  test("shard shuffle degrades gracefully under skew: nShards=1 funnels " +
      "every row through one sorting task and a forced window-buffer " +
      "SPILL still yields the exact nShards=8 ordering semantics") {
    import graft.operators.Sampling
    val df = spark.range(0, 5000).toDF("doc_id")
    val reference = Sampling.shardShuffle(df, "doc_id", 1)
      .select("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // force the window exec to spill: hold at most 16 rows in memory —
    // 5000 rows through ONE task must take the UnsafeExternalSorter
    // spill path (the 100 TB skew story: disk, not OOM)
    val old = spark.conf.getOption("spark.sql.windowExec.buffer.spill.threshold")
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "16")
    try {
      val spilled = Sampling.shardShuffle(df, "doc_id", 1)
        .select("doc_id", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(spilled.toSeq == reference.toSeq,
        "spill path must not change the deterministic order")
      // one shard, positions are a permutation of 0..n-1
      assert(spilled.map(_._2).sorted.toSeq == (0L until 5000L).toSeq)
    } finally old match {
      case Some(v) =>
        spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", v)
      case None =>
        spark.conf.unset("spark.sql.windowExec.buffer.spill.threshold")
    }
  }

  test("cluster balance: every cell capped at the smallest cell, keep " +
      "set = the hash-order prefix of each cell") {
    import graft.operators.Sampling
    // three separable directions with unequal populations 4/3/2
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0.95f, 0f, 0.05f)), (3L, Array(0.85f, 0.15f, 0f)),
      (10L, Array(0f, 1f, 0f)), (11L, Array(0.1f, 0.9f, 0f)),
      (12L, Array(0f, 0.95f, 0.05f)),
      (20L, Array(0f, 0f, 1f)), (21L, Array(0.05f, 0f, 0.95f))
    ).toDF("vec_id", "embedding")
    val cents = Array(
      (0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)),
      (2, Seq(0.0, 0.0, 1.0)))
    val got = Sampling.clusterBalance(vecs, "vec_id", "embedding", cents)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // min cell population is 2 -> every cell keeps exactly 2
    assert(got.groupBy(_._1).view.mapValues(_.length).toMap ==
      Map(0 -> 2, 1 -> 2, 2 -> 2), got.toSeq)
    // the kept rows are the 2 lowest by (decision, id) in each cell
    def u(id: Long): Double =
      ((id % 2147483648L) * 2654435761L % 4294967296L +
        (id / 2147483648L) * 2246822519L % 4294967296L) %
        4294967296L / 4294967296.0
    val cellOf = Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 0,
      10L -> 1, 11L -> 1, 12L -> 1, 20L -> 2, 21L -> 2)
    val expect = cellOf.groupBy(_._2).view.mapValues(
      _.keys.toSeq.sortBy(id => (u(id), id)).take(2).toSet).toMap
    got.groupBy(_._1).foreach { case (cell, rows) =>
      assert(rows.map(_._3).toSet == expect(cell), s"cell $cell")
    }
  }

  test("incremental cluster state == full re-cluster: batches that merge " +
      "existing clusters, bridge two stored clusters, and add singletons; " +
      "replayed append is a no-op; missing state fails fast") {
    import graft.operators.Dedup
    val base = s"/tmp/graft_cluster_spec/${System.nanoTime()}"
    def pairsDF(ps: Seq[(Long, Long)]) = ps.toDF("id_a", "id_b")
    def idsDF(ids: Seq[Long]) = ids.toDF("doc_id")
    // corpus batch 0: clusters {1,2}, {5,6}, singleton 9
    Dedup.buildClusterState(idsDF(Seq(1, 2, 5, 6, 9)), "doc_id",
      pairsDF(Seq((1, 2), (5, 6))), s"$base/idx")
    def state() = Dedup.clusterState(spark, s"$base/idx")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state() == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
    // batch 1: 10 joins cluster(1), 11 BRIDGES clusters (1,2) and (5,6)
    // via pairs to 2 and 5, 12 is a new singleton
    Dedup.appendToClusterState(idsDF(Seq(10, 11, 12)), "doc_id",
      pairsDF(Seq((10, 1), (11, 2), (11, 5))), s"$base/idx")
    val expect = Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 9L -> 9L,
      10L -> 1L, 11L -> 1L, 12L -> 12L)
    assert(state() == expect)
    // full re-cluster over everything must agree
    val full = Dedup.connectedComponents(
      idsDF(Seq(1, 2, 5, 6, 9, 10, 11, 12)), "doc_id",
      pairsDF(Seq((1, 2), (5, 6), (10, 1), (11, 2), (11, 5))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state() == full)
    // replayed append: identical state (idempotent quotient merge)
    Dedup.appendToClusterState(idsDF(Seq(10, 11, 12)), "doc_id",
      pairsDF(Seq((10, 1), (11, 2), (11, 5))), s"$base/idx")
    assert(state() == expect)
    // a LOWER new id becomes the merged cluster's label (min-id rule)
    Dedup.appendToClusterState(idsDF(Seq(0L)), "doc_id",
      pairsDF(Seq((0, 9))), s"$base/idx")
    assert(state()(9L) == 0L && state()(0L) == 0L)
    val err = intercept[IllegalArgumentException] {
      Dedup.appendToClusterState(idsDF(Seq(1L)), "doc_id",
        pairsDF(Seq()), s"$base/nowhere")
    }
    assert(err.getMessage.contains("buildClusterState"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("rrf fusion: hand-computed fused ranking, one-sided entries " +
      "contribute a single term, ties break on id") {
    import graft.operators.Similarity
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rk")
    val b = Seq((11L, 1), (13L, 2)).toDF("id", "rk")
    val got = Similarity.rrfFuse(a, b, "id", "rk", c = 60, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def t(r: Int) = 1.0 / (60 + r)
    // 11: both lists; 10/12 only a; 13 only b
    val expect = Seq(11L -> (t(2) + t(1)), 10L -> t(1), 13L -> t(2),
      12L -> t(3))
    assert(got == expect, got.toString)
    // a tie (same single-list rank) orders by id
    val c1 = Seq((5L, 1)).toDF("id", "rk")
    val c2 = Seq((3L, 1)).toDF("id", "rk")
    val tie = Similarity.rrfFuse(c1, c2, "id", "rk", 60, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(tie == Seq(3L, 5L))
  }

  test("filtered knn join: per-query results carry ONLY the query's " +
      "label and equal the label-restricted brute force") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, sf, "embeddings")
    val labels = emb.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qids = (0L until 4L).toSeq
    val got = Similarity.filteredKnnJoin(emb, "vec_id", "embedding",
      "label", qids, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    got.foreach { case (q, _, id, _) =>
      assert(labels(id) == labels(q), s"query $q got cross-label $id")
    }
    qids.foreach { q =>
      val brute = Similarity.bruteForceTopK(
        emb.filter($"label" === labels(q)), "vec_id", "embedding", q, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val mine = got.filter(_._1 == q).sortBy(_._2)
        .map(x => (x._3, x._4)).toSeq
      assert(mine == brute, s"query $q: $mine vs $brute")
    }
  }

  test("NFC normalization: decomposed sequences compose, precomposed " +
      "and ASCII pass through unchanged, ligatures survive (NFC not " +
      "NFKC), idempotent, nulls propagate, SQL-callable") {
    import graft.functions.NfcNormalize.nfc
    val df = Seq(
      (1L, "caf" + "e\u0301"),      // decomposed -> precomposed
      (2L, "caf\u00e9"),            // already NFC
      (3L, "plain ascii"),
      (4L, "\ufb01le"),             // fi ligature: NFC keeps it
      (5L, null.asInstanceOf[String]),
      (6L, "a\u030a\u0301")        // a + ring + acute composes to U+01FB
    ).toDF("id", "t")
    val got = df.select($"id", nfc($"t").as("n")).orderBy($"id")
      .collect().map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(got(0) == "caf\u00e9", s"decomposed must compose: ${got(0)}")
    assert(got(1) == "caf\u00e9" && got(2) == "plain ascii")
    assert(got(3) == "\ufb01le", "NFC must not touch compatibility forms")
    assert(got(4) == null)
    assert(got(5) == "\u01fb", s"multi-mark composition: ${got(5)}")
    // idempotence
    val twice = df.filter($"t".isNotNull)
      .select((nfc(nfc($"t")) === nfc($"t")).as("ok"))
      .collect().map(_.getBoolean(0))
    assert(twice.forall(identity))
    // SQL surface
    Graft.enableSql(spark)
    assert(spark.sql(
      "SELECT nfc_normalize('cafe\u0301') = 'caf\u00e9'")
      .collect().head.getBoolean(0))
  }

  test("content-defined chunking: chunks reassemble, the expression " +
      "matches the closed-form reference, shifted shared content " +
      "re-aligns on identical chunk fingerprints (the CDC property " +
      "fixed shingles lack), and edges hold") {
    import graft.functions.CdcChunks
    def chunksOf(s: String): Seq[String] =
      Seq(s).toDF("t").select(CdcChunks.chunks($"t", 16, 5)).collect()
        .head.getSeq[String](0)
    val rnd = new scala.util.Random(11)
    val S = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val cs = chunksOf(S)
    assert(cs.nonEmpty && cs.mkString == S, "chunks must reassemble")
    assert(cs.length > 3, s"mask 1/32 over 400 chars: ${cs.length}")
    // closed-form reference (the oracle's per-position sum)
    def ref(s: String, w: Int, mb: Int): Seq[String] = {
      val cps = s.map(_.toInt) // ASCII fixture: char == code point
      val pows = {
        var x = 1L
        (0 until w).map { _ => val r = x; x = x * 257L % 2147483647L; r }
      }
      val bnds = ((w to s.length).filter { i =>
        val h = (0 until w).map(j => cps(i - 1 - j) * pows(j)).sum %
          2147483647L
        h % (1L << mb) == 0L
      } :+ s.length).distinct.sorted
      var prev = 0
      bnds.map { b => val c = s.substring(prev, b); prev = b; c }
    }
    assert(cs == ref(S, 16, 5), "incremental must equal the closed form")
    // THE property: same suffix behind different-length preambles
    // shares its chunk set past the perturbed window
    val shared = chunksOf("PREAMBLE ONE: " + S).toSet
      .intersect(chunksOf("a different, longer preamble here: " + S).toSet)
    assert(shared.nonEmpty, "shifted shared content must share chunks")
    assert(shared.subsetOf(cs.toSet + cs.head), // re-aligned tail chunks
      "shared chunks must be S's own chunks")
    // edges: empty → no chunks; below the window → one whole chunk
    assert(chunksOf("").isEmpty)
    assert(chunksOf("tiny") == Seq("tiny"))
  }

  test("semantic decontamination: a planted near-copy of a benchmark " +
      "vector flags, an orthogonal one does not; best match + rounded " +
      "score equal the brute force; clean = complement; empty bench " +
      "fails fast") {
    import graft.operators.{Decontam, Similarity}
    // bench: two orthogonal-ish anchors; corpus: a near-copy of bench
    // 100 (flag), an orthogonal vector (no flag), and a mild mix
    val bench = Seq(
      (100L, Seq(1.0, 0.0, 0.0, 0.0)),
      (101L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.99, 0.01, 0.0, 0.0)),  // ~bench 100
      (2L, Seq(0.0, 0.0, 1.0, 0.0)),    // orthogonal
      (3L, Seq(0.5, 0.5, 0.5, 0.5))     // cos = .5 to both → bench 100 by tie
    ).toDF("vec_id", "embedding")
    val got = Decontam.semReport(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", tau = 0.9)
      .orderBy($"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(got.length == 3)
    assert(got(0)._2 == 100L && got(0)._4, s"near-copy must flag: ${got(0)}")
    assert(!got(1)._4 && got(1)._3 == 0.0, s"orthogonal must not: ${got(1)}")
    // equal rounded scores tie-break to the LOWER bench id
    assert(got(2)._2 == 100L && got(2)._3 == 0.5 && !got(2)._4)
    // scores equal the scalar cosine at 6 dp
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      BigDecimal(d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(0)._3 == cos(Seq(0.99, 0.01, 0.0, 0.0), Seq(1.0, 0.0, 0.0, 0.0)))
    // clean drops exactly the flagged ids
    val kept = Decontam.semClean(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", tau = 0.9)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    intercept[IllegalArgumentException](
      Decontam.semReport(corpus, "vec_id", "embedding",
        bench.filter($"vec_id" < 0L), "vec_id", "embedding", 0.9)
        .collect())
  }

  test("weighted sampling: pure function of (id, w) — rerun/layout " +
      "invariant; uniform weight scaling preserves the draw; raising " +
      "one row's weight only improves its rank; heavy rows " +
      "overrepresented vs the corpus mean") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, sf, "documents")
    def run(df: org.apache.spark.sql.DataFrame, wCol: String) =
      Sampling.weightedSample(df, "doc_id", "lang", wCol, k = 10)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSet
    val base = run(docs, "n_chars")
    assert(run(docs.repartition(7), "n_chars") == base, "layout variant")
    // uniform scaling: priorities all halve, ranking identical
    assert(run(docs.withColumn("w2", $"n_chars" * 2L), "w2") == base)
    // heavier rows are overrepresented
    val keptMean = docs.join(
      Sampling.weightedSample(docs, "doc_id", "lang", "n_chars", 10)
        .select($"doc_id"), "doc_id")
      .agg(avg($"n_chars")).head.getDouble(0)
    val allMean = docs.agg(avg($"n_chars")).head.getDouble(0)
    assert(keptMean > allMean, s"kept $keptMean <= corpus $allMean")
    // raising ONE row's weight can only improve (lower) its priority
    val victim = base.minBy(_._3)._3
    val boosted = docs.withColumn("w3",
      when($"doc_id" === victim, $"n_chars" * 100L).otherwise($"n_chars"))
    assert(run(boosted, "w3").exists(_._3 == victim),
      "a kept row boosted 100x must stay kept")
  }

  test("weighted sampling fails fast on zero, negative, or null " +
      "weights — w <= 0 would silently never-sample (Infinity " +
      "priority) or rank-FIRST (negative priority)") {
    import graft.operators.Sampling
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val base = Seq((1L, "en", 5L), (2L, "en", 7L))
    for (bad <- Seq(0L, -3L)) {
      val df = (base :+ (3L, "en", bad)).toDF("doc_id", "lang", "w")
      val e = intercept[Exception] {
        Sampling.weightedSample(df, "doc_id", "lang", "w", k = 2).collect()
      }
      assert(chain(e).contains("positive integral"), s"w=$bad: ${chain(e)}")
    }
    val withNull = Seq((1L, "en", Some(5L)), (3L, "en", None))
      .toDF("doc_id", "lang", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(withNull, "doc_id", "lang", "w", k = 2)
        .collect()
    }
    assert(chain(e).contains("positive integral"), chain(e))
  }

  test("mrl prefix search: dPrefix = full dim == brute force " +
      "bit-for-bit; truncated prefix recall clears the floor on the " +
      "clustered fixture") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, sf, "embeddings")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = rows(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      0L, 10))
    val full = rows(Similarity.mrlTopK(emb, "vec_id", "embedding", 0L,
      k = 10, dPrefix = 64, shortlist = 10))
    assert(full == exact, "full-prefix funnel must equal brute force")
    // clustered corpus: 8-dim cluster blocks live in the HEAD dims for
    // clusters 0-1, so a 16-dim prefix separates them
    def cvec(c: Int, i: Long): Seq[Double] = {
      val v = Array.fill(64)(0.0)
      (8 * c until 8 * c + 8).foreach(d => v(d) = 1.0)
      v((8 * c + (i % 8)).toInt) += 0.2 * (((i * 7) % 13) - 6) / 13.0
      v.toSeq
    }
    val clustered = (0L until 128L).map(i => (i, cvec((i % 2).toInt, i)))
      .toDF("vec_id", "embedding")
    val ex = rows(Similarity.bruteForceTopK(clustered, "vec_id",
      "embedding", 0L, 10)).map(_._1).toSet
    val mrl = rows(Similarity.mrlTopK(clustered, "vec_id", "embedding",
      0L, k = 10, dPrefix = 16, shortlist = 24)).map(_._1).toSet
    assert(ex.intersect(mrl).size >= 9, s"mrl recall ${ex.intersect(mrl).size}/10")
  }

  test("streaming CMS ingest: estimates from the streamed store equal " +
      "the batch sketch; checkpointed replay changes nothing") {
    import graft.operators.Cms
    val docs = Tables.load(spark, sf, "documents")
    val toks = docs.select(explode(split($"text", " ")).as("tok"))
    val base = s"/tmp/graft_cmsstream_spec/${System.nanoTime()}"
    docs.write.parquet(s"$base/feed")
    Cms.buildCmsStore(docs.limit(0), "text", 4, 16, s"$base/store")
    streaming.Streams.cmsIngest(spark, s"$base/feed", docs, "text",
      s"$base/store", s"$base/ckpt")
    def est() = Cms.estimatesFromStore(spark, s"$base/store",
      toks.select($"tok").distinct(), "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = est()
    val batch = Cms.estimates(Cms.cells(docs, "text", 4, 16),
      toks.select($"tok").distinct(), "tok", 4, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch)
    streaming.Streams.cmsIngest(spark, s"$base/feed", docs, "text",
      s"$base/store", s"$base/ckpt")
    assert(est() == batch)
    // bucket-format gate (round-15 ADVICE): a store whose meta predates
    // the %2^22 pre-bound (no fmt column) assigns different buckets to
    // 137+-char tokens — probing it must fail fast, never return wrong
    // counts silently
    Seq((4, 16)).toDF("d", "w").write.mode("overwrite")
      .parquet(s"$base/store/meta")
    val e = intercept[IllegalArgumentException](est())
    assert(e.getMessage.contains("bucket-format"), e.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("readability: hand-counted words/sentences/syllables and the " +
      "exact-integer FK pair; zero-vowel words count one syllable; " +
      "empty text floors the denominator") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (0L, "The cat sat. It ran! Did it fly?"),
      (1L, "grr shh"),
      (2L, "")
    ).toDF("doc_id", "text")
    val got = CorpusStats.readability(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))).toSeq
    // doc 0: 8 words, 3 sentence runs, 8 vowel groups, 0 vowel-less
    // words -> 8 syllables; fk_num = 39*64 + 1180*8*3 - 1559*3*8 =
    // -6600, fk_den = 2400 -> grade -2.75 -> easy
    assert(got(0) == (0L, 8L, 3L, 8L, -6600L, 2400L, "easy"), got(0))
    // doc 1: 2 vowel-less words -> 2 syllables (1 each); s floored at 1
    // fk_num = 39*4 + 1180*2*1 - 1559*1*2 = -602; fk_den = 200
    assert(got(1) == (1L, 2L, 1L, 2L, -602L, 200L, "easy"), got(1))
    // doc 2: empty -> 0 words/0 syllables, w1 floor = 1:
    // fk_num = 39 - 1559 = -1520, fk_den = 100
    assert(got(2) == (2L, 0L, 1L, 0L, -1520L, 100L, "easy"), got(2))
  }

  test("encodingAnomalies: U+FFFD, C1 controls, and the UTF-8-as-" +
      "Latin-1 digraph each count; clean ASCII and legitimate Latin-1 " +
      "text do not flag") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (0L, "bad\ufffd and worse\ufffd\ufffd"),          // 3 replacement chars
      (1L, "ctl\u0085mid\u0092end"),                    // 2 C1 controls
      (2L, "caf\u00c3\u00a9 moji"),                     // 1 mojibake digraph
      (3L, "plain clean ascii"),
      (4L, "caf\u00e9 r\u00e9sum\u00e9")                // real Latin-1: clean
    ).toDF("doc_id", "text")
    val got = CorpusStats.encodingAnomalies(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSeq
    assert(got == Seq(
      (3L, 0L, 0L, 1), (0L, 2L, 0L, 1), (0L, 0L, 1L, 1),
      (0L, 0L, 0L, 0), (0L, 0L, 0L, 0)), got.toString)
  }

  test("vocabGrowth: types count in their FIRST bucket, cumsums " +
      "accumulate, token-only buckets report zero new vocab") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (0L, "a b a"),        // bucket 0: tokens 3, new types a,b
      (1L, "b c"),          // bucket 0: tokens 2, new type c
      (2L, "a b c"),        // bucket 1: tokens 3, nothing new
      (5L, "c d")           // bucket 2: tokens 2, new type d
    ).toDF("doc_id", "text")
    val got = CorpusStats.vocabGrowth(docs, "doc_id", "text", 2L)
      .orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (0L, 5L, 5L, 3L, 3L),
      (1L, 3L, 8L, 0L, 3L),
      (2L, 2L, 10L, 1L, 4L)), got.toString)
    intercept[IllegalArgumentException](
      CorpusStats.vocabGrowth(docs, "doc_id", "text", 0L))
  }

  test("binary quantization: sign-pack goldens (-0.0 packs set, " +
      "partial last word), hamming golden, full shortlist makes " +
      "binaryKnnJoin BIT-IDENTICAL to exact knnJoin, null fails fast") {
    import graft.functions.VectorExprs.{signPack, hammingDist}
    val vec = (0 until 64).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val packed = Seq((1L, vec)).toDF("id", "v")
      .select(signPack($"v")).head.getSeq[Long](0)
    assert(packed == Seq(0x55555555L, 0x55555555L), packed.toString)
    val part = Seq((1L, Seq(-0.0, -1.0, 2.0))).toDF("id", "v")
      .select(signPack($"v")).head.getSeq[Long](0)
    assert(part == Seq(0x5L), part.toString)
    val hd = Seq((Seq(0x55555555L, 0x55555555L),
        Seq(0x55555555L, 0x55555554L))).toDF("a", "b")
      .select(hammingDist($"a", $"b")).head.getInt(0)
    assert(hd == 1, hd.toString)
    // strongest approx-vs-exact pin (the s11 nProbe=nCells rule):
    // shortlist >= corpus-1 => identical to the exact join
    val emb = Tables.load(spark, sf, "embeddings")
    def tup(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"rk", $"id", $"score").orderBy($"qid", $"rk")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSeq
    assert(tup(Similarity.binaryKnnJoin(emb, "vec_id", "embedding",
        0L until 5L, 3, shortlist = 1 << 20)) ==
      tup(Similarity.knnJoin(emb, "vec_id", "embedding", 0L until 5L, 3)))
    // null element fails fast (the KernelChecks rule)
    val withNull = Seq((1L, Seq(Option(1.0), None))).toDF("id", "v")
    val e = intercept[Exception](
      withNull.select(signPack($"v")).collect())
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(e).contains("sign_pack"), chain(e))
  }

  test("canonical dedup selection (t89 rule): the kept doc is the " +
      "highest-QUALITY cluster member — NOT the min id d12 ships; " +
      "quality ties fall back to the lowest id") {
    import graft.operators.Dedup
    import graft.functions.QualityExpr
    import org.apache.spark.sql.expressions.Window
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "solitary unrelated document")
    ).toDF("doc_id", "text")
    val pairs = Seq((10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(corpus, "doc_id", pairs)
    val scored = corpus.select($"doc_id",
      QualityExpr.qualityScore($"text").as("q"))
    val w = Window.partitionBy($"comp").orderBy($"q".desc, $"doc_id".asc)
    val kept = comps.join(scored, $"id" === $"doc_id")
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"comp", $"doc_id").orderBy($"comp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // cluster {10, 11}: doc 11 has 10 words vs 9 -> higher length term
    // -> higher q, wins despite the HIGHER id; singleton keeps itself
    assert(kept == Seq((10L, 11L), (12L, 12L)), kept.toString)
  }

  test("binary index lifecycle: build+append == one-shot rebuild, " +
      "search == in-memory binaryKnnJoin, duplicate append and " +
      "drained stream replay are no-ops, the Hamming scan prunes to " +
      "(id, code), missing index fails fast") {
    val emb = Tables.load(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("binidx").toString
    val old = emb.filter($"vec_id" % 2 === 0)
    val nw = emb.filter($"vec_id" % 2 === 1)
    Similarity.buildBinaryIndex(old, "vec_id", "embedding", s"$dir/inc")
    Similarity.appendToBinaryIndex(nw, "vec_id", "embedding", s"$dir/inc")
    Similarity.buildBinaryIndex(emb, "vec_id", "embedding", s"$dir/full")
    def res(p: String) = Similarity
      .searchBinaryIndex(spark, p, 0L until 5L, 3, 16)
      .orderBy($"qid", $"rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).toSeq
    val full = res(s"$dir/full")
    assert(res(s"$dir/inc") == full, "incremental == rebuilt")
    val mem = Similarity
      .binaryKnnJoin(emb, "vec_id", "embedding", 0L until 5L, 3, 16)
      .orderBy($"qid", $"rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).toSeq
    assert(full == mem, "store == in-memory")
    val before = spark.read.parquet(s"$dir/inc/codes").count()
    Similarity.appendToBinaryIndex(nw, "vec_id", "embedding", s"$dir/inc")
    assert(spark.read.parquet(s"$dir/inc/codes").count() == before,
      "duplicate append is a no-op")
    val plan = Similarity
      .searchBinaryIndex(spark, s"$dir/full", 0L until 5L, 3, 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint,code:array<bigint>>"),
      "the Hamming stage must scan only (id, code):\n" + plan)
    intercept[IllegalArgumentException](
      Similarity.searchBinaryIndex(spark, s"$dir/none", Seq(0L), 1, 4))
    // streaming ingest == batch append; drained replay is a no-op
    Similarity.buildBinaryIndex(old, "vec_id", "embedding", s"$dir/st")
    nw.write.parquet(s"$dir/feed")
    graft.streaming.Streams.binaryIngest(spark, s"$dir/feed", emb,
      "vec_id", "embedding", s"$dir/st", s"$dir/ckpt")
    assert(res(s"$dir/st") == full, "stream ingest == rebuilt")
    graft.streaming.Streams.binaryIngest(spark, s"$dir/feed", emb,
      "vec_id", "embedding", s"$dir/st", s"$dir/ckpt")
    assert(res(s"$dir/st") == full, "drained replay is a no-op")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("ivfBinaryKnnJoin: with nProbe = nCells AND full shortlist the " +
      "hybrid is BIT-IDENTICAL to exact knnJoin (both relaxations " +
      "removed — the s11/s20 pins composed)") {
    val emb = Tables.load(spark, sf, "embeddings")
    val cents = Similarity.fitCentroids(emb, "vec_id", "embedding",
      nCells = 4, Similarity.LloydIters)
    def tup(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"rk", $"id", $"score").orderBy($"qid", $"rk")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSeq
    assert(tup(Similarity.ivfBinaryKnnJoin(emb, "vec_id", "embedding",
        0L until 5L, 3, nProbe = 4, shortlist = 1 << 20, cents = cents)) ==
      tup(Similarity.knnJoin(emb, "vec_id", "embedding", 0L until 5L, 3)))
    // and with a REAL shortlist it equals binaryKnnJoin when every
    // cell is probed (the cell filter relaxed, the Hamming one kept)
    assert(tup(Similarity.ivfBinaryKnnJoin(emb, "vec_id", "embedding",
        0L until 5L, 3, nProbe = 4, shortlist = 16, cents = cents)) ==
      tup(Similarity.binaryKnnJoin(emb, "vec_id", "embedding",
        0L until 5L, 3, shortlist = 16)))
  }

  test("ngramNovelty: shared grams are not novel, within-doc repeats " +
      "stay novel (distinct semantics), short docs report zero grams") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (0L, "a b c d"),            // grams (a b c),(b c d) shared with 1
      (1L, "a b c d"),
      (2L, "x y z w"),            // 2 grams, both unique
      (3L, "e f g e f g"),        // 4 gram positions, 3 distinct, all novel
      (4L, "too short")           // < 3 tokens -> no grams
    ).toDF("doc_id", "text")
    val got = CorpusStats.ngramNovelty(docs, "doc_id", "text", 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (0L, 2L, 0L), (1L, 2L, 0L), (2L, 2L, 2L), (3L, 3L, 3L)),
      got.toString)
  }
}
