package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: typed mapPartitions decode stub, frame sampling,
  * metadata. Exact values pinned on a controlled fixture. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // 130 bytes: 'A'(65) ×130 → frames of 64: [64, 64, 2]
  private def media = Seq(
    (1L, Array.fill[Byte](130)(65)),
    (2L, "abc".getBytes("UTF-8")),
    (3L, Array.emptyByteArray)
  ).toDF("media_id", "data")

  test("perceptual hash: signatures are non-negative and match a " +
      "driver replay; planted near-dup pairs within hamming<=3 via the " +
      "blocked join, brute-force parity, unrelated payloads excluded") {
    import graft.operators.Dedup
    // 62 cells × 4 bytes each; alternating strong low/high cells are
    // robust to a single-cell flip (threshold ~ the midpoint)
    def pattern(flip: Set[Int]): Array[Byte] =
      Array.tabulate(62 * 4) { i =>
        val cell = i / 4
        val hi = (cell % 2 == 0) ^ flip(cell)
        (if (hi) 200 else 10).toByte
      }
    val rows = Seq(
      (0L, pattern(Set.empty)),
      (1L, pattern(Set(5))),          // one flipped cell → hamming 1
      (2L, pattern(Set(7, 20, 33))),  // three flips → hamming 3
      (3L, pattern((0 until 62).toSet)), // inverted → far
      (4L, "short".getBytes("UTF-8")))
    val df = rows.toDF("media_id", "data")
    val ph = Multimodal.perceptualHash(df, "media_id", "data")
      .orderBy($"media_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(ph.forall(_._2 >= 0), "62-cell hash must be non-negative")
    // driver replay of the integer rule
    rows.foreach { case (id, bytes) =>
      val px = bytes.map(_ & 0xff)
      val n = px.length.toLong
      val total = px.map(_.toLong).sum
      var want = 0L
      for (k <- 0 until 62) {
        val lo = (k * n / 62).toInt; val hi = ((k + 1) * n / 62).toInt
        val s = px.slice(lo, hi).map(_.toLong).sum
        if (hi > lo && s * n > total * (hi - lo)) want |= 1L << k
      }
      assert(ph.find(_._1 == id).get._2 == want, s"id $id")
    }
    val got = Dedup.hammingNearDup64(
      Multimodal.perceptualHash(df, "media_id", "data")
        .select($"media_id".as("id"), $"phash".as("sh")), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (a, pa) <- ph; (b, pb) <- ph
      if a < b && java.lang.Long.bitCount(pa ^ pb) <= 3
    } yield (a, b)).toSet
    assert(got == brute, s"blocked $got vs brute $brute")
    assert(got.contains((0L, 1L)) && got.contains((0L, 2L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("persisted signature index: build + streamed append + probe " +
      "finds the planted near-dups (== brute force over index × batch); " +
      "a replayed ingest leaves the probe exactly-once; kind mismatch " +
      "and missing index fail fast") {
    import graft.operators.Dedup
    def pattern(flip: Set[Int]): Array[Byte] =
      Array.tabulate(62 * 4) { i =>
        val cell = i / 4
        val hi = (cell % 2 == 0) ^ flip(cell)
        (if (hi) 200 else 10).toByte
      }
    val built = Seq((0L, pattern(Set.empty)), (1L, pattern(Set(40, 50))))
      .toDF("media_id", "data")
    val streamed = Seq((2L, pattern(Set(9))),
      (3L, pattern((0 until 62).toSet)))
      .toDF("media_id", "data")
    val probeBatch = Seq(
      (10L, pattern(Set(5))),            // near 0 (h=1), near 1 (h=3), near 2 (h=2)
      (11L, pattern((0 until 62).map(62 - 1 - _).toSet)), // near 3
      (12L, "unrelated".getBytes("UTF-8")))
      .toDF("media_id", "data")
    val base = s"/tmp/graft_sigidx_spec/${System.nanoTime()}"
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Multimodal.perceptualHash(df, "media_id", "data")
        .select($"media_id".as("id"), $"phash".as("sh"))
    Dedup.buildSigIndex(sigs(built), "phash62", s"$base/idx")
    // streamed half arrives via the streaming ingest
    streamed.write.parquet(s"$base/feed")
    streaming.Streams.phashIngest(spark, s"$base/feed", streamed,
      "media_id", "data", s"$base/idx", s"$base/ckpt")
    def probeNow() = Dedup.probeSigIndex(sigs(probeBatch), "phash62",
      s"$base/idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val got = probeNow()
    // brute force over (index ids) × (probe ids)
    val idxSigs = sigs(built.union(streamed)).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val probeSigs = sigs(probeBatch).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, pa) <- idxSigs; (b, pb) <- probeSigs
      if java.lang.Long.bitCount(pa ^ pb) <= 3
    } yield (a, b, java.lang.Long.bitCount(pa ^ pb).toLong)).toSet
    assert(got == brute, s"probe $got vs brute $brute")
    assert(got.map(p => (p._1, p._2)).contains((0L, 10L)) &&
      got.map(p => (p._1, p._2)).contains((3L, 11L)))
    assert(!got.exists(_._2 == 12L))
    // checkpointed replay appends nothing; even a forced duplicate
    // append stays exactly-once at the probe (distinct pairs)
    streaming.Streams.phashIngest(spark, s"$base/feed", streamed,
      "media_id", "data", s"$base/idx", s"$base/ckpt")
    Dedup.appendToSigIndex(sigs(streamed), "phash62", s"$base/idx")
    assert(probeNow() == brute)
    // probing a batch whose signatures are already IN the index must
    // not report each doc as its own hamming-0 near-dup
    val selfProbe = Dedup.probeSigIndex(sigs(streamed), "phash62",
      s"$base/idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!selfProbe.exists(p => p._1 == p._2), s"self pairs in $selfProbe")
    val kindErr = intercept[IllegalArgumentException] {
      Dedup.probeSigIndex(sigs(probeBatch), "simhash64", s"$base/idx")
    }
    assert(kindErr.getMessage.contains("kind mismatch"))
    val missErr = intercept[IllegalArgumentException] {
      Dedup.appendToSigIndex(sigs(streamed), "phash62", s"$base/nowhere")
    }
    assert(missErr.getMessage.contains("buildSigIndex"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("m06 dctHash: EXACT invariance under uniform brightness shift " +
      "and positive contrast scale; planted near-dup pairs surface " +
      "through hammingNearDup64; clipped highlights stay closer under " +
      "DCT than under aHash") {
    import graft.operators.{Dedup, Multimodal}
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // a structured 'image': 64 constant 8-byte boxes — a gradient with a
    // bright block. Box-aligned values keep the integer box MEANS exact,
    // so shift (+d) and contrast (×2) transform them exactly too.
    val base = Array.tabulate(512) { i =>
      val box = i / 8
      val g = 20 + box
      (if (box >= 25 && box < 32) g + 40 else g).toByte
    }
    def shifted(d: Int) = base.map(b => ((b & 0xff) + d).toByte)   // ≤ 153
    def contrast2 = base.map(b => ((b & 0xff) * 2).toByte)         // ≤ 246
    def noisy = { val a = base.clone(); a(100) = (a(100) + 9).toByte
      a(300) = (a(300) - 7).toByte; a }
    def clipped(d: Int) = base.map { b =>
      val v = (b & 0xff) + d; (if (v > 255) 255 else v).toByte }
    val rows = Seq(0L -> base, 1L -> shifted(30), 2L -> noisy,
      3L -> Array.tabulate(512)(i => (((i * 31) ^ (i >> 2)) & 0xff).toByte))
      .toDF("media_id", "data")
    val h = Multimodal.dctHash(rows, "media_id", "data")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(h(0L) == h(1L), "uniform brightness shift must not move the hash")
    val hc = Multimodal.dctHash(
      Seq(10L -> contrast2).toDF("media_id", "data"), "media_id", "data")
      .collect().head.getLong(2)
    assert(hc == h(0L), "positive contrast scale must not move the hash")
    assert(ham(h(0L), h(2L)) <= 3, s"local noise drifted ${ham(h(0L), h(2L))}")
    assert(ham(h(0L), h(3L)) > 3, "unrelated payload must not collide")
    // pigeonhole pair join finds exactly the planted near-dups
    val sigs = Multimodal.dctHash(rows, "media_id", "data")
      .select($"media_id".as("id"), $"dhash".as("sh"))
    val pairs = Dedup.hammingNearDup64(sigs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)), pairs.toString)
    // clipping breaks exact shift-cancellation for BOTH hashes, but the
    // global-band DCT drifts no more than the local-cell aHash
    val cl = Seq(20L -> base, 21L -> clipped(150)).toDF("media_id", "data")
    val dcl = Multimodal.dctHash(cl, "media_id", "data")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val acl = Multimodal.perceptualHash(cl, "media_id", "data")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ham(dcl(20L), dcl(21L)) <= ham(acl(20L), acl(21L)),
      s"dct ${ham(dcl(20L), dcl(21L))} vs ahash ${ham(acl(20L), acl(21L))}")
  }

  test("extractFeatures: byte-derived features, per-partition execution") {
    val got = Multimodal.extractFeatures(media, "media_id", "data")
      .orderBy($"media_id").collect()
    assert(got(0).getInt(1) == 130)           // n_bytes
    assert(got(0).getInt(2) == 3)             // ceil(130/64) frames
    assert(got(0).getDouble(3) == 65.0)       // all bytes are 'A'
    assert(got(1).getInt(2) == 1)
    // 'abc' = 97,98,99 → mean 98
    assert(got(1).getDouble(3) == 98.0)
    assert(got(2).getInt(2) == 0 && got(2).getDouble(3) == 0.0)
    // feature vector has the declared fixed width
    assert(got(0).getSeq[Double](4).length == Multimodal.FeatDim)
  }

  test("sampleFrames keeps every stride-th frame with correct sizes") {
    val got = Multimodal.sampleFrames(media, "media_id", "data", stride = 2)
      .orderBy($"media_id", $"frame_idx").collect()
    val m1 = got.filter(_.getLong(0) == 1L)
    // frames 0,1,2 → stride 2 keeps 0 and 2; frame 2 has 130-128=2 bytes
    assert(m1.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(m1.map(_.getInt(2)).toSeq == Seq(64, 2))
  }

  test("mediaMeta stays expression-level (no serialization barrier)") {
    val df = Multimodal.mediaMeta(
      media.withColumn("kind", lit("text")), "media_id", "data", "kind")
    assert(df.orderBy($"media_id").collect()(0).getLong(2) == 130L)
    // plan contains no DeserializeToObject (mapPartitions) node
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan.take(300))
  }

  /** Encode a tiny image with exactly-known pixels through the JDK's
    * own writer, so the decode assertion is self-contained. */
  private def imageBytes(fmt: String, lumas: Seq[Seq[Int]]): Array[Byte] = {
    val h = lumas.length; val w = lumas.head.length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = lumas(y)(x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v) // gray → luma == v exactly
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("real image decode: PNG and BMP payloads decode to true pixels " +
      "(known mean luma), text payloads keep the byte fallback") {
    // 8×2 gray gradient: lumas 10,30,..,150 twice → mean 80, 16 pixels
    val lumas = Seq.tabulate(2, 8)((_, x) => 10 + 20 * x)
    val png = imageBytes("png", lumas)
    val bmp = imageBytes("bmp", lumas)
    assert(Multimodal.isImage(png) && Multimodal.isImage(bmp))
    val df = Seq((1L, png), (2L, bmp),
      (3L, "BMnot really a bitmap".getBytes("UTF-8"))).toDF("media_id", "data")
    val got = Multimodal.extractFeatures(df, "media_id", "data")
      .orderBy($"media_id").collect()
    // n_bytes is the PAYLOAD size, pixel stats come from the decode
    assert(got(0).getInt(1) == png.length && got(1).getInt(1) == bmp.length)
    assert(got(0).getDouble(3) == 80.0, s"png mean ${got(0).getDouble(3)}")
    assert(got(1).getDouble(3) == 80.0, s"bmp mean ${got(1).getDouble(3)}")
    assert(got(0).getInt(2) == 1, "16 pixels → one 64-px frame")
    // magic-prefixed text is not decodable → byte fallback, mean = mean
    // of the UTF-8 bytes
    val bytes = "BMnot really a bitmap".getBytes("UTF-8").map(_ & 0xff)
    assert(got(2).getDouble(3) == bytes.sum.toDouble / bytes.length)
    // frame sampling sees the same decoded pixels
    val frames = Multimodal.sampleFrames(
      df.filter($"media_id" === 1L), "media_id", "data", stride = 1).collect()
    assert(frames.length == 1 && frames(0).getInt(2) == 16 &&
      frames(0).getDouble(3) == 80.0)
  }

  test("intensityCard: hand-computed histogram flags on the REAL decode " +
      "path (a clipped-white BMP reads hi + low_contrast) and the byte " +
      "stub; empty payloads read all-false") {
    // 8×2 all-white (luma 255): every pixel in bucket 15 → occ 1,
    // n_hi 16, hi (5·16 > 2·16), low_contrast; dark false
    val white = imageBytes("bmp", Seq.tabulate(2, 8)((_, _) => 255))
    // 8×2 gradient 10..150: buckets 0..9 → spread, no flags
    val grad = imageBytes("bmp", Seq.tabulate(2, 8)((_, x) => 10 + 20 * x))
    val df = Seq((1L, white), (2L, grad),
      (3L, "    ".getBytes("UTF-8")),     // stub: 4 spaces → bucket 2 only
      (4L, Array.emptyByteArray)).toDF("media_id", "data")
    val got = Multimodal.intensityCard(df, "media_id", "data")
      .orderBy($"media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7),
        r.getBoolean(8)))
    assert(got(0) == ((1L, 16L, 1, 0, 0L, 16L, false, true, true)),
      got(0).toString)
    // gradient: lumas 10,30,50,70,90,110,130,150 ×2 → buckets
    // 0,1,3,4,5,6,8,9 → occ 8, span 9, dark = 6 px < 64 ×2 = 6? lumas
    // 10,30,50 are < 64 → 3 per row × 2 rows = 6; hi: 130,150 ≥ 112
    // → 4; flags: 4·6 > 16 true (dark), 5·4 > 32 false
    assert(got(1) == ((2L, 16L, 8, 9, 6L, 4L, true, false, false)),
      got(1).toString)
    assert(got(2) == ((3L, 4L, 1, 0, 4L, 0L, true, false, true)),
      got(2).toString)
    assert(got(3) == ((4L, 0L, 0, 0, 0L, 0L, false, false, false)),
      got(3).toString)
  }

  test("resizeImages: nearest-neighbor downscale re-encodes to exact " +
      "known pixels; non-image payloads pass through") {
    // 8×2 → 4×1 nearest-neighbor: deterministic source-pixel picks
    val lumas = Seq.tabulate(2, 8)((_, x) => 10 + 20 * x)
    val png = imageBytes("png", lumas)
    val df = Seq((1L, png),
      (2L, "not an image".getBytes("UTF-8"))).toDF("media_id", "data")
    val got = Multimodal.resizeImages(df, "media_id", "data", w = 4, h = 1)
      .orderBy($"media_id").collect()
    assert(got(0).getInt(2) == 4 && got(0).getInt(3) == 1)
    // decode the resized payload back: 4 pixels drawn from the source
    // grid (every 2nd column, one of the two identical rows)
    val px = Multimodal.decodePixels(got(0).getAs[Array[Byte]](1))
    assert(px.length == 4, px.toSeq)
    assert(px.forall(v => lumas.flatten.contains(v)), px.toSeq)
    // nearest-neighbor at exactly 2:1 keeps a strictly increasing ramp
    assert(px.sliding(2).forall(p => p(0) < p(1)), px.toSeq)
    // the text payload is untouched
    assert(got(1).getInt(2) == -1 &&
      new String(got(1).getAs[Array[Byte]](1), "UTF-8") == "not an image")
  }

  test("audioStats: hand-computed samples (byte-96 bias), bytes >= 128 " +
      "read unsigned, zero-crossing counts sign CHANGES only, empty " +
      "and null payloads report zeros") {
    // bytes (32, 97, 255): samples -64, 1, 159 -> peak 159,
    // sum_sq 4096+1+25281 = 29378, one sign change
    val rows = Seq(
      (1L, Array[Byte](32, 97, -1)),
      (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "data")
    val got = Multimodal.audioStats(rows, "id", "data")
      .orderBy($"media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 3L, 159L, 29378L, 1L),
      (2L, 0L, 0L, 0L, 0L),
      (3L, 0L, 0L, 0L, 0L)), got.toString)
  }

  test("audioActivity: windowed energy gate, longest run, partial last " +
      "window uses its own length, empty/null payloads report zeros") {
    // window=4, thr=100 (mean energy per sample).
    // id 1: 4× byte 96 (s=0, silent) then 8× byte 32 (s=-64, energy
    //       4096 each) → windows [silent, active, active] → run 2
    // id 2: 5 bytes of 97 (s=1) → 2 windows (4+1), both silent
    // id 3: 2 bytes of 32 → ONE partial window, energy 8192 > 100·2
    val rows = Seq(
      (1L, Array.fill[Byte](4)(96) ++ Array.fill[Byte](8)(32)),
      (2L, Array.fill[Byte](5)(97)),
      (3L, Array.fill[Byte](2)(32)),
      (4L, Array.empty[Byte]),
      (5L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "data")
    val got = Multimodal.audioActivity(rows, "id", "data",
        window = 4, thrPerSample = 100L)
      .orderBy($"media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 2L),
      (2L, 2L, 0L, 0L),
      (3L, 1L, 1L, 1L),
      (4L, 0L, 0L, 0L),
      (5L, 0L, 0L, 0L)), got.toString)
  }

  test("audioActivity max_run resets across silent gaps") {
    // active, silent, active, active → max_run 2 not 3
    val pay = Array.fill[Byte](4)(32) ++ Array.fill[Byte](4)(96) ++
      Array.fill[Byte](8)(32)
    val rows = Seq((1L, pay)).toDF("id", "data")
    val got = Multimodal.audioActivity(rows, "id", "data", 4, 100L)
      .collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((4L, 3L, 2L)))
  }

  test("shotCard: planted intensity steps cut shots at the cross-" +
      "multiplied threshold; tail frame compares by MEAN not total; " +
      "empty payloads read zeros") {
    // frames of 4 @ thr 16: [32×4] | [32,32,96,96] (mean 64, step 32 →
    // cut) | [96×4] (step 32 → cut) | [96] tail (mean 96, step 0 — the
    // cross-multiplied compare: |96·4 − 384·1| = 0, NOT total-vs-total)
    val pay = Array.fill[Byte](4)(32) ++ Array[Byte](32, 32, 96, 96) ++
      Array.fill[Byte](4)(96) ++ Array[Byte](96)
    val got = Multimodal.shotCard(
        Seq((1L, pay), (2L, Array.empty[Byte])).toDF("id", "data"),
        "id", "data", frame = 4, thr = 16L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((4L, 3L, 2L)), got.toString) // runs 1,1,2
    assert(got(2L) == ((0L, 0L, 0L)), got.toString)
  }

  // hand-assembled golden WAV bytes: 44-byte canonical PCM header.
  // `bits` 8 → unsigned samples, 16 → signed little-endian.
  private def wavBytes(bits: Int, data: Array[Byte],
                       rate: Int = 8000): Array[Byte] = {
    val blockAlign = bits / 8
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }

  test("real WAV decode: golden 8-bit and 16-bit PCM bytes decode to " +
      "true samples; corrupt RIFF falls back to the stub") {
    // 8-bit PCM is UNSIGNED: bytes (0, 128, 255) → samples (−128, 0, 127)
    val w8 = wavBytes(8, Array[Byte](0, 128.toByte, 255.toByte))
    assert(Multimodal.decodeSamples(w8).toSeq == Seq(-128, 0, 127))
    // 16-bit PCM signed LE: 0x0100 → 256, 0xFF7F → 32767, 0x0080 → −32768
    val w16 = wavBytes(16, Array[Byte](0, 1, 0xFF.toByte, 0x7F, 0, 0x80.toByte))
    assert(Multimodal.decodeSamples(w16).toSeq == Seq(256, 32767, -32768))
    // audioStats over the 16-bit WAV: real sign changes + exact moments
    val got = Multimodal.audioStats(
      Seq((1L, w16)).toDF("id", "data"), "id", "data").collect().head
    assert(got.getLong(1) == 3L)                  // n_samples: FRAMES, not bytes
    assert(got.getLong(2) == 32768L)              // peak
    assert(got.getLong(3) == 256L * 256 + 32767L * 32767 + 32768L * 32768)
    assert(got.getLong(4) == 1L)                  // 32767 → −32768
    // a merely magic-prefixed payload (truncated header) must fall back
    // to the byte−96 stub, never fail the row
    val corrupt = "RIFFxxxxWAVE garbage".getBytes("US-ASCII")
    assert(Multimodal.decodeSamples(corrupt).toSeq ==
      corrupt.toSeq.map(b => (b & 0xFF) - 96))
    // non-RIFF payloads take the stub path untouched
    val plain = "hello".getBytes("US-ASCII")
    assert(Multimodal.decodeSamples(plain).toSeq ==
      plain.toSeq.map(b => (b & 0xFF) - 96))
    // the FAST PATH declines structurally-lying containers (round-17
    // review): a data chunk declaring more bytes than the payload has,
    // and a fmt chunk shorter than the 16 bytes PCM needs — javax.sound
    // (not a fabricated clamp) decides those
    val lying = wavBytes(8, Array[Byte](1, 2, 3)).clone()
    lying(40) = 100 // data-size LE32 field at offset 40 in the 44-byte header
    assert(Multimodal.parsePcmWav(lying) == null)
    val shortFmt = wavBytes(8, Array[Byte](1, 2, 3)).clone()
    shortFmt(16) = 2 // fmt-size field: declares 2 of the 16 bytes read
    assert(Multimodal.parsePcmWav(shortFmt) == null)
  }

  test("wrapPcm8Wav: wrap-then-decode is the byte - 128 identity (the " +
      "m09 oracle contract), empty payloads included") {
    val rows = Seq((1L, "Az ~".getBytes("US-ASCII")),
      (2L, Array.empty[Byte])).toDF("id", "data")
    val wrapped = Multimodal.wrapPcm8Wav(rows, "id", "data")
    val got = wrapped.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(Multimodal.isWav(got(1L)))
    assert(Multimodal.decodeSamples(got(1L)).toSeq ==
      "Az ~".getBytes("US-ASCII").toSeq.map(b => (b & 0xFF) - 128))
    assert(Multimodal.decodeSamples(got(2L)).isEmpty)
  }
}
