package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines. Media payloads are opaque `binary` columns with typed
  * metadata; decode / feature-extraction / frame-sampling run as typed
  * `mapPartitions`/`flatMap` over the bytes — the Scala analog of
  * `mapInPandas` (same batch-iterator shape, executor-side, no
  * driver collect).
  *
  * The codec step is REAL for images the JDK can decode — PNG, BMP,
  * JPEG, GIF via `javax.imageio` (no external libraries needed): a
  * payload carrying an image magic header decodes to per-pixel BT.601
  * luma. Audio/video and unrecognized payloads fall back to
  * `fakeDecode` (deterministic pseudo-pixels from the bytes), keeping
  * the plumbing — schema, partitioning, batch iteration, output shape
  * — exercised for every media kind; swapping in a full codec suite
  * still changes one function.
  */
object Multimodal {

  /** Decoded per-media features. `feat` is a fixed-width embedding-like
    * vector — the shape a downstream ANN/similarity stage consumes. */
  final case class MediaFeatures(media_id: Long, n_bytes: Int, n_frames: Int,
                                 mean_intensity: Double, feat: Array[Double])

  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Int,
                         intensity: Double)

  val FrameSize = 64
  val FeatDim = 4

  /** STUB codec for non-image payloads: deterministic "pixels" from raw
    * bytes — keeps the distributed plumbing testable for media kinds
    * this environment cannot decode (audio/video). */
  private[graft] def fakeDecode(bytes: Array[Byte]): Array[Int] =
    bytes.map(b => (b & 0xff))

  /** True when the payload starts with a magic header of an image
    * format the JDK's ImageIO decodes out of the box. */
  private[graft] def isImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G') ||
      (bytes(0) == 'B' && bytes(1) == 'M') ||
      (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) ||
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'))

  /** Decode: real pixels (integer BT.601 luma, row-major) when the
    * payload is a decodable image; `fakeDecode` otherwise. Corrupt or
    * merely magic-prefixed payloads (e.g. text starting with "BM") fall
    * back too — ImageIO returns null / throws and we never fail a row. */
  private[graft] def decodePixels(bytes: Array[Byte]): Array[Int] =
    if (!isImage(bytes)) fakeDecode(bytes)
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) fakeDecode(bytes)
      else {
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            out(y * w + x) = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        out
      }
    } catch { case _: java.io.IOException => fakeDecode(bytes) }

  /** Feature extraction over a media table: one pass, executor-side,
    * partition-parallel. Input needs (idCol: long, dataCol: binary). */
  def extractFeatures(df: DataFrame, idCol: String, dataCol: String): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val px = decodePixels(bytes)
        val nFrames = (px.length + FrameSize - 1) / FrameSize
        val mean = if (px.isEmpty) 0.0 else px.sum.toDouble / px.length
        val feat = Array.tabulate(FeatDim) { k =>
          val slice = px.indices.filter(_ % FeatDim == k).map(px)
          if (slice.isEmpty) 0.0 else slice.sum.toDouble / slice.length
        }
        MediaFeatures(id, bytes.length, nFrames, mean, feat)
      }
    }(Encoders.product[MediaFeatures]).toDF()
  }

  final case class IntensityCard(media_id: Long, n_px: Long, occ: Int,
                                 span: Int, n_dark: Long, n_hi: Long,
                                 dark: Boolean, hi: Boolean,
                                 low_contrast: Boolean)

  /** Per-media intensity-DISTRIBUTION card — the histogram observable
    * next to [[extractFeatures]]' means (exposure/contrast QA is the
    * first image-curation gate; for the stub regime the same code
    * reads byte-value structure): 16-bucket histogram over
    * [[decodePixels]] output (real luminance for decodable containers,
    * byte identity otherwise), then
    *   occ   = occupied buckets, span = max − min occupied,
    *   n_dark = px in buckets 0–3 (< 64), n_hi = px in bucket 7+
    *            (≥ 112 — for real 0–255 luminance this is the upper
    *            mid-tones-and-highlights half-range),
    *   dark ⟺ 4·n_dark > n_px, hi ⟺ 5·n_hi > 2·n_px,
    *   low_contrast ⟺ 0 < occ ≤ 2
    * — every flag cross-multiplied, no division (cuts measured against
    * the corpus base rates before the oracle was written: dark base
    * ≤ 0.19, hi base ≤ 0.36, occ base = 3 — the s24 non-vacuous
    * rule). Empty payloads read all-false. One typed executor pass;
    * pixels are decoded once and never leave the task. */
  def intensityCard(df: DataFrame, idCol: String,
                    dataCol: String): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val px = decodePixels(bytes)
        val hist = new Array[Long](16)
        px.foreach(p => hist(p >> 4) += 1L)
        val occIdx = hist.indices.filter(hist(_) > 0L)
        val occ = occIdx.length
        val span = if (occ == 0) 0 else occIdx.max - occIdx.min
        val nDark = hist(0) + hist(1) + hist(2) + hist(3)
        val nHi = (7 until 16).map(hist).sum
        IntensityCard(id, px.length.toLong, occ, span, nDark, nHi,
          4L * nDark > px.length, 5L * nHi > 2L * px.length,
          occ > 0 && occ <= 2)
      }
    }(Encoders.product[IntensityCard]).toDF()
  }

  final case class AudioStats(media_id: Long, n_samples: Long,
                              peak: Long, sum_sq: Long, zero_cross: Long)

  /** True when the payload starts with the RIFF/WAVE magic — the audio
    * twin of [[isImage]]. */
  private[graft] def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E'

  /** AUDIO decode: REAL samples via `javax.sound.sampled` when the
    * payload is a decodable RIFF/WAVE (the round-9 javax.imageio move,
    * applied to audio — no external codecs needed for PCM WAV): 8-bit
    * PCM is unsigned per the WAV spec (s = byte − 128), 16-bit PCM is
    * signed with the container's endianness, channels stay interleaved
    * (stats over all channels). Corrupt or merely magic-prefixed
    * payloads fall back to the documented STUB (each byte one 8-bit
    * sample biased at 96, s = (byte & 0xFF) − 96 — chosen so ASCII
    * test payloads produce a sign-alternating waveform), exactly like
    * [[decodePixels]] — a decode never fails a row. Sample depths
    * javax.sound reads but we don't map (24/32-bit) fall back too,
    * loudly documented here rather than silently truncated. */
  private[graft] def decodeSamples(bytes: Array[Byte]): Array[Int] = {
    def stub: Array[Int] = bytes.map(b => (b & 0xFF) - 96)
    if (!isWav(bytes)) stub
    else {
      // FAST PATH: plain 8/16-bit PCM parses directly (a real RIFF
      // chunk walk) — AudioSystem.getAudioInputStream does per-call
      // provider discovery that costs ~100 µs/row (measured 48 s per
      // 500k docs at 100×; the direct parse reads ~1.5 s). Non-PCM
      // encodings (µ-law etc.) still go through javax.sound below.
      val fast = parsePcmWav(bytes)
      if (fast != null) fast else decodeSamplesJs(bytes, stub)
    }
  }

  /** Direct RIFF/WAVE walk for format-1 (PCM) 8/16-bit payloads;
    * null when the container is anything else (the javax.sound
    * fallback's job) or structurally truncated (the stub's). */
  private[graft] def parsePcmWav(bytes: Array[Byte]): Array[Int] = {
    def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def le32(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    var off = 12
    var fmtCode = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (fmtCode < 0 || dataOff < 0)) {
      val isFmt = bytes(off) == 'f' && bytes(off + 1) == 'm' &&
        bytes(off + 2) == 't' && bytes(off + 3) == ' '
      val isData = bytes(off) == 'd' && bytes(off + 1) == 'a' &&
        bytes(off + 2) == 't' && bytes(off + 3) == 'a'
      val sz = le32(off + 4)
      if (sz < 0) return null
      if (isFmt) {
        // the declared chunk size must actually COVER the 16 bytes we
        // read (PCM fmt is >= 16) and sit inside the payload — reading
        // past a short chunk would fabricate fmtCode/bits from the
        // NEXT chunk's bytes
        if (sz < 16 || off + 8 + 16 > bytes.length) return null
        fmtCode = le16(off + 8)
        bits = le16(off + 8 + 14)
      } else if (isData) {
        // a data chunk whose declared size exceeds the payload is a
        // truncated container — the fast path DECLINES rather than
        // fabricate a clamped decode; javax.sound then decides (it may
        // decode the frames actually present, or fail to the stub)
        if (sz.toLong > (bytes.length - (off + 8)).toLong) return null
        dataOff = off + 8
        dataLen = sz
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      if (off < 0) return null // sz overflow wrapped the cursor
    }
    if (fmtCode != 1 || dataOff < 0) return null
    if (bits == 8) {
      val out = new Array[Int](dataLen)
      var i = 0
      while (i < dataLen) { out(i) = (bytes(dataOff + i) & 0xFF) - 128; i += 1 }
      out
    } else if (bits == 16) {
      val n = dataLen / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = (bytes(dataOff + 2 * i + 1).toInt << 8) |
          (bytes(dataOff + 2 * i) & 0xFF)
        i += 1
      }
      out
    } else null
  }

  /** The javax.sound path for RIFF payloads the direct parser
    * declines (non-PCM encodings). */
  private def decodeSamplesJs(bytes: Array[Byte],
                              stub: => Array[Int]): Array[Int] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val data = in.readAllBytes()
        val enc = fmt.getEncoding
        import javax.sound.sampled.AudioFormat.Encoding._
        if (fmt.getSampleSizeInBits == 8 && enc == PCM_UNSIGNED)
          data.map(b => (b & 0xFF) - 128)
        else if (fmt.getSampleSizeInBits == 8 && enc == PCM_SIGNED)
          data.map(_.toInt)
        else if (fmt.getSampleSizeInBits == 16 &&
            (enc == PCM_SIGNED) && data.length % 2 == 0) {
          val out = new Array[Int](data.length / 2)
          val be = fmt.isBigEndian
          var i = 0
          while (i < out.length) {
            val b0 = data(2 * i); val b1 = data(2 * i + 1)
            out(i) =
              if (be) (b0.toInt << 8) | (b1 & 0xFF)
              else (b1.toInt << 8) | (b0 & 0xFF)
            i += 1
          }
          out
        } else stub
      } finally in.close()
    } catch { case _: Exception => stub }
  }

  /** Wrap a raw payload as a canonical 8-bit mono PCM WAV (44-byte
    * header + the bytes as unsigned samples) — the constructed-media
    * device that lets a REAL decode run under the DuckDB oracle
    * (m09): wrap-then-decode is the identity byte − 128 on the
    * payload, which SQL replays as ascii − 128. One typed
    * executor-side pass; output (media_id, wav binary). */
  def wrapPcm8Wav(df: DataFrame, idCol: String, dataCol: String,
                  sampleRate: Int = 8000): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol).cast("binary"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.map { case (id, data) =>
        val payload = if (data == null) Array.empty[Byte] else data
        val n = payload.length
        val bb = java.nio.ByteBuffer.allocate(44 + n)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1) // PCM, mono
          .putInt(sampleRate).putInt(sampleRate) // byte rate = rate × 1 × 1
          .putShort(1).putShort(8) // block align, bits per sample
          .put("data".getBytes("US-ASCII")).putInt(n)
          .put(payload)
        (id, bb.array())
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("media_id", "wav")
  }

  /** Audio-waveform stats card — the AUDIO member of the multimodal
    * family. The decode is [[decodeSamples]]: REAL PCM WAV via
    * javax.sound.sampled when the payload is RIFF/WAVE (the round-9
    * image precedent — m09 runs it under the oracle over constructed
    * WAVs), the documented byte−96 STUB otherwise (non-audio payloads
    * keep the plumbing exercised — m07's text corpus). The PLUMBING is
    * the real shape: binary column in, one typed executor-side pass,
    * pure-integer aggregates out — n_samples, peak = max |s|, sum_sq =
    * Σs² exactly in i64 (16-bit samples: s² ≤ 2^30, corpus-scale sums
    * fit; RMS² = sum_sq/n as an exact rational — no float ever
    * computes), and zero_cross = sign changes (the classic
    * voiced/unvoiced split). */
  def audioStats(df: DataFrame, idCol: String,
                 dataCol: String): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.map { case (id, data) =>
        val sm = decodeSamples(
          if (data == null) Array.empty[Byte] else data)
        var peak = 0L; var sumSq = 0L; var zc = 0L
        var prevNeg = false; var first = true
        var i = 0
        while (i < sm.length) {
          val s = sm(i)
          val a = math.abs(s).toLong
          if (a > peak) peak = a
          sumSq += s.toLong * s
          val neg = s < 0
          if (!first && neg != prevNeg) zc += 1
          prevNeg = neg; first = false
          i += 1
        }
        AudioStats(id, sm.length.toLong, peak, sumSq, zc)
      }
    }(Encoders.product[AudioStats]).toDF()
  }

  final case class AudioActivity(media_id: Long, n_windows: Long,
                                 n_active: Long, max_run: Long)

  /** Audio activity segmentation (the VAD gate of speech-dataset
    * pipelines — drop silent clips, keep the longest voiced span):
    * fixed `window`-sample frames over the [[decodeSamples]] decode
    * (real PCM for RIFF/WAVE payloads, the byte−96 stub otherwise), a
    * frame is ACTIVE iff its energy Σs² > thrPerSample·frameLen
    * (cross-multiplied — the threshold is mean energy per sample,
    * exact in i64), and the card reports (n_windows, n_active,
    * max_run) with max_run = the longest consecutive active span. One
    * typed executor-side pass, no shuffle; the run-length fold is
    * row-local sequential state — exactly what mapPartitions is
    * for. */
  def audioActivity(df: DataFrame, idCol: String, dataCol: String,
                    window: Int, thrPerSample: Long): DataFrame = {
    require(window >= 1 && thrPerSample >= 0,
      s"need window >= 1, thrPerSample >= 0, got $window, $thrPerSample")
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.map { case (id, data) =>
        val sm = decodeSamples(
          if (data == null) Array.empty[Byte] else data)
        val n = sm.length
        val nw = (n + window - 1) / window
        var nActive = 0L; var run = 0L; var maxRun = 0L
        var w = 0
        while (w < nw) {
          val lo = w * window
          val hi = math.min(lo + window, n)
          var energy = 0L
          var i = lo
          while (i < hi) {
            val s = sm(i)
            energy += s.toLong * s
            i += 1
          }
          if (energy > thrPerSample * (hi - lo)) {
            nActive += 1L; run += 1L
            if (run > maxRun) maxRun = run
          } else run = 0L
          w += 1
        }
        AudioActivity(id, nw.toLong, nActive, maxRun)
      }
    }(Encoders.product[AudioActivity]).toDF()
  }

  final case class PHash(media_id: Long, n_bytes: Int, phash: Long)

  /** Cells in the perceptual hash — 62, not 64, so the signature stays
    * NON-NEGATIVE in i64 and the d07/d10 blocked-hamming integer
    * arithmetic (floor-div chunks) applies unchanged on both engines. */
  val PHashCells = 62

  /** 62-bit perceptual (average) hash of the decoded pixel stream —
    * media dedup's signature (the aHash family): the stream splits into
    * 62 equal spans, bit k = 1 iff span k's mean intensity exceeds the
    * global mean. The comparison is CROSS-MULTIPLIED
    * (spanSum·n > total·spanLen) so the hash is pure integer arithmetic
    * — deterministic on any engine, replayable in SQL. Executor-side
    * typed map, one pass, no shuffle. */
  def perceptualHash(df: DataFrame, idCol: String,
                     dataCol: String): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val px = decodePixels(bytes)
        val n = px.length.toLong
        var total = 0L
        var i = 0
        while (i < px.length) { total += px(i); i += 1 }
        var ph = 0L
        var k = 0
        while (k < PHashCells) {
          val lo = (k * n / PHashCells).toInt
          val hi = ((k + 1) * n / PHashCells).toInt
          var s = 0L
          var j = lo
          while (j < hi) { s += px(j); j += 1 }
          // span mean > global mean, cross-multiplied (exact integers)
          if (hi > lo && s * n > total * (hi - lo)) ph |= (1L << k)
          k += 1
        }
        PHash(id, bytes.length, ph)
      }
    }(Encoders.product[PHash]).toDF()
  }

  final case class DHash(media_id: Long, n_bytes: Int, dhash: Long)

  /** DCT hash geometry: the luma stream resamples to [[DctN]] box
    * means; [[DctBits]] low-band coefficient signs pack the signature
    * (62 not 64 keeps the i64 NON-NEGATIVE — the m04 rule that licenses
    * the d10 floor-div pigeonhole chunking downstream). */
  val DctN = 64
  val DctBits = 62

  /** Fixed-point DCT-II basis, rows k = 1..[[DctBits]] (DC skipped):
    * T[k−1][b] = round(1024·cos(π(2b+1)k / 2·[[DctN]])). StrictMath —
    * bit-reproducible on every JVM — and the oracle SQL embeds the SAME
    * integers as literals (the s13 JL signs-at-generation precedent),
    * so no trig ever evaluates cross-engine. */
  private[graft] val dctTable: Array[Array[Long]] =
    Array.tabulate(DctBits) { ki =>
      val k = ki + 1
      Array.tabulate(DctN) { b =>
        Math.round(1024.0 *
          StrictMath.cos(Math.PI * (2 * b + 1) * k / (2.0 * DctN)))
      }
    }

  /** DCT-based perceptual hash (m06, the pHash proper next to m04's
    * aHash): resample the decoded luma stream to [[DctN]] integer box
    * means, CENTER exactly (s'ᵦ = N·sᵦ − Σs — integer, so a uniform
    * brightness shift cancels IDENTICALLY, and a positive contrast
    * scale preserves every sign; aHash is brittle under both), then
    * signature bit k−1 = sign of the k-th fixed-point DCT coefficient
    * Σᵦ s'ᵦ·T[k][b]. All integer arithmetic (|C| ≤ 64·16320·1024 ≈
    * 2³⁰ — no overflow), non-negative i64 output, exact SQL replay.
    * Pair generation reuses `Dedup.hammingNearDup64` unchanged. */
  def dctHash(df: DataFrame, idCol: String, dataCol: String): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val px = decodePixels(bytes)
        val n = px.length.toLong
        val s = new Array[Long](DctN)
        var b = 0
        while (b < DctN) {
          val lo = (b * n / DctN).toInt
          val hi = ((b + 1) * n / DctN).toInt
          if (hi > lo) {
            var sum = 0L
            var j = lo
            while (j < hi) { sum += px(j); j += 1 }
            s(b) = sum / (hi - lo)
          }
          b += 1
        }
        var tot = 0L
        b = 0
        while (b < DctN) { tot += s(b); b += 1 }
        var h = 0L
        var ki = 0
        while (ki < DctBits) {
          val row = dctTable(ki)
          var c = 0L
          b = 0
          while (b < DctN) { c += (DctN * s(b) - tot) * row(b); b += 1 }
          if (c > 0) h |= 1L << ki
          ki += 1
        }
        DHash(id, bytes.length, h)
      }
    }(Encoders.product[DHash]).toDF()
  }

  /** Frame sampling: every `stride`-th fixed-size frame per media row —
    * flatMap (generator/UDTF shape), output is one row per kept frame. */
  final case class ShotCard(media_id: Long, n_frames: Long,
                            n_shots: Long, max_shot_len: Long)

  /** Shot-boundary detection over fixed `frame`-byte frames — the
    * video-segmentation member of the multimodal family (scene cuts =
    * where consecutive frames' mean intensity steps; the frame stack
    * is the [[sampleFrames]] decode, real pixels for decodable images,
    * the byte stub otherwise). Frame i starts a NEW SHOT iff its mean
    * intensity differs from frame i−1's by more than `thr`,
    * CROSS-MULTIPLIED so no float ever computes:
    * |t_i·l_{i−1} − t_{i−1}·l_i| > thr·l_i·l_{i−1} (t = frame pixel
    * total, l = frame length — they differ only at the tail frame).
    * Card: (n_frames, n_shots, max_shot_len). ONE typed executor-side
    * pass, the run-length fold row-local (the audioActivity shape);
    * empty payloads report zeros. */
  def shotCard(df: DataFrame, idCol: String, dataCol: String,
               frame: Int, thr: Long): DataFrame = {
    require(frame >= 1 && thr >= 0,
      s"need frame >= 1, thr >= 0, got $frame, $thr")
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.map { case (id, data) =>
        val px = decodePixels(if (data == null) Array.empty[Byte] else data)
        val n = px.length
        val nf = (n + frame - 1) / frame
        var shots = 0L; var run = 0L; var maxRun = 0L
        var pt = 0L; var pl = 0L
        var f = 0
        while (f < nf) {
          val lo = f * frame
          val hi = math.min(lo + frame, n)
          var t = 0L
          var i = lo
          while (i < hi) { t += px(i); i += 1 }
          val l = (hi - lo).toLong
          val cut = f == 0 || math.abs(t * pl - pt * l) > thr * l * pl
          if (cut) {
            shots += 1L
            if (run > maxRun) maxRun = run
            run = 1L
          } else run += 1L
          pt = t; pl = l
          f += 1
        }
        if (run > maxRun) maxRun = run
        ShotCard(id, nf.toLong, shots, maxRun)
      }
    }(Encoders.product[ShotCard]).toDF()
  }

  def sampleFrames(df: DataFrame, idCol: String, dataCol: String,
                   stride: Int): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.flatMap { case (id, bytes) =>
      val px = decodePixels(bytes)
      px.grouped(FrameSize).zipWithIndex.collect {
        case (frame, i) if i % stride == 0 =>
          Frame(id, i, frame.length,
            if (frame.isEmpty) 0.0 else frame.sum.toDouble / frame.length)
      }
    }(Encoders.product[Frame]).toDF()
  }

  final case class Resized(media_id: Long, data: Array[Byte],
                           width: Int, height: Int)

  /** Image RESIZE over a media table: decodable payloads re-encode as
    * `w`×`h` PNGs (NEAREST_NEIGHBOR sampling — deterministic pixel
    * picks, so specs can pin exact lumas), non-image payloads pass
    * through untouched with width/height −1. Executor-side typed
    * `mapPartitions`, the same batch shape as `extractFeatures` — at
    * corpus scale this is the map-only normalization stage in front of
    * a vision encoder. */
  def resizeImages(df: DataFrame, idCol: String, dataCol: String,
                   w: Int, h: Int): DataFrame = {
    val src: Dataset[(Long, Array[Byte])] = df
      .select(col(idCol).cast("long"), col(dataCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    src.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val img =
          if (!isImage(bytes)) null
          else try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        if (img == null) Resized(id, bytes, -1, -1)
        else {
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Resized(id, bos.toByteArray, w, h)
        }
      }
    }(Encoders.product[Resized]).toDF()
  }

  /** Expression-level media metadata (no decode): sizes, checksums,
    * kind census — stays in whole-stage codegen. */
  def mediaMeta(df: DataFrame, idCol: String, dataCol: String,
                kindCol: String): DataFrame =
    df.select(col(idCol).as("media_id"), col(kindCol).as("kind"),
      length(col(dataCol)).cast("long").as("n_bytes"),
      md5(col(dataCol)).as("checksum"))
}
