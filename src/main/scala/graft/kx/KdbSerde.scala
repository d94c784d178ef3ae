package graft.kx

import graft.rayfall.Rayfall
import graft.rayfall.Rayfall._

/** The kdb+ IPC wire format (the `raykx` bridge's serde —
  * `/root/reference/ext/raykx/serde.c`, `types.c`), re-implemented from
  * the PUBLIC protocol description (code.kx.com "Interprocess
  * communication"): little-endian, 8-byte message header
  * `[arch=1, msgType(0 async|1 sync|2 response), compressed=0, 0,
  * int32 totalLen]`, then one serialized object:
  *
  *  - atoms: negative type byte then payload — bool −1 (1 B),
  *    int −6 (4 B), long −7 (8 B), double −9 (8 B), char −10 (1 B),
  *    symbol −11 (NUL-terminated)
  *  - vectors: positive type byte, attribute byte (0), int32 count,
  *    then elements (symbols NUL-terminated; char vector 10 = string)
  *  - general list: type 0, attribute, int32 count, nested objects
  *  - dict 99: keys object then values object
  *  - table 98: attribute byte then a dict (symbol vector of column
  *    names → general list of column vectors)
  *  - error −128: NUL-terminated message
  *
  * Mapping to script values: longs/doubles/bools/strings round-trip;
  * kdb ints/shorts widen to long on decode (the script value model is
  * i64); symbol and char vectors both decode to strings (symbols and
  * strings share one repr here, SURVEY §1.2); tables decode to driver
  * `VTab`s via `tableFromValues` and encode within the same
  * driver-value bound as `valueText`.
  *
  * Temporal/guid/byte wire types (layouts per the public protocol and
  * `ext/raykx/serde.c:331-470`): date 14 (i32 days from 2000.01.01) ↔
  * `LocalDate`; month 13 (i32 months from 2000.01) → first-of-month
  * `LocalDate`; timestamp 12 (i64 ns from 2000.01.01) → epoch-1970
  * nanos long (this engine's TIMESTAMP convention — the reference
  * bridge retags the raw value because its native epoch is also 2000,
  * serde.c:342-345); time 19 (i32 ms) → millis long (the TIME
  * convention); minute 17 / second 18 → millis long via ×60000/×1000
  * (the reference retags raw, serde.c:358-364 — here the instant is
  * preserved instead); timespan 16 (i64 ns) → nanos long; real 8
  * (f32) → double; byte 4 (u8) → long 0-255; guid 2 (16 B big-endian)
  * → canonical UUID string. Temporal/guid atoms other than dates
  * decode to plain longs/strings (one-repr value model), so they
  * re-encode as long/string — same one-way widening as kdb
  * shorts/ints. Legacy datetime 15 is skipped to null like the
  * reference (serde.c:366-371). Compressed inbound frames (header
  * byte 2 = 1) DECOMPRESS via the public kdb LZ scheme (see
  * [[decompress]]); sends stay uncompressed, exactly like the
  * reference bridge (raykx.c:67,174 set compressed = 0). */
object KdbSerde {

  /** kdb epoch 2000.01.01 as an epoch-1970 day / nanosecond offset. */
  private[kx] val epochDate = java.time.LocalDate.of(2000, 1, 1)
  private[kx] val epochMonth = epochDate
  private[kx] val kdbEpochDay: Long = epochDate.toEpochDay // 10957
  private[kx] val kdbEpochNanos: Long = kdbEpochDay * 86400L * 1000000000L

  // ------------------------------------------------------------ encode

  private final class W {
    private val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def i32(v: Int): Unit = { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }
    def i64(v: Long): Unit = { i32(v.toInt); i32((v >> 32).toInt) }
    def f64(v: Double): Unit = i64(java.lang.Double.doubleToLongBits(v))
    def bytes(b: Array[Byte]): Unit = bos.write(b)
    def sym(s: String): Unit = { bytes(s.getBytes("UTF-8")); u8(0) }
    def result(): Array[Byte] = bos.toByteArray
  }

  private def writeObj(w: W, v: RVal): Unit = v match {
    case VAtom(null) => w.u8(0x65); w.u8(0) // (::) generic null, type 101
    case VAtom(b: java.lang.Boolean) => w.u8(0xff); w.u8(if (b) 1 else 0)
    case VAtom(l: java.lang.Long) => w.u8(0xf9); w.i64(l)
    case VAtom(i: java.lang.Integer) => w.u8(0xf9); w.i64(i.longValue)
    case VAtom(d: java.lang.Double) => w.u8(0xf7); w.f64(d)
    case VAtom(d: java.time.LocalDate) => // date atom −14, days from 2000.01.01
      w.u8(0xf2); w.i32((d.toEpochDay - KdbSerde.kdbEpochDay).toInt)
    case VAtom(d: java.sql.Date) =>
      w.u8(0xf2); w.i32((d.toLocalDate.toEpochDay - KdbSerde.kdbEpochDay).toInt)
    case VAtom(s: String) => // char vector (string)
      val b = s.getBytes("UTF-8")
      w.u8(10); w.u8(0); w.i32(b.length); w.bytes(b)
    case VVec(xs) if xs.nonEmpty && xs.forall(_.isInstanceOf[java.lang.Long]) =>
      w.u8(7); w.u8(0); w.i32(xs.length)
      xs.foreach(x => w.i64(x.asInstanceOf[java.lang.Long]))
    case VVec(xs) if xs.nonEmpty && xs.forall(_.isInstanceOf[java.lang.Double]) =>
      w.u8(9); w.u8(0); w.i32(xs.length)
      xs.foreach(x => w.f64(x.asInstanceOf[java.lang.Double]))
    case VVec(xs) if xs.nonEmpty && xs.forall(_.isInstanceOf[java.lang.Boolean]) =>
      w.u8(1); w.u8(0); w.i32(xs.length)
      xs.foreach(x => w.u8(if (x.asInstanceOf[java.lang.Boolean]) 1 else 0))
    case VVec(xs) if xs.nonEmpty && xs.forall(_.isInstanceOf[String]) =>
      w.u8(11); w.u8(0); w.i32(xs.length)
      xs.foreach(x => w.sym(x.asInstanceOf[String]))
    case VVec(xs) if xs.nonEmpty &&
        xs.forall(_.isInstanceOf[java.time.LocalDate]) =>
      w.u8(14); w.u8(0); w.i32(xs.length) // date vector
      xs.foreach(x => w.i32((x.asInstanceOf[java.time.LocalDate].toEpochDay
        - KdbSerde.kdbEpochDay).toInt))
    case VVec(xs) if xs.nonEmpty && xs.forall(_.isInstanceOf[java.sql.Date]) =>
      w.u8(14); w.u8(0); w.i32(xs.length)
      xs.foreach(x => w.i32((x.asInstanceOf[java.sql.Date].toLocalDate
        .toEpochDay - KdbSerde.kdbEpochDay).toInt))
    case VVec(xs) => // mixed → general list
      w.u8(0); w.u8(0); w.i32(xs.length)
      xs.foreach {
        case r: RVal => writeObj(w, r)
        case x => writeObj(w, VAtom(x))
      }
    case VDict(ks, vs) =>
      w.u8(0x63)
      writeObj(w, VVec(ks.toVector.map(identity[Any])))
      writeObj(w, VVec(vs))
    case VTab(df) =>
      val n = df.count()
      require(n <= Rayfall.maxDriverVec,
        s"kx: table too large to serialize ($n rows)")
      val rows = df.collect()
      w.u8(0x62); w.u8(0) // table, no attribute
      w.u8(0x63) // its dict
      writeObj(w, VVec(df.columns.toVector.map(identity[Any])))
      val cols: Vector[Any] = df.columns.indices.map { i =>
        VVec(rows.toVector.map(_.get(i) match {
          case x: java.lang.Integer => java.lang.Long.valueOf(x.longValue): Any
          case x => x: Any
        })): Any
      }.toVector
      writeObj(w, VVec(cols))
    case x => throw new IllegalArgumentException(s"kx: cannot serialize $x")
  }

  /** One full message: header + object. */
  def encodeMsg(v: RVal, msgType: Int): Array[Byte] = {
    val body = { val w = new W; writeObj(w, v); w.result() }
    val w = new W
    w.u8(1); w.u8(msgType); w.u8(0); w.u8(0)
    w.i32(8 + body.length)
    w.bytes(body)
    w.result()
  }

  /** An error response frame (type −128, NUL-terminated). */
  def encodeError(msg: String): Array[Byte] = {
    val b = msg.getBytes("UTF-8")
    val w = new W
    w.u8(1); w.u8(2); w.u8(0); w.u8(0)
    w.i32(8 + 1 + b.length + 1)
    w.u8(0x80); w.bytes(b); w.u8(0)
    w.result()
  }

  // ------------------------------------------------------------ decode

  private final class R(buf: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def i8(): Int = { val v = buf(pos).toInt; pos += 1; v }
    def i16(): Int = { val v = u8() | (u8() << 8); (v << 16) >> 16 }
    def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def i64(): Long = (i32().toLong & 0xffffffffL) | (i32().toLong << 32)
    def f64(): Double = java.lang.Double.longBitsToDouble(i64())
    def f32(): Float = java.lang.Float.intBitsToFloat(i32())
    def sym(): String = {
      val start = pos
      while (buf(pos) != 0) pos += 1
      val s = new String(buf, start, pos - start, "UTF-8")
      pos += 1
      s
    }
  }

  /** 16 wire bytes (big-endian, the kdb guid layout) → canonical
    * 8-4-4-4-12 UUID string — guids are strings in this value model. */
  private def guidString(r: R): String = {
    val b = new Array[Byte](16)
    (0 until 16).foreach(i => b(i) = r.u8().toByte)
    val bb = java.nio.ByteBuffer.wrap(b)
    new java.util.UUID(bb.getLong, bb.getLong).toString
  }

  private def readObj(spark: org.apache.spark.sql.SparkSession,
                      r: R): RVal = {
    val t = r.i8()
    t match {
      case 101 => r.u8(); VAtom(null)
      case -1 => VAtom(java.lang.Boolean.valueOf(r.u8() != 0))
      case -4 => VAtom(java.lang.Long.valueOf(r.u8().toLong)) // byte: 0-255
      case -5 => VAtom(java.lang.Long.valueOf(r.i16().toLong))
      case -6 => VAtom(java.lang.Long.valueOf(r.i32().toLong))
      case -7 => VAtom(java.lang.Long.valueOf(r.i64()))
      case -8 => VAtom(java.lang.Double.valueOf(r.f32().toDouble))
      case -9 => VAtom(java.lang.Double.valueOf(r.f64()))
      case -10 => VAtom(new String(Array(r.u8().toByte), "UTF-8"))
      case -11 => VAtom(r.sym())
      case -12 => // timestamp: ns from 2000.01.01 → epoch-1970 nanos
        VAtom(java.lang.Long.valueOf(r.i64() + KdbSerde.kdbEpochNanos))
      case -13 => // month: months from 2000.01 → first-of-month date
        VAtom(KdbSerde.epochMonth.plusMonths(r.i32().toLong))
      case -14 => VAtom(KdbSerde.epochDate.plusDays(r.i32().toLong))
      case -15 => r.f64(); VAtom(null) // legacy datetime: skipped
      case -16 => VAtom(java.lang.Long.valueOf(r.i64())) // timespan ns
      case -17 => // minute → millis (TIME convention)
        VAtom(java.lang.Long.valueOf(r.i32().toLong * 60000L))
      case -18 => // second → millis
        VAtom(java.lang.Long.valueOf(r.i32().toLong * 1000L))
      case -19 => VAtom(java.lang.Long.valueOf(r.i32().toLong)) // time ms
      case -2 => VAtom(KdbSerde.guidString(r))
      case -128 => throw new RayfallError(s"kx remote error: ${r.sym()}")
      case 0 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(readObj(spark, r) match {
          case VAtom(x) => x: Any
          case v => v: Any
        }))
      case 1 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(java.lang.Boolean.valueOf(r.u8() != 0): Any))
      case 5 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(java.lang.Long.valueOf(r.i16().toLong): Any))
      case 6 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(java.lang.Long.valueOf(r.i32().toLong): Any))
      case 7 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(java.lang.Long.valueOf(r.i64()): Any))
      case 9 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(java.lang.Double.valueOf(r.f64()): Any))
      case 10 =>
        r.u8(); val n = r.i32()
        val b = new Array[Byte](n)
        (0 until n).foreach(i => b(i) = r.u8().toByte)
        VAtom(new String(b, "UTF-8"))
      case 11 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(r.sym(): Any))
      case 2 => // guid vector
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(KdbSerde.guidString(r): Any))
      case 4 => // byte vector → longs 0-255
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(java.lang.Long.valueOf(r.u8().toLong): Any))
      case 8 => // real (f32) vector → doubles
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(java.lang.Double.valueOf(r.f32().toDouble): Any))
      case 12 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(
          java.lang.Long.valueOf(r.i64() + KdbSerde.kdbEpochNanos): Any))
      case 13 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(
          KdbSerde.epochMonth.plusMonths(r.i32().toLong): Any))
      case 14 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(KdbSerde.epochDate.plusDays(r.i32().toLong): Any))
      case 15 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n) { r.f64(); null: Any }) // legacy datetime
      case 16 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(java.lang.Long.valueOf(r.i64()): Any))
      case 17 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(
          java.lang.Long.valueOf(r.i32().toLong * 60000L): Any))
      case 18 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(
          java.lang.Long.valueOf(r.i32().toLong * 1000L): Any))
      case 19 =>
        r.u8(); val n = r.i32()
        VVec(Vector.fill(n)(java.lang.Long.valueOf(r.i32().toLong): Any))
      case 99 =>
        val keys = readObj(spark, r)
        val vals = readObj(spark, r)
        (keys, vals) match {
          case (VVec(ks), VVec(vs)) =>
            VDict(ks.map(_.toString), vs)
          case (k, v) => throw new IllegalArgumentException(
            s"kx: unsupported dict shape ($k, $v)")
        }
      case 98 =>
        r.u8() // attribute
        val d = readObj(spark, r)
        d match {
          case VDict(names, cols) =>
            VTab(Rayfall.tableFromValues(spark, names, cols))
          case x => throw new IllegalArgumentException(s"kx: bad table body $x")
        }
      case x => throw new IllegalArgumentException(
        s"kx: unsupported wire type $x")
    }
  }

  /** The kdb IPC LZ decompression (public algorithm; the bridge's
    * `raykx_decompress`, ext/raykx/raykx.c:268-335): after the 8-byte
    * message header, a compressed frame carries a u32 TOTAL uncompressed
    * size (header included) and a flag-bit token stream — bit 0 = one
    * literal byte, bit 1 = a back-reference `[xorKey, extraLen]` copying
    * 2+extraLen bytes from the rolling 256-slot XOR-pair dictionary. */
  private[kx] def decompress(frame: Array[Byte], offset: Int): Array[Byte] = {
    val total = (frame(offset) & 0xff) | ((frame(offset + 1) & 0xff) << 8) |
      ((frame(offset + 2) & 0xff) << 16) | ((frame(offset + 3) & 0xff) << 24)
    val len = total - 8 // minus the message header
    require(len > 0, s"kx: bad uncompressed size $total")
    val result = new Array[Byte](len)
    val buffer = new Array[Int](256)
    var i = 0; var n = 0; var f = 0; var s = 0; var p = 0
    var d = offset + 4
    // every token read/copy is bounds-checked so a truncated or corrupt
    // frame fails with a diagnosable error, not a raw index crash
    def in(need: Int): Unit =
      if (d + need > frame.length) throw new IllegalArgumentException(
        s"kx: corrupt compressed frame (token stream ends at $d/${frame.length})")
    while (s < len) {
      if (i == 0) { in(1); f = frame(d) & 0xff; d += 1; i = 1 }
      val isRef = (f & i) != 0
      if (isRef) {
        in(2) // key byte + extraLen byte
        var r = buffer(frame(d) & 0xff)
        n = frame(d + 1) & 0xff
        d += 2
        if (s + 2 + n > len || r + 2 + n > len)
          throw new IllegalArgumentException(
            s"kx: corrupt compressed frame (copy past $len bytes)")
        result(s) = result(r); s += 1; r += 1
        result(s) = result(r); s += 1; r += 1
        var m = 0
        while (m < n) { result(s + m) = result(r + m); m += 1 }
      } else {
        in(1)
        result(s) = frame(d); s += 1; d += 1
      }
      while (p < s - 1) {
        val pp = p; p += 1
        buffer((result(pp) ^ result(p)) & 0xff) = pp
      }
      if (isRef) { s += n; p = s }
      i *= 2
      if (i == 256) i = 0
    }
    result
  }

  /** Decode one full message (header + object); returns (msgType, value).
    * Compressed frames (header byte 2 = 1) decompress first; error
    * responses raise. */
  def decodeMsg(spark: org.apache.spark.sql.SparkSession,
                frame: Array[Byte]): (Int, RVal) = {
    val r = new R(frame)
    val arch = r.u8(); val msgType = r.u8(); val compressed = r.u8(); r.u8()
    require(arch == 1, s"kx: big-endian frames not supported (arch $arch)")
    val total = r.i32()
    require(total == frame.length, s"kx: frame length $total != ${frame.length}")
    if (compressed == 1) (msgType, readObj(spark, new R(decompress(frame, 8))))
    else (msgType, readObj(spark, r))
  }
}
