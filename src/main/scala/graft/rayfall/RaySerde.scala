package graft.rayfall

import graft.rayfall.Rayfall._

/** The reference's OWN binary serialization format (`ser`/`de`,
  * core/serde.c:166-299 `ser_raw`, :366-551 `de_raw`, header
  * core/serde.h:30-41; worked byte examples in
  * docs/.../documentation/serialization.md): 16-byte header
  * `[prefix 0xcefadefa LE | version u8 | flags u8 | endian u8 (0=LE) |
  * msgtype u8 | payload size i64 LE]` followed by one object:
  *
  *  - object = i8 type tag, negative for atoms, then payload
  *  - atoms: b8 −1 (1 B), u8 −2, i16 −3, i32 −4, i64 −5 (8 B LE),
  *    symbol −6 (NUL-terminated), date −7 (i32 days from 2000.01.01),
  *    time −8 (i32 ms), timestamp −9 (i64 ns from 2000.01.01),
  *    f64 −10, guid −11 (16 B), c8 −12 (1 B)
  *  - vectors: positive tag, attrs u8 (0), i64 count LE, elements
  *    (symbols NUL-terminated, C8 = raw chars, LIST 0 = nested objects)
  *  - dict 99 / table 98: attrs u8, then keys object + values object
  *    (a table is names symbol-vector + column list, rayforce.c)
  *  - lambda 100: attrs u8, args object + body object — the docs pin
  *    "functions are serialized as their source code", so the body
  *    travels as a C8 vector of the rendered source
  *  - null 126 (tag only); error 127: code u8 + 8-byte context +
  *    NUL-terminated message when code = EC_USER
  *
  * Value-model mapping (SURVEY §1.2 conventions): sentinel nulls
  * (NULL_I64/I32/I16, the f64 quiet NaN) ↔ SQL nulls; DATE ↔
  * `LocalDate` via the 2000-01-01 epoch; TIME widens to millis longs
  * and TIMESTAMP shifts to this engine's epoch-1970 nanos on decode
  * (longs re-encode as plain i64 — the one-repr long convention);
  * strings encode as C8 vectors and string VECTORS as symbol vectors
  * (the script's `"str"` / `[a b c]` literal types); u8/i16/i32 widen
  * to long on decode like every other ingest path.
  *
  * Repr fidelity across `(de (ser x))` and native frames: decode
  * records the wire repr it read — a symbol ATOM (−6) sets
  * `VAtom.symRepr` and a general LIST (tag 0) sets `VVec.wireTag` —
  * and encode honors it, so a native peer's symbol/C8 and LIST/vector
  * choices survive a round-trip byte-exactly instead of re-inferring
  * from the shared one-repr value (the SURVEY §1.2 caveat, closed).
  * Widened narrow ints (u8/i16/i32 → long) still re-encode wide — the
  * documented widening convention. */
object RaySerde {

  val Prefix: Long = 0xcefadefaL
  val Version: Int = 1 // RAYFORCE_MAJOR_VERSION >> 3 | MINOR (core/def.h:29)
  private val HeaderLen = 16
  private val NullI16 = 0x8000.toShort
  private val NullI32 = 0x80000000
  private val NullI64 = 0x8000000000000000L
  private val NullF64Bits = 0x7ff8000000000000L // 0/0.0, the x86 quiet NaN
  private val EpochDay = java.time.LocalDate.of(2000, 1, 1).toEpochDay
  private val EpochNanos = EpochDay * 86400L * 1000000000L

  // ------------------------------------------------------------ writer
  private final class W {
    private val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def i16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def i32(v: Int): Unit = { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }
    def i64(v: Long): Unit = { i32(v.toInt); i32((v >> 32).toInt) }
    def f64(v: Double): Unit = i64(java.lang.Double.doubleToRawLongBits(v))
    def bytes(b: Array[Byte]): Unit = bos.write(b)
    def nulTerm(s: String): Unit = { bytes(s.getBytes("UTF-8")); u8(0) }
    def result(): Array[Byte] = bos.toByteArray
  }

  private def writeObj(w: W, v: RVal): Unit = v match {
    case VAtom(null) => w.u8(126)
    case VAtom(b: java.lang.Boolean) => w.u8(-1 & 0xff); w.u8(if (b) 1 else 0)
    case VAtom(l: java.lang.Long) => w.u8(-5 & 0xff); w.i64(l)
    case VAtom(i: java.lang.Integer) => w.u8(-5 & 0xff); w.i64(i.longValue)
    case VAtom(d: java.lang.Double) => w.u8(-10 & 0xff); w.f64(d)
    case a @ VAtom(s: String) =>
      if (a.symRepr) { // symbol atom (−6): 'sym literal / decoded native
        w.u8(-6 & 0xff); w.nulTerm(s)
      } else { // C8 vector (the script string type)
        val b = s.getBytes("UTF-8")
        w.u8(12); w.u8(0); w.i64(b.length.toLong); w.bytes(b)
      }
    case VAtom(d: java.time.LocalDate) =>
      w.u8(-7 & 0xff); w.i32((d.toEpochDay - EpochDay).toInt)
    case VAtom(d: java.sql.Date) =>
      w.u8(-7 & 0xff); w.i32((d.toLocalDate.toEpochDay - EpochDay).toInt)
    case v @ VVec(xs) => writeVec(w, xs, v.wireTag, v.symElems)
    case VDict(ks, vs) =>
      w.u8(99); w.u8(0)
      writeVec(w, ks.toVector.map(identity[Any]))
      writeVec(w, vs)
    case VTab(df) =>
      val n = df.count()
      require(n <= Rayfall.maxDriverVec,
        s"ser: table too large to serialize ($n rows)")
      val rows = df.collect()
      w.u8(98); w.u8(0)
      writeVec(w, df.columns.toVector.map(identity[Any]))
      // column list: LIST of per-column vectors
      w.u8(0); w.u8(0); w.i64(df.columns.length.toLong)
      df.columns.indices.foreach { i =>
        writeVec(w, rows.toVector.map(_.get(i): Any))
      }
    case VFn(ps, bodies) =>
      w.u8(100); w.u8(0)
      writeVec(w, ps.toVector.map(identity[Any]))
      // "functions are serialized as their source code" (the docs) —
      // body = C8 vector of the rendered lambda source
      val src = bodies.map(Rayfall.exprText).mkString(" ")
      val b = src.getBytes("UTF-8")
      w.u8(12); w.u8(0); w.i64(b.length.toLong); w.bytes(b)
    case x => throw new IllegalArgumentException(s"ser: cannot serialize $x")
  }

  private def writeVec(w: W, xs: Vector[Any],
                       wireTag: Int = Rayfall.InferWireTag,
                       symElems: Set[Int] = Set.empty): Unit = {
    def all(p: Any => Boolean) = xs.nonEmpty && xs.forall(x => x == null || p(x))
    def listOfObjects(): Unit = {
      w.u8(0); w.u8(0); w.i64(xs.length.toLong)
      xs.zipWithIndex.foreach {
        case (r: RVal, _) => writeObj(w, r)
        // symbol-flagged elements ('sym in a list literal / decoded
        // native symbol atoms) keep the −6 repr
        case (s: String, i) if symElems(i) => w.u8(-6 & 0xff); w.nulTerm(s)
        case (x, _) => writeObj(w, VAtom(x))
      }
    }
    if (wireTag == 0) {
      // the value ARRIVED as a general LIST (de recorded tag 0): re-emit
      // a LIST of nested objects even when the element types would infer
      // a typed vector — byte-fidelity for native round-trips (a list of
      // C8 strings must not flip to a symbol vector, serde.c layouts)
      listOfObjects()
    } else if (xs.nonEmpty && all(_.isInstanceOf[java.lang.Boolean]) &&
        !xs.contains(null)) {
      w.u8(1); w.u8(0); w.i64(xs.length.toLong)
      xs.foreach(x => w.u8(if (x.asInstanceOf[java.lang.Boolean]) 1 else 0))
    } else if (xs.nonEmpty && all(x => x.isInstanceOf[java.lang.Long] ||
        x.isInstanceOf[java.lang.Integer])) {
      w.u8(5); w.u8(0); w.i64(xs.length.toLong)
      xs.foreach {
        case null => w.i64(NullI64)
        case x: java.lang.Long => w.i64(x)
        case x: java.lang.Integer => w.i64(x.longValue)
        case x => throw new IllegalStateException(s"$x")
      }
    } else if (xs.nonEmpty && all(_.isInstanceOf[java.lang.Double])) {
      w.u8(10); w.u8(0); w.i64(xs.length.toLong)
      xs.foreach {
        case null => w.i64(NullF64Bits)
        case x: java.lang.Double => w.f64(x)
        case x => throw new IllegalStateException(s"$x")
      }
    } else if (xs.nonEmpty && all(_.isInstanceOf[String]) &&
        !xs.contains(null) &&
        (symElems.isEmpty || symElems.size == xs.length)) {
      // all-symbol or plain string vectors infer tag 6; a MIXED
      // sym/C8 list (e.g. (list "a" 'b)) falls to the LIST branch so
      // each element keeps its own repr
      // symbol vector — the script's [a b c] literal type
      w.u8(6); w.u8(0); w.i64(xs.length.toLong)
      xs.foreach(x => w.nulTerm(x.asInstanceOf[String]))
    } else if (xs.nonEmpty && all(x => x.isInstanceOf[java.time.LocalDate] ||
        x.isInstanceOf[java.sql.Date])) {
      w.u8(7); w.u8(0); w.i64(xs.length.toLong)
      xs.foreach {
        case null => w.i32(NullI32)
        case d: java.time.LocalDate => w.i32((d.toEpochDay - EpochDay).toInt)
        case d: java.sql.Date =>
          w.i32((d.toLocalDate.toEpochDay - EpochDay).toInt)
        case x => throw new IllegalStateException(s"$x")
      }
    } else listOfObjects() // general LIST of nested objects
  }

  private def wrap(body: Array[Byte], msgtype: Int): Array[Byte] = {
    val w = new W
    w.i32(Prefix.toInt)
    w.u8(Version); w.u8(0); w.u8(0); w.u8(msgtype)
    w.i64(body.length.toLong)
    w.bytes(body)
    w.result()
  }

  /** Full `ser` frame: header + one object. `msgtype` is the IPC field
    * (0 async, 1 sync, 2 response — core/serde.h:37); plain `ser` uses 0. */
  def serialize(v: RVal, msgtype: Int = 0): Array[Byte] =
    wrap(serializeRawObj(v), msgtype)

  /** An IPC apply message: LIST [symbol `name`, arg objects…] — the
    * `(write h (list 'f args…))` call convention the server runs
    * through eval_obj (core/ipc.c:388). The head is written as a
    * SYMBOL atom (the reference's function reference), args as values.
    * Same record body as the journal form, framed. */
  def serializeApply(name: String, args: Seq[Any], msgtype: Int): Array[Byte] =
    wrap(serializeRawApply(name, args), msgtype)

  /** An ERR frame (type 127: code u8 + 8-byte context + NUL message for
    * EC_USER=11, core/serde.c:319-333) — the IPC error-response shape;
    * `de` of this frame raises. */
  def serializeError(msg: String, msgtype: Int = 2): Array[Byte] = {
    val w = new W
    val b = msg.getBytes("UTF-8")
    val size = 1 + 1 + 8 + b.length + 1
    w.i32(Prefix.toInt)
    w.u8(Version); w.u8(0); w.u8(0); w.u8(msgtype)
    w.i64(size.toLong)
    w.u8(127); w.u8(11); w.i64(0L); w.bytes(b); w.u8(0)
    w.result()
  }

  /** Read ONE full frame (16-byte header + payload) off a stream;
    * returns the raw frame bytes. Validates prefix and bounds size. */
  def readFrame(in: java.io.DataInputStream,
                maxLen: Long = 1L << 28): Array[Byte] = {
    val head = new Array[Byte](HeaderLen)
    in.readFully(head)
    val hr = new R(head)
    val prefix = hr.i32().toLong & 0xffffffffL
    require(prefix == Prefix,
      f"ipc: bad frame prefix 0x$prefix%08x (expected 0x$Prefix%08x)")
    hr.u8(); hr.u8(); hr.u8(); hr.u8()
    val size = hr.i64()
    require(size >= 0 && size <= maxLen, s"ipc: frame size $size out of range")
    val frame = java.util.Arrays.copyOf(head, HeaderLen + size.toInt)
    in.readFully(frame, HeaderLen, size.toInt)
    frame
  }

  /** One HEADERLESS object record — the journal encoding: `ray_write`
    * to a file handle appends raw ser_raw bytes per record
    * (core/io.c:343-355), no per-record frame header. */
  def serializeRawObj(v: RVal): Array[Byte] = {
    val bw = new W; writeObj(bw, v); bw.result()
  }

  /** A headerless apply record: LIST [symbol `name`, arg values…] —
    * the `(write h (list 'f args…))` journal form `ray_read` replays
    * through eval_obj (core/io.c:246-256). */
  def serializeRawApply(name: String, args: Seq[Any]): Array[Byte] = {
    val bw = new W
    bw.u8(0); bw.u8(0); bw.i64((1 + args.length).toLong)
    bw.u8(-6 & 0xff); bw.nulTerm(name)
    args.foreach {
      case r: RVal => writeObj(bw, r)
      case x => writeObj(bw, VAtom(x))
    }
    bw.result()
  }

  /** Parse a headerless CONCATENATION of object records (the journal
    * file layout) into the record values, in order. Throws if the
    * stream is not a clean record sequence — callers use that to fall
    * back to legacy text journals. */
  def deserializeRawStream(spark: org.apache.spark.sql.SparkSession,
                           bytes: Array[Byte]): List[RVal] =
    deserializeRawStreamTagged(spark, bytes).map(_._2)

  /** Like [[deserializeRawStream]] but pairs each record with its
    * LEADING type tag. Replay needs the tag to tell a LIST apply
    * record (tag 0 — eval_obj applies it, core/io.c:246-256) from a
    * symbol-vector VALUE record (tag 6 — eval_obj returns it
    * unchanged, core/eval.c:884-893): both decode to a VVec of
    * strings under the one-repr symbol/string convention. */
  def deserializeRawStreamTagged(spark: org.apache.spark.sql.SparkSession,
                                 bytes: Array[Byte]): List[(Int, RVal)] = {
    val r = new R(bytes)
    val out = List.newBuilder[(Int, RVal)]
    while (r.remaining > 0) {
      val tag = bytes(r.pos).toInt
      out += ((tag, readObj(spark, r)))
    }
    out.result()
  }

  /** The IPC msgtype field of a frame (header byte 7). */
  def frameMsgType(frame: Array[Byte]): Int = frame(7) & 0xff

  /** The payload's leading type tag (first byte after the header). */
  def frameTypeTag(frame: Array[Byte]): Int = frame(HeaderLen).toInt

  // ------------------------------------------------------------ reader
  private final class R(buf: Array[Byte]) {
    var pos = 0
    def remaining: Int = buf.length - pos
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def i8(): Int = { val v = buf(pos).toInt; pos += 1; v }
    def i16(): Short = { val v = u8() | (u8() << 8); v.toShort }
    def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def i64(): Long = (i32().toLong & 0xffffffffL) | (i32().toLong << 32)
    def f64bits(): Long = i64()
    def nulTerm(): String = {
      val start = pos
      while (buf(pos) != 0) pos += 1
      val s = new String(buf, start, pos - start, "UTF-8")
      pos += 1
      s
    }
    def take(n: Int): Array[Byte] = {
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; b
    }
  }

  private def readObj(spark: org.apache.spark.sql.SparkSession, r: R): RVal = {
    val t = r.i8()
    def vec(n: Long)(one: => Any): VVec =
      VVec(Vector.fill(n.toInt)(one))
    t match {
      case 126 => VAtom(null)
      case -1 => VAtom(java.lang.Boolean.valueOf(r.u8() != 0))
      case -2 => VAtom(java.lang.Long.valueOf(r.u8().toLong))
      case -3 => r.i16() match {
        case NullI16 => VAtom(null)
        case v => VAtom(java.lang.Long.valueOf(v.toLong))
      }
      case -4 => r.i32() match {
        case NullI32 => VAtom(null)
        case v => VAtom(java.lang.Long.valueOf(v.toLong))
      }
      case -5 => r.i64() match {
        case NullI64 => VAtom(null)
        case v => VAtom(java.lang.Long.valueOf(v))
      }
      case -6 => VAtom.sym(r.nulTerm())
      case -7 => r.i32() match {
        case NullI32 => VAtom(null)
        case v => VAtom(java.time.LocalDate.ofEpochDay(EpochDay + v))
      }
      case -8 => r.i32() match { // time: ms (the TIME-as-millis convention)
        case NullI32 => VAtom(null)
        case v => VAtom(java.lang.Long.valueOf(v.toLong))
      }
      case -9 => r.i64() match { // timestamp: ns-from-2000 → epoch-1970 ns
        case NullI64 => VAtom(null)
        case v => VAtom(java.lang.Long.valueOf(v + EpochNanos))
      }
      case -10 => VAtom(java.lang.Double.valueOf(
        java.lang.Double.longBitsToDouble(r.f64bits())))
      case -11 =>
        val bb = java.nio.ByteBuffer.wrap(r.take(16))
        VAtom(new java.util.UUID(bb.getLong, bb.getLong).toString)
      case -12 => VAtom(new String(Array(r.u8().toByte), "UTF-8"))
      case 0 =>
        r.u8(); val n = r.i64()
        // record the LIST repr so ser re-emits tag 0, not the typed
        // vector the (unwrapped) element types would infer — and note
        // which elements arrived as SYMBOL atoms so they re-emit −6
        val symIdx = Set.newBuilder[Int]
        val elems = Vector.tabulate(n.toInt) { i =>
          readObj(spark, r) match {
            case a @ VAtom(x) => if (a.symRepr) symIdx += i; x: Any
            case v => v: Any
          }
        }
        val vv = VVec.tagged(elems, 0)
        vv.symElems = symIdx.result()
        vv
      case 1 => r.u8(); val n = r.i64()
        vec(n)(java.lang.Boolean.valueOf(r.u8() != 0): Any)
      case 2 => r.u8(); val n = r.i64()
        vec(n)(java.lang.Long.valueOf(r.u8().toLong): Any)
      case 3 => r.u8(); val n = r.i64()
        vec(n)(r.i16() match {
          case NullI16 => null: Any
          case v => java.lang.Long.valueOf(v.toLong): Any
        })
      case 4 => r.u8(); val n = r.i64()
        vec(n)(r.i32() match {
          case NullI32 => null: Any
          case v => java.lang.Long.valueOf(v.toLong): Any
        })
      case 5 => r.u8(); val n = r.i64()
        vec(n)(r.i64() match {
          case NullI64 => null: Any
          case v => java.lang.Long.valueOf(v): Any
        })
      case 6 => r.u8(); val n = r.i64()
        vec(n)(r.nulTerm(): Any)
      case 7 => r.u8(); val n = r.i64()
        vec(n)(r.i32() match {
          case NullI32 => null: Any
          case v => java.time.LocalDate.ofEpochDay(EpochDay + v): Any
        })
      case 8 => r.u8(); val n = r.i64()
        vec(n)(r.i32() match {
          case NullI32 => null: Any
          case v => java.lang.Long.valueOf(v.toLong): Any
        })
      case 9 => r.u8(); val n = r.i64()
        vec(n)(r.i64() match {
          case NullI64 => null: Any
          case v => java.lang.Long.valueOf(v + EpochNanos): Any
        })
      case 10 => r.u8(); val n = r.i64()
        vec(n) {
          val bits = r.f64bits()
          if (bits == NullF64Bits) null: Any
          else java.lang.Double.valueOf(
            java.lang.Double.longBitsToDouble(bits)): Any
        }
      case 11 => r.u8(); val n = r.i64()
        vec(n) {
          val bb = java.nio.ByteBuffer.wrap(r.take(16))
          new java.util.UUID(bb.getLong, bb.getLong).toString: Any
        }
      case 12 => r.u8(); val n = r.i64()
        VAtom(new String(r.take(n.toInt), "UTF-8"))
      case 98 =>
        r.u8()
        (readObj(spark, r), readObj(spark, r)) match {
          case (VVec(names), VVec(cols)) =>
            VTab(Rayfall.tableFromValues(spark, names.map(_.toString), cols))
          case (k, v) =>
            throw new IllegalArgumentException(s"de: bad table body ($k, $v)")
        }
      case 99 =>
        r.u8()
        (readObj(spark, r), readObj(spark, r)) match {
          case (VVec(ks), VVec(vs)) => VDict(ks.map(_.toString), vs)
          case (VVec(ks), VAtom(s: String)) => // C8 values = char entries
            VDict(ks.map(_.toString), s.toVector.map(_.toString: Any))
          case (k, v) =>
            throw new IllegalArgumentException(s"de: bad dict body ($k, $v)")
        }
      case 100 =>
        r.u8()
        val args = readObj(spark, r) match {
          case VVec(ps) => ps.map(_.toString)
          case x => throw new IllegalArgumentException(s"de: bad lambda args $x")
        }
        val body = readObj(spark, r) match {
          case VAtom(s: String) => s
          case x => throw new IllegalArgumentException(s"de: bad lambda body $x")
        }
        VFn(args.toList, Rayfall.parseAll(body))
      case 101 | 102 | 103 => // native fn by internal name: the name
        VAtom(r.nulTerm())
      case 127 =>
        val code = r.u8(); val ctx = r.i64()
        val msg = if (r.remaining > 0) r.nulTerm() else s"error $code ($ctx)"
        throw new RayfallError(msg)
      case x => throw new IllegalArgumentException(s"de: unknown type tag $x")
    }
  }

  /** Decode one full `ser` frame (header validated). */
  def deserialize(spark: org.apache.spark.sql.SparkSession,
                  frame: Array[Byte]): RVal = {
    require(frame.length >= HeaderLen, "de: frame shorter than its header")
    val r = new R(frame)
    val prefix = r.i32().toLong & 0xffffffffL
    require(prefix == Prefix,
      f"de: bad prefix 0x$prefix%08x (expected 0x$Prefix%08x)")
    val ver = r.u8() // de_obj rejects frames newer than the build
    require(ver <= Version, s"de: unsupported version $ver (max $Version)")
    r.u8(); r.u8(); r.u8()
    val size = r.i64()
    require(size == frame.length - HeaderLen,
      s"de: payload size $size != ${frame.length - HeaderLen}")
    readObj(spark, r)
  }
}
