package graft

import graft.rayfall.{RaySerde, Rayfall}
import graft.rayfall.Rayfall._

/** The reference's binary `ser`/`de` wire format (core/serde.c,
  * serde.h header; worked byte examples in
  * docs/.../documentation/serialization.md) — golden frames pinned
  * byte-for-byte against the DOCUMENTED output, full round-trips for
  * every value-model shape, and sentinel-null mapping. */
class RaySerdeSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def rt(v: RVal): RVal =
    RaySerde.deserialize(spark, RaySerde.serialize(v))

  test("golden frames match the documented bytes (serialization.md:14-22)") {
    // (ser 42): prefix fa de fa ce, version 01, flags/endian/msgtype 00,
    // size 9 (i64 LE), then i64 atom −5 (0xfb) + 42 LE
    assert(hex(RaySerde.serialize(VAtom(java.lang.Long.valueOf(42L)))) ==
      "fadeface" + "01" + "000000" + "0900000000000000" +
        "fb" + "2a00000000000000")
    // (ser "hello"): size 15 = tag + attrs + i64 len + 5 chars (C8 vec)
    assert(hex(RaySerde.serialize(VAtom("hello"))) ==
      "fadeface" + "01" + "000000" + "0f00000000000000" +
        "0c" + "00" + "0500000000000000" + "68656c6c6f")
    // (ser [1 2 3]): size 0x22 = 34 = tag + attrs + len + 3×8 (I64 vec)
    assert(hex(RaySerde.serialize(VVec(Vector(1L, 2L, 3L)))) ==
      "fadeface" + "01" + "000000" + "2200000000000000" +
        "05" + "00" + "0300000000000000" +
        "0100000000000000" + "0200000000000000" + "0300000000000000")
  }

  test("round-trips: atoms, typed vectors (with sentinel nulls), mixed " +
      "lists, dicts, dates") {
    assert(rt(VAtom(null)) == VAtom(null)) // the reference's own lang.c test
    assert(rt(VAtom(java.lang.Boolean.TRUE)) == VAtom(true))
    assert(rt(VAtom(java.lang.Long.valueOf(-42L))) == VAtom(-42L))
    assert(rt(VAtom(java.lang.Double.valueOf(150.25))) == VAtom(150.25))
    assert(rt(VAtom("two words")) == VAtom("two words"))
    val d = java.time.LocalDate.of(2026, 8, 14)
    assert(rt(VAtom(d)) == VAtom(d))
    assert(rt(VVec(Vector(5L, 3L, 8L))) == VVec(Vector(5L, 3L, 8L)))
    // a null long element travels as NULL_I64 and comes back null
    assert(rt(VVec(Vector(5L, null, 8L))) == VVec(Vector(5L, null, 8L)))
    assert(rt(VVec(Vector(1.5, null, -0.25))) == VVec(Vector(1.5, null, -0.25)))
    assert(rt(VVec(Vector("AAPL", "MSFT"))) == VVec(Vector("AAPL", "MSFT")))
    assert(rt(VVec(Vector(d, null))) == VVec(Vector(d, null)))
    assert(rt(VVec(Vector(true, false))) == VVec(Vector(true, false)))
    assert(rt(VVec(Vector(1L, "mix", 2.5))) == VVec(Vector(1L, "mix", 2.5)))
    assert(rt(VDict(Vector("symbol", "price"), Vector("AAPL", 150.25))) ==
      VDict(Vector("symbol", "price"), Vector("AAPL", 150.25)))
  }

  test("repr fidelity: symbol atoms, C8 vectors, symbol vectors and " +
      "general LISTs each re-serialize byte-exactly after de (the wire " +
      "tag is carried — serde.c layouts, the strings-vs-symbols caveat)") {
    def reser(frameHex: String): String =
      hex(RaySerde.serialize(RaySerde.deserialize(spark, unhex(frameHex))))
    // symbol ATOM 'abC (−6 = 0xfa, NUL-terminated) — must NOT flip to C8
    val symAtom = "fadeface" + "01" + "000000" + "0500000000000000" +
      "fa" + "61624300"
    assert(reser(symAtom) == symAtom)
    // C8 vector "hello" (tag 12) — stays C8
    val c8 = "fadeface" + "01" + "000000" + "0f00000000000000" +
      "0c" + "00" + "0500000000000000" + "68656c6c6f"
    assert(reser(c8) == c8)
    // symbol VECTOR [ab c] (tag 6) — stays a symbol vector
    val symVec = "fadeface" + "01" + "000000" + "0f00000000000000" +
      "06" + "00" + "0200000000000000" + "616200" + "6300"
    assert(reser(symVec) == symVec)
    // general LIST of two C8 strings (tag 0 of tag 12s) — must NOT
    // re-pack as a symbol vector
    val listOfC8 = "fadeface" + "01" + "000000" + "2100000000000000" +
      "00" + "00" + "0200000000000000" +
      "0c" + "00" + "0200000000000000" + "6162" +
      "0c" + "00" + "0100000000000000" + "63"
    assert(reser(listOfC8) == listOfC8)
    // a LIST of i64 atoms likewise stays a LIST (not an i64 vector)
    val listOfI64 = "fadeface" + "01" + "000000" + "1c00000000000000" +
      "00" + "00" + "0200000000000000" +
      "fb" + "0100000000000000" + "fb" + "0200000000000000"
    assert(reser(listOfI64) == listOfI64)
    // the script's quoted symbol serializes as a symbol atom while the
    // VALUE stays the shared string repr (equality unaffected)
    assert(hex(RaySerde.serialize(VAtom.sym("abC"))) == symAtom)
    assert(VAtom.sym("abC") == VAtom("abC"))
    assert(RaySerde.deserialize(spark, unhex(symAtom)) == VAtom("abC"))
  }

  test("element-level symbol repr: a native LIST [sym, i64] round-trips " +
      "byte-exactly, a quoted symbol in a list sers as -6, and a mixed " +
      "C8/sym list keeps each element's own repr") {
    def reser(frameHex: String): String =
      hex(RaySerde.serialize(RaySerde.deserialize(spark, unhex(frameHex))))
    // native apply-shaped LIST [symbol 'f, i64 1] — the journal/IPC
    // record layout; de -> ser must keep the -6 head, not flip to C8
    val applyList = "fadeface" + "01" + "000000" + "1600000000000000" +
      "00" + "00" + "0200000000000000" +
      "fa" + "6600" + "fb" + "0100000000000000"
    assert(reser(applyList) == applyList)
    // the same bytes come from the script-built list: (list 'f 1)
    val v = VVec(Vector("f", 1L))
    v.symElems = Set(0)
    v.wireTag = 0
    assert(hex(RaySerde.serialize(v)) == applyList)
    // mixed ("a", 'b): LIST [C8 "a", sym 'b] — neither a symbol vector
    // nor all-C8
    val m = VVec(Vector("a", "b"))
    m.symElems = Set(1)
    assert(hex(RaySerde.serialize(m)).endsWith(
      "00" + "00" + "0200000000000000" +
        "0c" + "00" + "0100000000000000" + "61" + "fa" + "6200"))
    // all-symbol lists still infer the symbol VECTOR (tag 6)
    val s = VVec(Vector("a", "b"))
    s.symElems = Set(0, 1)
    assert(hex(RaySerde.serialize(s)).endsWith(
      "06" + "00" + "0200000000000000" + "6100" + "6200"))
  }

  test("string vectors are SYMBOL vectors, strings are C8 vectors (the " +
      "script literal types); symbol atoms decode to the shared repr") {
    val sv = RaySerde.serialize(VVec(Vector("ab", "c")))
    // payload: tag 6, attrs, len 2, "ab\0", "c\0"
    assert(hex(sv).endsWith("06" + "00" + "0200000000000000" + "616200" + "6300"))
    // a symbol ATOM (−6, NUL-terminated) decodes to the same string repr
    val frame = unhex("fadeface" + "01" + "000000" + "0500000000000000" +
      "fa" + "61624300")
    assert(RaySerde.deserialize(spark, frame) == VAtom("abC"))
  }

  test("temporal/guid/narrow-int frames decode per the layout: i16/i32/u8 " +
      "widen, TIME=ms, TIMESTAMP shifts 2000->1970 ns, sentinels go null") {
    def de(bodyHex: String): RVal = {
      val body = unhex(bodyHex)
      val szHex = f"${body.length}%02x" + "00000000000000"
      RaySerde.deserialize(spark,
        unhex("fadeface" + "01" + "000000" + szHex + bodyHex))
    }
    assert(de("fd" + "0700") == VAtom(7L))              // i16 atom −3
    assert(de("fd" + "0080") == VAtom(null))            // NULL_I16
    assert(de("fc" + "07000000") == VAtom(7L))          // i32 atom −4
    assert(de("fc" + "00000080") == VAtom(null))        // NULL_I32
    assert(de("fb" + "0000000000000080") == VAtom(null)) // NULL_I64
    assert(de("fe" + "ff") == VAtom(255L))              // u8 atom −2
    assert(de("f8" + "e8030000") == VAtom(1000L))       // time −8: ms
    // timestamp −9: 1e9 ns past 2000.01.01 → epoch-1970 nanos
    assert(de("f7" + "00ca9a3b00000000") == VAtom(946684801000000000L))
    assert(de("f9" + "01000000") ==                      // date −7
      VAtom(java.time.LocalDate.of(2000, 1, 2)))
    assert(de("f5" + "00112233445566778899aabbccddeeff") ==
      VAtom("00112233-4455-6677-8899-aabbccddeeff"))    // guid −11
    assert(de("f4" + "41") == VAtom("A"))               // c8 atom −12
    // u8 VECTOR (2) widens to longs; error frame (127) raises
    assert(de("02" + "00" + "0200000000000000" + "01ff") ==
      VVec(Vector(1L, 255L)))
    val e = intercept[Rayfall.RayfallError](
      de("7f" + "08" + "0000000000000000" + "626f6f6d00"))
    assert(e.getMessage.contains("boom"))
  }

  test("tables and lambdas round-trip (lambda body travels as source, " +
      "the documented encoding); bad prefix/size fail fast") {
    import spark.implicits._
    val t = VTab(Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "s", "v"))
    rt(t) match {
      case VTab(df) =>
        assert(df.columns.toSeq == Seq("id", "s", "v"))
        assert(df.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
          Set((1L, "x", 1.5), (2L, "y", 2.5)))
      case x => fail(s"expected table, got $x")
    }
    val fn = Rayfall.scriptValue(spark, "(fn [x y] (+ (* x x) y))")
    rt(fn.asInstanceOf[RVal]) match {
      case f: VFn =>
        assert(f.params == Seq("x", "y"))
      case x => fail(s"expected lambda, got $x")
    }
    // the deserialized lambda is CALLABLE with the same semantics
    val out = Rayfall.scriptValue(spark,
      "(set f (de (ser (fn [x y] (+ (* x x) y))))) (f 6 7)")
    assert(out == VAtom(43L))
    intercept[IllegalArgumentException](
      RaySerde.deserialize(spark, unhex("deadbeef" + "01" + "000000" +
        "0100000000000000" + "7e")))
    intercept[IllegalArgumentException](
      RaySerde.deserialize(spark, unhex("fadeface" + "01" + "000000" +
        "0900000000000000" + "7e"))) // size lies
  }

  test("(set \"path\" v) persists the binary ser file (core/binary.c:85) " +
      "and (get) reads both it and a frame written by hand") {
    val dir = java.nio.file.Files.createTempDirectory("graft_serfile")
    val p1 = s"$dir/d.bin"
    val v = Rayfall.scriptValue(spark,
      s"""(set "$p1" (dict [a b] (list 1 2.5))) (get "$p1")""")
    assert(v == VDict(Vector("a", "b"), Vector(1L, 2.5)), s"got $v")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p1))
    assert(hex(bytes.take(4)) == "fadeface", "file must carry the ser magic")
    // a frame produced by the codec directly (stand-in for a native
    // peer's ser_obj write) reads back through script (get)
    val p2 = s"$dir/peer.bin"
    java.nio.file.Files.write(java.nio.file.Paths.get(p2),
      RaySerde.serialize(VVec(Vector(10L, 20L, 30L))))
    assert(Rayfall.scriptValue(spark, s"""(get "$p2")""") ==
      VVec(Vector(10L, 20L, 30L)))
    // pre-round-10 s-expr text files still load
    val p3 = s"$dir/legacy.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p3), "(+ 40 2)")
    assert(Rayfall.scriptValue(spark, s"""(get "$p3")""") == VAtom(42L))
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("journals append headerless ser_raw records (core/io.c:343) and " +
      "(read h) replays apply records through the evaluator") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jnl")
    val p = s"$dir/j.jnl"
    Rayfall.scriptValue(spark,
      s"""(set h (hopen "$p"))
         |(write h (list 'f 1 2))
         |(write h 42)
         |(hclose h)""".stripMargin)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // record 1: LIST tag 0, attrs, count 3, symbol 'f', i64 1, i64 2;
    // record 2: i64 atom 42 — NO per-record header (the journal layout)
    assert(hex(bytes) ==
      "00" + "00" + "0300000000000000" + "fa" + "6600" +
        "fb" + "0100000000000000" + "fb" + "0200000000000000" +
        "fb" + "2a00000000000000", hex(bytes))
    // replay: f applies to the journaled VALUES; last record is 42
    val v = Rayfall.scriptValue(spark,
      s"""(set f (fn [a b] (+ a b)))
         |(set h (hopen "$p"))
         |(read h)""".stripMargin)
    assert(v == VAtom(42L), s"got $v")
    // appending to a PRE-round-10 TEXT journal stays text, so the
    // mixed file replays end-to-end instead of becoming unreadable
    val pt = s"$dir/legacy.jnl"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(pt), "(g 5)\n")
    val v2 = Rayfall.scriptValue(spark,
      s"""(set g (fn [a] (* a 10)))
         |(set h (hopen "$pt"))
         |(write h (list 'g 7))
         |(read h)""".stripMargin)
    assert(v2 == VAtom(70L), s"got $v2") // last record: (g 7)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(pt)), "UTF-8").startsWith("(g 5)"),
      "legacy journal must stay text")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("a foreign tag-6 symbol-vector journal record replays as its " +
      "VALUE — only LIST (tag 0) records apply (eval_obj returns " +
      "symbol vectors unchanged, core/eval.c:884-893)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jnl6")
    val p = java.nio.file.Paths.get(s"$dir/sym.jnl")
    // a native peer journals the symbol vector ['f 'x] as DATA: the
    // record is tag 6, not the in-repo writer's tag-0 apply form
    val rec = RaySerde.serializeRawObj(VVec(Vector("f", "x")))
    assert((rec(0) & 0xff) == 6, hex(rec)) // pinned: it IS a tag-6 record
    java.nio.file.Files.write(p, rec)
    val v = Rayfall.scriptValue(spark,
      s"""(set f (fn [a] (raise "must not apply")))
         |(set h (hopen "$p"))
         |(read h)""".stripMargin)
    assert(v == VVec(Vector("f", "x")), s"got $v")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("de rejects frames with a version newer than the build " +
      "(de_obj, core/serde.c)") {
    val frame = RaySerde.serialize(VAtom(java.lang.Long.valueOf(42L)))
    frame(4) = (RaySerde.Version + 1).toByte
    val err = intercept[IllegalArgumentException] {
      RaySerde.deserialize(spark, frame)
    }
    assert(err.getMessage.contains("version"), err.getMessage)
  }

  test("a legacy TEXT journal whose first record is a bare symbol in " +
      "the 'b'..'d'/'~' byte range still sniffs as text (the full " +
      "binary-parse disambiguation)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jnlb")
    val pt = java.nio.file.Paths.get(s"$dir/bare.jnl")
    // first byte 'b' = 98 = the TABLE tag — the naive first-byte sniff
    // called this binary and appended raw bytes, corrupting the file
    java.nio.file.Files.writeString(pt, "banana\n")
    val v = Rayfall.scriptValue(spark,
      s"""(set banana 5)
         |(set g (fn [a] (* a 10)))
         |(set h (hopen "$pt"))
         |(write h (list 'g 7))
         |(read h)""".stripMargin)
    assert(v == VAtom(70L), s"got $v")
    assert(new String(java.nio.file.Files.readAllBytes(pt), "UTF-8")
      .startsWith("banana\n(g 7)"), "journal must stay text")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("script surface: (ser x) is a U8 byte vector with the documented " +
      "header; (de (ser ...)) round-trips through script values") {
    val bytes = Rayfall.scriptValue(spark, "(ser 42)") match {
      case VVec(xs) => xs.map(_.asInstanceOf[Long])
      case x => fail(s"expected byte vector, got $x")
    }
    assert(bytes.length == 25) // 16 header + 1 tag + 8 payload
    assert(bytes.take(4) == Vector(0xfaL, 0xdeL, 0xfaL, 0xceL))
    assert(Rayfall.scriptValue(spark, "(de (ser 42))") == VAtom(42L))
    assert(Rayfall.scriptValue(spark,
      "(de (ser (dict [a b] (list 1 2))))") match {
      case VDict(ks, _) => ks == Vector("a", "b")
      case _ => false
    })
  }
}
