package graft

import graft.rayfall.Rayfall

/** The IPC client/server surface (reference `core/ipc.c`,
  * `examples/ipc.rfl`): hopen "host:port", remote application via
  * `(write h (list 'f args…))`, code-as-string frames, remote table
  * results, `.z.po`/`.z.pc`/`.z.w` handle hooks, error propagation. */
class IpcSpec extends SparkSpec {

  test("the ipc.rfl flow runs verbatim: .z.po/.z.pc fire, (write h " +
      "(list 'f)) returns .z.w (the connection handle)") {
    val log = java.nio.file.Files.createTempFile("graft_ipc_log", ".rfl")
    java.nio.file.Files.delete(log)
    // the ipc.rfl server script, with the Open/Close printlns journaled
    // so the callback side effects are observable from the test
    val server = Rayfall.serveIpc(spark, 0, Map.empty,
      s"""(set j (hopen "$log"))
         |(set .z.po (fn [x] (write j (list 'open x))))
         |(set .z.pc (fn [x] (write j (list 'close x))))
         |(set f (fn [] .z.w))""".stripMargin)
    try {
      // the ipc.rfl client script, verbatim shape
      val got = Rayfall.scriptValue(spark,
        s"""(set h (hopen "127.0.0.1:${server.port}"))
           |(set r (write h (list 'f)))
           |(hclose h)
           |r""".stripMargin)
      val handle = got match {
        case Rayfall.VAtom(l: java.lang.Long) => l.longValue
        case x => fail(s"expected a handle id, got $x")
      }
      assert(handle >= 3L, s"handle $handle")
      // wait for the close callback to land in the journal — records
      // are binary ser_raw apply lists since round 10
      def records: Seq[Seq[Any]] =
        // a concurrent append can expose a torn partial record — treat
        // an unparseable snapshot as "not yet" and keep polling
        scala.util.Try(
          graft.rayfall.RaySerde.deserializeRawStream(spark,
            java.nio.file.Files.readAllBytes(log)).collect {
            case Rayfall.VVec(xs) => xs.toSeq
          }).getOrElse(Seq.empty)
      val deadline = System.currentTimeMillis + 5000
      while (!records.exists(_.headOption.contains("close")) &&
          System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(records.contains(Seq("open", handle)), records.toString)
      assert(records.contains(Seq("close", handle)), records.toString)
    } finally {
      server.stop()
      java.nio.file.Files.deleteIfExists(log)
    }
  }

  test("remote calls with args, code-as-string frames, and persistent " +
      "server state across frames") {
    val server = Rayfall.serveIpc(spark, 0, Map.empty,
      "(set add (fn [a b] (+ a b)))")
    try {
      val v = Rayfall.scriptValue(spark,
        s"""(set h (hopen "127.0.0.1:${server.port}"))
           |(set x (write h (list 'add 19 23)))
           |(write h "(set n 8)")
           |(set y (write h "(* n n)"))
           |(hclose h)
           |(+ x y)""".stripMargin)
      assert(v == Rayfall.VAtom(106L), s"got $v") // 42 + 64
    } finally server.stop()
  }

  test("async writes via the negated handle: fire-and-forget, applied " +
      "in order before the next sync call") {
    val server = Rayfall.serveIpc(spark, 0, Map.empty, "(set n 1)")
    try {
      val v = Rayfall.scriptValue(spark,
        s"""(set h (hopen "127.0.0.1:${server.port}"))
           |(set a (neg h))
           |(set r1 (write a "(set n (* n 3))"))
           |(write a "(set n (+ n 4))")
           |(set r2 (write h "n"))
           |(hclose h)
           |(list r1 r2)""".stripMargin)
      v match {
        case Rayfall.VVec(xs) =>
          // async write returns nil immediately; the sync read observes
          // BOTH async frames already applied (same-socket ordering)
          assert(xs(0) == null || xs(0) == Rayfall.VAtom(null), s"r1=${xs(0)}")
          assert(xs(1) == 7L || xs(1) == Rayfall.VAtom(7L), s"r2=${xs(1)}")
        case x => fail(s"got $x")
      }
    } finally server.stop()
  }

  test("a remote select returns a TABLE the client can keep querying; " +
      "remote errors surface as script errors") {
    val li = Tables.load(spark, sf, "lineitem")
    val server = Rayfall.serveIpc(spark, 0, Map("lineitem" -> li))
    try {
      val v = Rayfall.scriptValue(spark,
        s"""(set h (hopen "127.0.0.1:${server.port}"))
           |(set t (write h "(select {n: (count l_quantity)
           |                          from: lineitem by: l_returnflag})"))
           |(hclose h)
           |(count (at t 'n))""".stripMargin)
      // 3 return flags at this SF
      assert(v == Rayfall.VAtom(3L), s"got $v")

      val err = intercept[Rayfall.RayfallError] {
        Rayfall.scriptValue(spark,
          s"""(set h (hopen "127.0.0.1:${server.port}"))
             |(write h "(raise \\"remote boom\\")")""".stripMargin)
      }
      assert(err.getMessage.contains("remote boom"), err.getMessage)
    } finally server.stop()
  }

  test("apply messages carry dates, booleans and vector args as VALUES " +
      "(both sides accept the same literal set; unsupported args fail " +
      "fast client-side)") {
    val server = Rayfall.serveIpc(spark, 0, Map.empty,
      "(set probe (fn [b d v] (list b d (sum v))))")
    try {
      val v = Rayfall.scriptValue(spark,
        s"""(set h (hopen "127.0.0.1:${server.port}"))
           |(set r (write h (list 'probe true 2024.01.02 [1 2 3])))
           |(hclose h)
           |r""".stripMargin)
      v match {
        case Rayfall.VVec(xs) =>
          assert(xs(0) == true || xs(0) == java.lang.Boolean.TRUE, s"$xs")
          assert(xs(1).toString.startsWith("2024-01-02") ||
            xs(1) == java.time.LocalDate.of(2024, 1, 2), s"$xs")
          assert(xs(2) == 6L, s"$xs")
        case x => fail(s"got $x")
      }
    } finally server.stop()
  }

  test("the CLIENT's wire: a hand-rolled raw-socket peer sees the " +
      "[version,0] handshake and a framed C8 sync message, and its ser " +
      "reply comes back as the script value") {
    import graft.rayfall.RaySerde
    val ss = new java.net.ServerSocket(0)
    @volatile var seen: Option[(Int, Rayfall.RVal)] = None
    val peer = new Thread(() => {
      val s = ss.accept()
      val in = new java.io.DataInputStream(s.getInputStream)
      val out = s.getOutputStream
      // handshake: read to the NUL, reply one version byte
      while (in.read() != 0) ()
      out.write(1); out.flush()
      val frame = RaySerde.readFrame(in)
      seen = Some((RaySerde.frameMsgType(frame),
        RaySerde.deserialize(spark, frame)))
      out.write(RaySerde.serialize(Rayfall.VAtom(java.lang.Long.valueOf(7L)),
        msgtype = 2))
      out.flush(); s.close()
    })
    peer.setDaemon(true); peer.start()
    try {
      val v = Rayfall.scriptValue(spark,
        s"""(set h (hopen "127.0.0.1:${ss.getLocalPort}"))
           |(set r (write h "(+ 1 2)"))
           |(hclose h)
           |r""".stripMargin)
      assert(v == Rayfall.VAtom(7L), s"got $v")
      peer.join(5000)
      assert(seen == Some((1, Rayfall.VAtom("(+ 1 2)"))),
        s"peer saw $seen") // sync msgtype 1, C8 code text verbatim
    } finally ss.close()
  }

  test("the WIRE is the reference binary protocol: 2-byte handshake, " +
      "0xcefadefa-framed C8 sync message, msgtype-2 ser response " +
      "(core/ipc.c:63-98, serde.h:30-41)") {
    import graft.rayfall.RaySerde
    val server = Rayfall.serveIpc(spark, 0)
    try {
      val sock = new java.net.Socket("127.0.0.1", server.port)
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      val in = new java.io.DataInputStream(sock.getInputStream)
      // handshake: client sends [version, 0]; the server replies ONE
      // byte, its version (ipc_read_handshake, core/ipc.c:296-300)
      out.write(Array[Byte](1, 0)); out.flush()
      val hs = new Array[Byte](1); in.readFully(hs)
      assert(hs(0) == 1, s"server version byte ${hs(0)}")
      // hand-built sync frame: header + C8 "(+ 40 2)"
      val code = "(+ 40 2)".getBytes("UTF-8")
      out.write(Array[Byte](0xfa.toByte, 0xde.toByte, 0xfa.toByte,
        0xce.toByte, 1, 0, 0, 1)) // prefix LE, version, flags, endian, SYNC
      val size = 1 + 1 + 8 + code.length // tag + attrs + i64 len + chars
      out.write(Array[Byte](size.toByte, 0, 0, 0, 0, 0, 0, 0))
      out.write(12); out.write(0)
      out.write(Array[Byte](code.length.toByte, 0, 0, 0, 0, 0, 0, 0))
      out.write(code); out.flush()
      // the response is a ser frame with msgtype 2 carrying i64 42
      val resp = RaySerde.readFrame(in)
      assert(RaySerde.frameMsgType(resp) == 2)
      assert(RaySerde.deserialize(spark, resp) == Rayfall.VAtom(42L))
      sock.close()
    } finally server.stop()
  }

  test("only LIST frames apply: a sync SYMBOL-VECTOR data frame echoes " +
      "back unchanged (eval of a symbol vector is itself, " +
      "core/eval.c:884-893), and a stray msgtype-2 frame gets NO reply " +
      "(the reference replies only to MSG_TYPE_SYNC)") {
    import graft.rayfall.RaySerde
    val server = Rayfall.serveIpc(spark, 0, Map.empty,
      "(set a (fn [b] (raise \"must not apply\")))")
    try {
      val sock = new java.net.Socket("127.0.0.1", server.port)
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      val in = new java.io.DataInputStream(sock.getInputStream)
      out.write(Array[Byte](1, 0)); out.flush()
      val hs = new Array[Byte](1); in.readFully(hs)
      // 1: symbol-vector DATA ['a 'b] as sync — tag 6, NOT an apply,
      // even though it decodes to a string-headed VVec whose head is
      // a bound unary function
      val symVec = Rayfall.VVec(Vector("a", "b"))
      val dataFrame = RaySerde.serialize(symVec, msgtype = 1)
      assert(RaySerde.frameTypeTag(dataFrame) == 6)
      out.write(dataFrame); out.flush()
      val echo = RaySerde.readFrame(in)
      assert(RaySerde.deserialize(spark, echo) == symVec,
        s"got ${RaySerde.deserialize(spark, echo)}")
      // 2: a stray RESPONSE frame evaluates silently (no reply) — the
      // next sync call's reply must be the sync call's value, not an
      // unsolicited reply to the response frame
      out.write(RaySerde.serialize(Rayfall.VAtom("(set zz 5)"),
        msgtype = 2))
      out.write(RaySerde.serialize(Rayfall.VAtom("zz"), msgtype = 1))
      out.flush()
      val next = RaySerde.readFrame(in)
      assert(RaySerde.deserialize(spark, next) == Rayfall.VAtom(5L),
        "the first reply after a response frame must answer the SYNC call")
      sock.close()
    } finally server.stop()
  }
}
