package graft.kx

import graft.rayfall.Rayfall
import graft.rayfall.Rayfall._

/** The `raykx` kdb+ bridge (`/root/reference/ext/raykx/raykx.c`),
  * surfaced exactly as the reference surfaces it — public functions a
  * script binds via `loadfn` (`ext/raykx/raykx.rfl`):
  *
  * {{{
  * (set .kx.listen (loadfn "graft.kx.RayKx" "listen" 1))
  * (set .kx.hopen  (loadfn "graft.kx.RayKx" "hopen"  1))
  * (set .kx.hclose (loadfn "graft.kx.RayKx" "hclose" 1))
  * (set .kx.send   (loadfn "graft.kx.RayKx" "send"   2))
  * }}}
  *
  * `listen` makes this engine speak the kdb wire protocol as a SERVER
  * (kdb/q clients connect, send char-vector queries, get kdb-typed
  * results back — queries evaluate as Rayfall script against the env
  * registered with `bind`); `hopen`/`send`/`hclose` are the CLIENT side
  * (connect to a kdb-speaking process, ship a query, decode the typed
  * reply into script values — tables included). The wire codec is
  * `KdbSerde` (public protocol description; golden frames pinned in
  * KxSpec against the documented example bytes). */
object RayKx {

  private final case class Conn(sock: java.net.Socket,
                                in: java.io.DataInputStream,
                                out: java.io.OutputStream)

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)
  private val conns = new java.util.concurrent.ConcurrentHashMap[Long, Conn]()
  private val servers =
    new java.util.concurrent.ConcurrentHashMap[Long, java.net.ServerSocket]()

  @volatile private var ctx
      : Option[(org.apache.spark.sql.SparkSession,
                Map[String, org.apache.spark.sql.DataFrame])] = None

  /** Register the evaluation context `listen` serves queries against. */
  def bind(spark: org.apache.spark.sql.SparkSession,
           tables: Map[String, org.apache.spark.sql.DataFrame]): Unit =
    ctx = Some((spark, tables))

  private def readFrame(in: java.io.DataInputStream): Array[Byte] = {
    val head = new Array[Byte](8)
    in.readFully(head)
    val len = (head(4) & 0xff) | ((head(5) & 0xff) << 8) |
      ((head(6) & 0xff) << 16) | ((head(7) & 0xff) << 24)
    require(len >= 8 && len <= (64 << 20), s"kx: bad frame length $len")
    val rest = new Array[Byte](len - 8)
    in.readFully(rest)
    head ++ rest
  }

  /** SERVER: accept kdb-wire clients on `port` (0 = ephemeral; the bound
    * port returns). Handshake per the public protocol: credentials up to
    * a NUL byte, one capability byte echoed back. Char-vector payloads
    * evaluate as script; errors return as −128 frames. */
  def listen(port: Long): Long = {
    val (spark, tables) = ctx.getOrElse(throw new IllegalStateException(
      "kx listen: call RayKx.bind(spark, tables) first"))
    val ss = new java.net.ServerSocket(port.toInt)
    servers.put(ss.getLocalPort.toLong, ss)
    val t = new Thread(() => {
      try while (true) {
        val sock = ss.accept()
        val worker = new Thread(() => {
          try {
            val in = new java.io.DataInputStream(
              new java.io.BufferedInputStream(sock.getInputStream))
            val out = sock.getOutputStream
            // handshake: read through the NUL terminator, echo capability
            var cap = 0
            var b = in.read()
            while (b > 0) { cap = b; b = in.read() }
            out.write(math.min(cap, 3)); out.flush()
            while (true) {
              val frame = readFrame(in)
              val reply = try {
                val (_, v) = KdbSerde.decodeMsg(spark, frame)
                val res = v match {
                  case VAtom(code: String) =>
                    Rayfall.scriptValue(spark, code, tables)
                  case other => other // echo non-query payloads
                }
                KdbSerde.encodeMsg(res, msgType = 2)
              } catch {
                case e: Exception => KdbSerde.encodeError(
                  Option(e.getMessage).getOrElse(e.toString).take(200))
              }
              out.write(reply); out.flush()
            }
          } catch { case _: java.io.IOException => () }
          finally { try sock.close() catch { case _: Exception => () } }
        }, "raykx-conn")
        worker.setDaemon(true)
        worker.start()
      } catch { case _: java.io.IOException => () }
    }, "raykx-listen")
    t.setDaemon(true)
    t.start()
    ss.getLocalPort.toLong
  }

  /** CLIENT: connect + handshake ("user:pass" + capability 3 + NUL). */
  def hopen(hostport: String): Long = {
    val Array(host, port) = hostport.split(":")
    val sock = new java.net.Socket(host, port.toInt)
    val out = sock.getOutputStream
    out.write("anonymous:".getBytes("UTF-8")); out.write(3); out.write(0)
    out.flush()
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val cap = in.read()
    require(cap >= 0, "kx hopen: server closed during handshake")
    val h = seq.incrementAndGet()
    conns.put(h, Conn(sock, in, out))
    h
  }

  /** CLIENT: sync query (char vector, msgType 1) → decoded reply value. */
  def send(h: Long, query: String): RVal = {
    val c = Option(conns.get(h)).getOrElse(
      throw new IllegalArgumentException(s"kx send: no handle $h"))
    c.out.write(KdbSerde.encodeMsg(VAtom(query), msgType = 1))
    c.out.flush()
    val (spark, _) = ctx.getOrElse(throw new IllegalStateException(
      "kx send: call RayKx.bind(spark, tables) first (table decode needs a session)"))
    KdbSerde.decodeMsg(spark, readFrame(c.in))._2
  }

  def hclose(h: Long): RVal = {
    Option(conns.remove(h)).foreach(c =>
      try c.sock.close() catch { case _: Exception => () })
    VAtom(null)
  }

  /** Stop a server previously started by `listen`. */
  def stopListen(port: Long): Unit =
    Option(servers.remove(port)).foreach(s =>
      try s.close() catch { case _: Exception => () })
}
