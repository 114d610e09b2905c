package graft.cdc.pgwire

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import scala.jdk.CollectionConverters._
import PgWire._

/**
 * In-process fake Postgres walsender for byte-level client tests: speaks
 * the backend side of the v3 protocol over a real localhost socket —
 * startup/auth, the simple-query subprotocol for replication metadata,
 * and `START_REPLICATION` → CopyBoth with a scripted XLogData stream.
 * This is the test double for the dockerized Postgres of the reference's
 * `pkg/pgrepl/replicator_test.go:22-40` (zero-egress build: no docker).
 *
 * @param auth          Trust, Md5(password) or Silent (accept then never
 *                      respond — exercises the client's read timeout)
 * @param slotLsn       confirmed_flush_lsn of a pre-existing slot, if any
 * @param consistentPoint LSN returned by CREATE_REPLICATION_SLOT
 * @param stream        wal2json payloads, one XLogData frame each,
 *                      `(walStart, payload)`
 * @param trailer       extra raw CopyData bodies sent after the script
 *                      (keepalives, unknown sub-messages)
 */
final class FakeWalsender(
    auth: FakeWalsender.Auth = FakeWalsender.Trust,
    slotLsn: Option[Long] = None,
    consistentPoint: Long = 0x3910B898L,
    publications: Map[String, Seq[(String, String)]] = Map.empty,
    stream: Seq[(Long, String)] = Nil,
    trailer: Seq[Array[Byte]] = Nil) extends AutoCloseable {

  import FakeWalsender._

  private val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort

  val queries = new ConcurrentLinkedQueue[String]()
  val createdSlots = new ConcurrentLinkedQueue[String]()
  val standbyAcks = new ConcurrentLinkedQueue[Long]()
  private val streamed = new CountDownLatch(1)
  @volatile private var failure: Option[Throwable] = None

  private val thread = new Thread(() => {
    try serve(server.accept())
    catch { case t: Throwable => failure = Some(t) }
  }, s"fake-walsender-$port")
  thread.setDaemon(true)
  thread.start()

  /** Blocks until the scripted stream has been fully written. */
  def awaitStreamed(timeoutMs: Long = 30000): Unit = {
    require(streamed.await(timeoutMs, TimeUnit.MILLISECONDS), "stream script never ran")
  }

  def acks: Seq[Long] = standbyAcks.asScala.toSeq

  /** Rethrow any protocol error the server thread hit (call from asserts). */
  def check(): Unit = failure.foreach(t => throw new AssertionError("fake walsender failed", t))

  @volatile private var stopped = false

  override def close(): Unit = {
    stopped = true
    scala.util.Try(server.close())
    ()
  }

  // ------------------------------------------------------------ protocol

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

    // startup message: len + protocol + c-string params
    val len = in.readInt()
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    val proto = ByteBuffer.wrap(body).getInt
    require(proto == 196608, s"unexpected protocol $proto")
    val params = parseStartupParams(body.drop(4))
    require(params.get("replication").contains("database"),
      s"client did not request replication=database: $params")
    val user = params.getOrElse("user", "")

    auth match {
      case Trust =>
        writeMessage(out, MsgAuthentication, int32(0))
      case Md5(expectedPassword) =>
        val salt = Array[Byte](0x0a, 0x0b, 0x0c, 0x0d)
        writeMessage(out, MsgAuthentication, int32(5) ++ salt)
        val pm = readMessage(in)
        require(pm.tpe == MsgPassword, s"expected password message, got ${pm.tpe.toChar}")
        val got = cstring(pm.body)
        val expect = expectedCredential(expectedPassword, user, salt)
        if (got != expect) {
          writeMessage(out, MsgErrorResponse, errorBody("28P01", s"password authentication failed for user \"$user\""))
          sock.close()
          return
        }
        writeMessage(out, MsgAuthentication, int32(0))
      case Silent =>
        // accept the startup and go quiet: the client's soTimeout must fire
        Thread.sleep(3600 * 1000L)
    }

    writeMessage(out, MsgParameterStatus, cstr("server_version") ++ cstr("16.3 (fake)"))
    writeMessage(out, MsgBackendKeyData, int32(4242) ++ int32(117))
    writeMessage(out, MsgReadyForQuery, Array[Byte]('I'))

    var open = true
    while (open) {
      val m =
        try readMessage(in)
        catch { case _: java.io.EOFException => return }
      m.tpe match {
        case MsgQuery =>
          val sql = cstring(m.body)
          queries.add(sql)
          handleQuery(out, in, sql)
        case MsgTerminate => open = false
        case MsgCopyData if m.body.nonEmpty && m.body(0) == StandbyStatusUpdateId =>
          standbyAcks.add(ByteBuffer.wrap(m.body, 1, 8).getLong)
        case other => sys.error(s"fake walsender: unexpected frontend message '${other.toChar}'")
      }
    }
    sock.close()
  }

  private def handleQuery(out: DataOutputStream, in: DataInputStream, sql: String): Unit = {
    val upper = sql.trim.toUpperCase
    if (upper.startsWith("START_REPLICATION")) {
      // ALL CopyBoth-phase writes go through out.synchronized — the
      // script below and the keepalive ticker share the stream, and the
      // interleaving must never rely on an unchecked "serve thread is
      // done writing" invariant (advisor r14).
      val lastStreamedLsn = out.synchronized {
        writeMessage(out, MsgCopyBothResponse, Array[Byte](0, 0, 0))
        var last = consistentPoint
        for ((walStart, payload) <- stream) {
          writeMessage(out, MsgCopyData, xlogData(walStart, payload))
          // xlogData's walEnd: walStart + payload bytes
          last = math.max(last,
            walStart + payload.getBytes(StandardCharsets.UTF_8).length)
        }
        for (raw <- trailer)
          writeMessage(out, MsgCopyData, raw)
        last
      }
      streamed.countDown()
      // Real walsenders HEARTBEAT while idle (wal_sender_timeout/2 =
      // 30 s primary keepalives); a fake that goes silent after the
      // script diverges from the protocol the client's 120 s read
      // timeout is calibrated against — an engine that lags more than
      // that after the last frame then dies on a spurious socket
      // timeout (the r14 100k-tx pgEt flake). Tick well inside the
      // client window. walEnd carries the LAST STREAMED LSN (never
      // behind the data frames): a real walsender's keepalives report
      // its send position, and a client folding keepalive walEnd into
      // progress tracking must never see its position regress
      // (advisor r14).
      val ticker = new Thread(() => {
        try while (!stopped) {
          Thread.sleep(15000)
          out.synchronized {
            writeMessage(out, MsgCopyData, keepalive(lastStreamedLsn, replyRequested = false))
          }
        } catch { case _: Throwable => () } // socket gone: ticker ends
      }, s"fake-walsender-keepalive-$port")
      ticker.setDaemon(true)
      ticker.start()
      // stay in CopyBoth: the main loop keeps consuming standby acks
    } else if (upper.startsWith("CREATE_REPLICATION_SLOT")) {
      val slot = sql.split('"')(1)
      createdSlots.add(slot)
      sendRowSet(out,
        Seq("slot_name", "consistent_point", "snapshot_name", "output_plugin"),
        Seq(Seq(Some(slot), Some(Lsn.format(consistentPoint)), None, Some("wal2json"))))
      writeMessage(out, MsgReadyForQuery, Array[Byte]('I'))
    } else if (sql.contains("confirmed_flush_lsn")) {
      val rows = slotLsn.toSeq.map(l => Seq(Some(Lsn.format(l))))
      sendRowSet(out, Seq("confirmed_flush_lsn"), rows)
      writeMessage(out, MsgReadyForQuery, Array[Byte]('I'))
    } else if (sql.contains("pg_publication")) {
      val pub = sql.split('\'')(1)
      val rows = publications.getOrElse(pub, Nil).map { case (s, t) => Seq(Some(s), Some(t)) }
      sendRowSet(out, Seq("schemaname", "tablename"), rows)
      writeMessage(out, MsgReadyForQuery, Array[Byte]('I'))
    } else {
      writeMessage(out, MsgErrorResponse, errorBody("42601", s"fake walsender cannot handle: $sql"))
      writeMessage(out, MsgReadyForQuery, Array[Byte]('I'))
    }
  }

  private def sendRowSet(out: DataOutputStream, fields: Seq[String],
                         rows: Seq[Seq[Option[String]]]): Unit = {
    val rd = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(rd)
    d.writeShort(fields.length)
    for (f <- fields) {
      d.write(cstr(f))
      d.writeInt(0); d.writeShort(0); d.writeInt(25); d.writeShort(-1); d.writeInt(-1); d.writeShort(0)
    }
    writeMessage(out, MsgRowDescription, rd.toByteArray)
    for (row <- rows) {
      val rb = new java.io.ByteArrayOutputStream()
      val rd2 = new DataOutputStream(rb)
      rd2.writeShort(row.length)
      for (v <- row) v match {
        case Some(s) =>
          val b = s.getBytes(StandardCharsets.UTF_8)
          rd2.writeInt(b.length); rd2.write(b)
        case None => rd2.writeInt(-1)
      }
      writeMessage(out, MsgDataRow, rb.toByteArray)
    }
    writeMessage(out, MsgCommandComplete, cstr(s"SELECT ${rows.length}"))
  }
}

object FakeWalsender {
  sealed trait Auth
  case object Trust extends Auth
  final case class Md5(password: String) extends Auth
  case object Silent extends Auth

  private[pgwire] def int32(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()

  private[pgwire] def cstr(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8) :+ 0.toByte

  private[pgwire] def cstring(body: Array[Byte]): String = {
    val end = body.indexOf(0.toByte)
    new String(body, 0, if (end < 0) body.length else end, StandardCharsets.UTF_8)
  }

  private def parseStartupParams(b: Array[Byte]): Map[String, String] = {
    val parts = Vector.newBuilder[String]
    var start = 0
    var i = 0
    while (i < b.length) {
      if (b(i) == 0) {
        if (i > start) parts += new String(b, start, i - start, StandardCharsets.UTF_8)
        start = i + 1
      }
      i += 1
    }
    parts.result().grouped(2).collect { case Vector(k, v) => k -> v }.toMap
  }

  private def errorBody(code: String, msg: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write('S'); bos.write(cstr("ERROR"))
    bos.write('C'); bos.write(cstr(code))
    bos.write('M'); bos.write(cstr(msg))
    bos.write(0)
    bos.toByteArray
  }

  /** The md5 credential the server expects (independent of the client's
    * own implementation: recomputed here with MessageDigest directly). */
  private def expectedCredential(pw: String, user: String, salt: Array[Byte]): String = {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b).map(x => f"$x%02x").mkString
    "md5" + md5hex(md5hex((pw + user).getBytes(StandardCharsets.UTF_8))
      .getBytes(StandardCharsets.UTF_8) ++ salt)
  }

  private[pgwire] def xlogData(walStart: Long, payload: String): Array[Byte] = {
    val p = payload.getBytes(StandardCharsets.UTF_8)
    val b = ByteBuffer.allocate(1 + 24 + p.length)
    b.put(XLogDataId).putLong(walStart).putLong(walStart + p.length).putLong(12345L).put(p)
    b.array()
  }

  private[pgwire] def keepalive(walEnd: Long, replyRequested: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(18)
    b.put(PrimaryKeepaliveId).putLong(walEnd).putLong(777L)
      .put(if (replyRequested) 1.toByte else 0.toByte)
    b.array()
  }
}
