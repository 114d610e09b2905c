package graft.cdc.pgwire

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import PgWire._

/**
 * Logical-replication client over a raw pg-wire socket — the transport
 * layer of the reference's replicator (`pkg/pgrepl/replicator.go:61-226`
 * and `conn.go:17-56`), built directly on the public protocol instead of
 * the pgx/pglogrepl Go libraries:
 *
 *  - connect with `replication=database` (walsender accepts both the
 *    replication grammar and normal SQL in logical mode);
 *  - `confirmedFlushLsn` to resume an existing slot, or
 *    `createReplicationSlot` (`CREATE_REPLICATION_SLOT ... LOGICAL
 *    wal2json NOEXPORT_SNAPSHOT`) like `replicator.go:105-130`;
 *  - `startReplication` issues `START_REPLICATION SLOT ... LOGICAL lsn
 *    (opts)` and switches to CopyBoth streaming;
 *  - `receive()` yields XLogData / keepalive frames; `sendStandbyStatus`
 *    is the `confirmed_flush_lsn` ack (`replicator.go:213-226`).
 *
 * Auth: trust, cleartext and md5 password. SCRAM is intentionally out of
 * scope for the zero-egress build (fails with a clear message).
 */
final class PgReplicationClient(
    host: String,
    port: Int,
    user: String,
    database: String,
    password: Option[String] = None,
    connectTimeoutMs: Int = 15000,
    readTimeoutMs: Int = 120000,
    replicationMode: Boolean = true) extends AutoCloseable {

  private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: DataOutputStream = _
  private val writeLock = new Object

  def connect(): Unit = {
    socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    socket.setTcpNoDelay(true)
    // A dead server without a FIN (partition, kill -9 of the walsender)
    // must surface as a SocketTimeoutException — a reconnectable error —
    // not an indefinite hang. Postgres keepalives arrive well inside
    // this window (default wal_sender_timeout/2 = 30 s heartbeats).
    socket.setSoTimeout(math.max(1, readTimeoutMs))
    in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
    out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
    // replication=database: logical walsender mode (replicator.go:87).
    // With replicationMode=false this is a plain backend connection —
    // used by tests/tools for DDL/DML alongside the replication session.
    out.write(startupMessage(
      Seq("user" -> user, "database" -> database) ++
        (if (replicationMode) Seq("replication" -> "database") else Nil)))
    out.flush()
    authenticate()
    awaitReadyForQuery()
  }

  private def authenticate(): Unit = {
    var done = false
    while (!done) {
      val m = readMessage(in)
      m.tpe match {
        case MsgAuthentication =>
          authCode(m.body) match {
            case 0 => done = true // AuthenticationOk
            case 3 =>
              val pw = password.getOrElse(sys.error("server requires a password"))
              writeMessage(out, MsgPassword, passwordBody(pw))
            case 5 =>
              val pw = password.getOrElse(sys.error("server requires a password"))
              val salt = m.body.drop(4)
              writeMessage(out, MsgPassword, passwordBody(md5Credential(pw, salt)))
            case other =>
              sys.error(s"unsupported auth method $other (SCRAM not supported in this build)")
          }
        case MsgErrorResponse =>
          val (code, msg) = parseErrorResponse(m.body)
          sys.error(s"auth failed: $code $msg")
        case _ => () // ParameterStatus / BackendKeyData / Notice before ready
      }
    }
  }

  /** md5 auth credential: "md5" + md5hex(md5hex(password+user) + salt). */
  private[pgwire] def md5Credential(pw: String, salt: Array[Byte]): String = {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"$x%02x").mkString
    val inner = md5hex((pw + user).getBytes(StandardCharsets.UTF_8))
    "md5" + md5hex(inner.getBytes(StandardCharsets.UTF_8) ++ salt)
  }

  private def awaitReadyForQuery(): Unit = {
    var done = false
    while (!done) {
      val m = readMessage(in)
      m.tpe match {
        case MsgReadyForQuery => done = true
        case MsgErrorResponse =>
          val (code, msg) = parseErrorResponse(m.body)
          sys.error(s"error before ready: $code $msg")
        case _ => ()
      }
    }
  }

  /** Simple-protocol query returning text rows keyed by column name.
    * Replication metadata result sets only — always tiny. */
  def simpleQuery(sql: String): Seq[Map[String, Option[String]]] = {
    writeLock.synchronized(writeMessage(out, MsgQuery, queryBody(sql)))
    var fields: Seq[String] = Nil
    val rows = Vector.newBuilder[Map[String, Option[String]]]
    var done = false
    var error: Option[String] = None
    while (!done) {
      val m = readMessage(in)
      m.tpe match {
        case MsgRowDescription => fields = parseRowDescription(m.body)
        case MsgDataRow => rows += fields.zip(parseDataRow(m.body)).toMap
        case MsgCommandComplete | MsgEmptyQuery => ()
        case MsgErrorResponse =>
          val (code, msg) = parseErrorResponse(m.body)
          error = Some(s"$code $msg")
        case MsgReadyForQuery => done = true
        case _ => ()
      }
    }
    error.foreach(e => sys.error(s"query failed: $e"))
    rows.result()
  }

  /** `confirmed_flush_lsn` of an existing slot (`conn.go:47-56`), None if
    * the slot doesn't exist yet. */
  def confirmedFlushLsn(slot: String): Option[Long] =
    simpleQuery(
      s"SELECT confirmed_flush_lsn FROM pg_replication_slots WHERE slot_name = '${literal(slot)}'")
      .headOption.flatMap(_.getOrElse("confirmed_flush_lsn", None)).map(Lsn.parse)

  /** Tables of a publication (`conn.go:18-44`), as schema.table. */
  def publicationTables(publication: String): Seq[String] =
    simpleQuery(
      s"""SELECT schemaname, tablename FROM pg_publication p
         | JOIN pg_publication_tables pt ON p.pubname = pt.pubname
         | WHERE p.pubname = '${literal(publication)}'""".stripMargin)
      .map(r => s"${r("schemaname").getOrElse("")}.${r("tablename").getOrElse("")}")

  /** Create a durable logical slot; returns the consistent point LSN
    * (`replicator.go:110-125`). */
  def createReplicationSlot(slot: String, plugin: String = "wal2json"): Long = {
    val rows = simpleQuery(
      s"""CREATE_REPLICATION_SLOT "${identifier(slot)}" LOGICAL ${identifier(plugin)} NOEXPORT_SNAPSHOT""")
    val point = rows.headOption.flatMap(_.getOrElse("consistent_point", None))
      .getOrElse(sys.error("CREATE_REPLICATION_SLOT returned no consistent_point"))
    Lsn.parse(point)
  }

  /** Switch the connection into CopyBoth streaming from `startLsn` with
    * the given plugin options (`replicator.go:137-156`). */
  def startReplication(slot: String, startLsn: Long, pluginOptions: Seq[(String, String)]): Unit = {
    val opts =
      if (pluginOptions.isEmpty) ""
      else pluginOptions.map { case (k, v) =>
        require(k.nonEmpty && k.forall(c =>
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_' || c == '-'),
          s"invalid plugin option name '$k'")
        s""""$k" '${literal(v)}'"""
      }.mkString(" (", ", ", ")")
    val sql = s"""START_REPLICATION SLOT "${identifier(slot)}" LOGICAL ${Lsn.format(startLsn)}$opts"""
    writeLock.synchronized(writeMessage(out, MsgQuery, queryBody(sql)))
    var started = false
    while (!started) {
      val m = readMessage(in)
      m.tpe match {
        case MsgCopyBothResponse => started = true
        case MsgErrorResponse =>
          val (code, msg) = parseErrorResponse(m.body)
          sys.error(s"START_REPLICATION failed: $code $msg")
        case _ => ()
      }
    }
  }

  /** Next replication event once streaming: Left(keepalive) or
    * Right(xlogdata). Blocks; returns None on an orderly server close. */
  def receive(): Option[Either[PrimaryKeepalive, XLogData]] = {
    while (true) {
      val m =
        try readMessage(in)
        catch { case _: java.io.EOFException => return None }
      m.tpe match {
        case MsgCopyData =>
          m.body(0) match {
            case XLogDataId => return Some(Right(parseXLogData(m.body)))
            case PrimaryKeepaliveId => return Some(Left(parsePrimaryKeepalive(m.body)))
            case other =>
              // an id this codec doesn't know means a protocol we don't
              // speak — dropping it would silently lose WAL data
              sys.error(f"unknown replication CopyData sub-message '${other.toChar}' (0x$other%02x)")
          }
        case MsgCopyDone => return None
        case MsgErrorResponse =>
          val (code, msg) = parseErrorResponse(m.body)
          sys.error(s"replication stream error: $code $msg")
        case _ => ()
      }
    }
    None
  }

  /** Standby status update: report `lsn` written+flushed+applied — the
    * `Commit` of `replicator.go:213-226`. Safe to call from any thread
    * while `receive()` blocks on the read side. */
  def sendStandbyStatus(lsn: Long, replyRequested: Boolean = false): Unit =
    writeLock.synchronized {
      writeMessage(out, MsgCopyData,
        standbyStatusUpdate(lsn, lsn, lsn, pgClockMicros(System.currentTimeMillis()), replyRequested))
    }

  /** Escape a string-literal fragment (single-quoted context): ' → ''. */
  private[pgwire] def literal(s: String): String = s.replace("'", "''")

  /** Validate a double-quoted identifier (slot/plugin names). Escaping
    * would silently *rename* — a slot named `a"b` must fail loudly, not
    * become a different slot — so reject anything outside the charset
    * Postgres itself allows for replication slot names. */
  private[pgwire] def identifier(s: String): String = {
    require(s.nonEmpty && s.length <= 63 && s.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'),
      s"invalid replication identifier '$s': must be 1-63 chars of [a-z0-9_]")
    s
  }

  override def close(): Unit = {
    try {
      if (out != null) writeLock.synchronized(writeMessage(out, MsgTerminate, Array.empty))
    } catch { case _: Throwable => () }
    try if (socket != null) socket.close() catch { case _: Throwable => () }
  }
}
