package graft.cdc.pgwire

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets

/**
 * Minimal PostgreSQL frontend/backend (v3) wire codec — just the frames a
 * logical-replication client needs. Built from the public protocol
 * documentation (PostgreSQL docs: "Frontend/Backend Protocol" and
 * "Streaming Replication Protocol"); the reference gets this layer from
 * the jackc/pglogrepl + pgconn Go libraries
 * (`pkg/pgrepl/replicator.go:61-296`), we implement it directly.
 *
 * Framing: every message is `type:byte, length:int32(includes itself),
 * body`, except the startup message which has no type byte.
 */
object PgWire {

  // ---- backend message type bytes ----
  val MsgAuthentication: Byte = 'R'
  val MsgParameterStatus: Byte = 'S'
  val MsgBackendKeyData: Byte = 'K'
  val MsgReadyForQuery: Byte = 'Z'
  val MsgRowDescription: Byte = 'T'
  val MsgDataRow: Byte = 'D'
  val MsgCommandComplete: Byte = 'C'
  val MsgEmptyQuery: Byte = 'I'
  val MsgErrorResponse: Byte = 'E'
  val MsgNoticeResponse: Byte = 'N'
  val MsgCopyBothResponse: Byte = 'W'
  val MsgCopyData: Byte = 'd'
  val MsgCopyDone: Byte = 'c'

  // ---- frontend message type bytes ----
  val MsgQuery: Byte = 'Q'
  val MsgPassword: Byte = 'p'
  val MsgTerminate: Byte = 'X'

  // ---- replication CopyData sub-message ids (streaming replication protocol) ----
  val XLogDataId: Byte = 'w'
  val PrimaryKeepaliveId: Byte = 'k'
  val StandbyStatusUpdateId: Byte = 'r'

  final case class Message(tpe: Byte, body: Array[Byte])

  /** XLogData: WAL section starting at `walStart`, current end `walEnd`,
    * server clock (µs since 2000-01-01), then the plugin payload. */
  final case class XLogData(walStart: Long, walEnd: Long, serverClock: Long, payload: Array[Byte])

  final case class PrimaryKeepalive(walEnd: Long, serverClock: Long, replyRequested: Boolean)

  // ---------------------------------------------------------------- io

  /** Read one framed backend message (blocks). */
  def readMessage(in: DataInputStream): Message = {
    val tpe = in.readByte()
    val len = in.readInt()
    if (len < 4) throw new EOFException(s"bad frame length $len for type ${tpe.toChar}")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    Message(tpe, body)
  }

  def writeMessage(out: DataOutputStream, tpe: Byte, body: Array[Byte]): Unit = {
    out.writeByte(tpe.toInt)
    out.writeInt(body.length + 4)
    out.write(body)
    out.flush()
  }

  // ------------------------------------------------------- body builders

  private def cstr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    val r = new Array[Byte](b.length + 1)
    System.arraycopy(b, 0, r, 0, b.length)
    r
  }

  /** StartupMessage (no type byte): protocol 3.0 + key/value params. */
  def startupMessage(params: Seq[(String, String)]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeInt(196608) // protocol 3.0 = 0x00030000
    params.foreach { case (k, v) => d.write(cstr(k)); d.write(cstr(v)) }
    d.writeByte(0)
    val payload = body.toByteArray
    val framed = new java.io.ByteArrayOutputStream()
    val f = new DataOutputStream(framed)
    f.writeInt(payload.length + 4)
    f.write(payload)
    framed.toByteArray
  }

  def queryBody(sql: String): Array[Byte] = cstr(sql)

  def passwordBody(password: String): Array[Byte] = cstr(password)

  /** Standby status update ('r' CopyData payload): the ack the primary
    * uses to advance `confirmed_flush_lsn` — the reference's
    * `SendStandbyStatusUpdate` (`replicator.go:217-219`). */
  def standbyStatusUpdate(writtenLsn: Long, flushedLsn: Long, appliedLsn: Long,
                          clockMicros: Long, replyRequested: Boolean = false): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(1 + 8 * 4 + 1)
    b.put(StandbyStatusUpdateId)
    b.putLong(writtenLsn)
    b.putLong(flushedLsn)
    b.putLong(appliedLsn)
    b.putLong(clockMicros)
    b.put(if (replyRequested) 1.toByte else 0.toByte)
    b.array()
  }

  // ------------------------------------------------------- body parsers

  /** Authentication request code: 0=Ok, 3=CleartextPassword, 5=MD5, 10=SASL. */
  def authCode(body: Array[Byte]): Int = java.nio.ByteBuffer.wrap(body).getInt

  def parseXLogData(copyDataBody: Array[Byte]): XLogData = {
    require(copyDataBody.nonEmpty && copyDataBody(0) == XLogDataId, "not an XLogData frame")
    val b = java.nio.ByteBuffer.wrap(copyDataBody, 1, copyDataBody.length - 1)
    val start = b.getLong; val end = b.getLong; val clock = b.getLong
    val payload = new Array[Byte](b.remaining())
    b.get(payload)
    XLogData(start, end, clock, payload)
  }

  def parsePrimaryKeepalive(copyDataBody: Array[Byte]): PrimaryKeepalive = {
    require(copyDataBody.nonEmpty && copyDataBody(0) == PrimaryKeepaliveId, "not a keepalive frame")
    val b = java.nio.ByteBuffer.wrap(copyDataBody, 1, copyDataBody.length - 1)
    PrimaryKeepalive(b.getLong, b.getLong, b.get() == 1)
  }

  /** DataRow body → column values (null-aware, text format). */
  def parseDataRow(body: Array[Byte]): Seq[Option[String]] = {
    val b = java.nio.ByteBuffer.wrap(body)
    val n = b.getShort.toInt
    (0 until n).map { _ =>
      val len = b.getInt
      if (len < 0) None
      else {
        val v = new Array[Byte](len)
        b.get(v)
        Some(new String(v, StandardCharsets.UTF_8))
      }
    }
  }

  /** RowDescription body → field names (we only need names; replication
    * result sets are tiny and always text-format). */
  def parseRowDescription(body: Array[Byte]): Seq[String] = {
    val b = java.nio.ByteBuffer.wrap(body)
    val n = b.getShort.toInt
    (0 until n).map { _ =>
      val sb = new StringBuilder
      var c = b.get()
      while (c != 0) { sb.append(c.toChar); c = b.get() }
      b.getInt; b.getShort; b.getInt; b.getShort; b.getInt; b.getShort // oids/format, unused
      sb.toString
    }
  }

  /** ErrorResponse body → (code, message) from the tagged-field list. */
  def parseErrorResponse(body: Array[Byte]): (String, String) = {
    var code = ""; var msg = ""
    var i = 0
    while (i < body.length && body(i) != 0) {
      val tag = body(i).toChar
      val start = i + 1
      var j = start
      while (j < body.length && body(j) != 0) j += 1
      val value = new String(body, start, j - start, StandardCharsets.UTF_8)
      tag match {
        case 'C' => code = value
        case 'M' => msg = value
        case _ => ()
      }
      i = j + 1
    }
    (code, msg)
  }

  // ------------------------------------------------------------- LSN

  /** Postgres textual LSN `X/Y` (two hex halves) ↔ 64-bit value.
    * `format` emits `%X/%08X` (PostgreSQL 17's `LSN_FORMAT_ARGS`
    * convention — low half zero-padded to 8 digits); `parse` accepts
    * both padded and unpadded halves, like the server. */
  object Lsn {
    def parse(s: String): Long = s.split('/') match {
      case Array(hi, lo) => (java.lang.Long.parseLong(hi, 16) << 32) | java.lang.Long.parseLong(lo, 16)
      case _ => throw new IllegalArgumentException(s"bad LSN: $s")
    }
    def format(lsn: Long): String =
      f"${lsn >>> 32}%X/${lsn & 0xffffffffL}%08X"
  }

  /** The Postgres epoch (2000-01-01 UTC) as unix millis — shared by the
    * status-message clock and pgoutput timestamp decoding. */
  val PgEpochUnixMillis: Long = 946684800000L

  /** Microseconds since the Postgres epoch (2000-01-01 UTC) for status
    * messages, from a unix-millis clock. */
  def pgClockMicros(unixMillis: Long): Long = (unixMillis - PgEpochUnixMillis) * 1000L
}
