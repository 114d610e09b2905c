package graft.cdc.pgwire

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import PgWire._

/**
 * Pure codec spec for the pg-wire frames a logical-replication client
 * exchanges (the layer the reference delegates to pglogrepl/pgconn,
 * `pkg/pgrepl/replicator.go:61-296`): framing round-trips, LSN text
 * form, streaming-replication sub-messages, auth credential, and the
 * injection-safety of the two SQL escapers.
 */
class PgWireSpec extends AnyFunSuite {

  private def roundTrip(tpe: Byte, body: Array[Byte]): Message = {
    val bos = new ByteArrayOutputStream()
    writeMessage(new DataOutputStream(bos), tpe, body)
    readMessage(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
  }

  test("message framing round-trips (type byte + self-inclusive length)") {
    for (body <- Seq(Array.empty[Byte], Array[Byte](1, 2, 3), Array.fill[Byte](70000)(42))) {
      val m = roundTrip(MsgCopyData, body)
      assert(m.tpe == MsgCopyData)
      assert(m.body.toSeq == body.toSeq)
    }
    // the frame on the wire is exactly 1 (type) + 4 (len) + body
    val bos = new ByteArrayOutputStream()
    writeMessage(new DataOutputStream(bos), MsgQuery, Array[Byte](9))
    val raw = bos.toByteArray
    assert(raw.length == 6 && raw(0) == 'Q'.toByte)
    assert(ByteBuffer.wrap(raw, 1, 4).getInt == 5) // length includes itself, not the type
  }

  test("readMessage rejects an impossible frame length") {
    val buf = ByteBuffer.allocate(5).put(MsgCopyData).putInt(2).array()
    intercept[java.io.EOFException] {
      readMessage(new DataInputStream(new ByteArrayInputStream(buf)))
    }
  }

  test("startup message: protocol 3.0, params as c-string pairs, trailing NUL, no type byte") {
    val raw = startupMessage(Seq("user" -> "u1", "database" -> "db", "replication" -> "database"))
    val b = ByteBuffer.wrap(raw)
    assert(b.getInt == raw.length)   // self-inclusive length, no type byte
    assert(b.getInt == 196608)       // 0x00030000
    val rest = new String(raw, 8, raw.length - 8, StandardCharsets.UTF_8).replace('\u0000', '|')
    assert(rest == "user|u1|database|db|replication|database||")
  }

  test("LSN text form: parse both padded and unpadded; format as %X/%08X") {
    assert(Lsn.parse("0/3910B898") == 0x3910B898L)
    assert(Lsn.parse("16/B374D848") == (0x16L << 32 | 0xB374D848L))
    assert(Lsn.parse("1/1") == (1L << 32 | 1L)) // server emits unpadded too
    assert(Lsn.format(0x3910B898L) == "0/3910B898")
    assert(Lsn.format((1L << 32) | 1L) == "1/00000001") // low half zero-padded (pg17 LSN_FORMAT_ARGS)
    assert(Lsn.format(0L) == "0/00000000")
    for (v <- Seq(0L, 1L, 0x3910B898L, 0xFFFFFFFFL, 0x7FFFFFFFFFFFFFFFL, 0x123456789ABCDEFL))
      assert(Lsn.parse(Lsn.format(v)) == v)
  }

  test("XLogData sub-message: build by hand, parse to fields; payload byte-exact") {
    val payload = """{"action":"B","nextlsn":"0/3910B898"}""".getBytes(StandardCharsets.UTF_8)
    val b = ByteBuffer.allocate(1 + 24 + payload.length)
    b.put(XLogDataId).putLong(100L).putLong(200L).putLong(300L).put(payload)
    val x = parseXLogData(b.array())
    assert(x.walStart == 100L && x.walEnd == 200L && x.serverClock == 300L)
    assert(x.payload.toSeq == payload.toSeq)
    intercept[IllegalArgumentException](parseXLogData(Array[Byte]('k', 0)))
  }

  test("primary keepalive: walEnd + clock + reply flag") {
    val b = ByteBuffer.allocate(18).put(PrimaryKeepaliveId).putLong(77L).putLong(88L).put(1.toByte)
    val k = parsePrimaryKeepalive(b.array())
    assert(k.walEnd == 77L && k.serverClock == 88L && k.replyRequested)
    val b2 = ByteBuffer.allocate(18).put(PrimaryKeepaliveId).putLong(0L).putLong(0L).put(0.toByte)
    assert(!parsePrimaryKeepalive(b2.array()).replyRequested)
  }

  test("standby status update: 'r' + written/flushed/applied + clock + reply") {
    val raw = standbyStatusUpdate(10L, 11L, 12L, 999L, replyRequested = true)
    val b = ByteBuffer.wrap(raw)
    assert(b.get() == StandbyStatusUpdateId)
    assert(b.getLong == 10L && b.getLong == 11L && b.getLong == 12L && b.getLong == 999L)
    assert(b.get() == 1.toByte && !b.hasRemaining)
  }

  test("DataRow parser: text values and SQL NULL (-1 length)") {
    val v1 = "0/3910B898".getBytes(StandardCharsets.UTF_8)
    val b = ByteBuffer.allocate(2 + 4 + v1.length + 4 + 4)
    b.putShort(3.toShort).putInt(v1.length).put(v1).putInt(-1).putInt(0)
    assert(parseDataRow(b.array()) == Seq(Some("0/3910B898"), None, Some("")))
  }

  test("RowDescription parser: field names ahead of per-field oid block") {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.writeShort(2)
    for (name <- Seq("slot_name", "consistent_point")) {
      d.write(name.getBytes(StandardCharsets.UTF_8)); d.writeByte(0)
      d.writeInt(0); d.writeShort(0); d.writeInt(25); d.writeShort(-1); d.writeInt(-1); d.writeShort(0)
    }
    assert(parseRowDescription(bos.toByteArray) == Seq("slot_name", "consistent_point"))
  }

  test("ErrorResponse parser: C/M tagged fields, other tags ignored") {
    val bos = new ByteArrayOutputStream()
    for ((t, v) <- Seq('S' -> "ERROR", 'C' -> "42704", 'M' -> "replication slot does not exist")) {
      bos.write(t); bos.write(v.getBytes(StandardCharsets.UTF_8)); bos.write(0)
    }
    bos.write(0)
    assert(parseErrorResponse(bos.toByteArray) == ("42704", "replication slot does not exist"))
  }

  test("pg clock: microseconds since 2000-01-01 UTC") {
    assert(pgClockMicros(946684800000L) == 0L)
    assert(pgClockMicros(946684800001L) == 1000L)
  }

  test("md5 credential: md5 + md5hex(md5hex(password+user) + salt)") {
    val c = new PgReplicationClient("localhost", 1, "pgclient", "db", Some("secret"))
    // golden value computed independently (hashlib): inner=md5('secretpgclient')
    assert(c.md5Credential("secret", Array[Byte](1, 2, 3, 4)) ==
      "md5490196fc2f2eaed8245cba2a24a62988")
  }

  test("escapers: literal doubles quotes; identifier rejects instead of mangling") {
    val c = new PgReplicationClient("localhost", 1, "u", "db")
    assert(c.literal("it's") == "it''s")
    assert(c.literal("""a"b""") == """a"b""") // double quotes are fine inside a literal
    assert(c.identifier("basin_pub_1") == "basin_pub_1")
    // a slot name that needed escaping would be silently RENAMED by an
    // escaper — the client must reject it instead
    intercept[IllegalArgumentException](c.identifier("bad'name"))
    intercept[IllegalArgumentException](c.identifier("bad\"name"))
    intercept[IllegalArgumentException](c.identifier("Upper"))
    intercept[IllegalArgumentException](c.identifier(""))
    intercept[IllegalArgumentException](c.identifier("x" * 64))
  }
}
