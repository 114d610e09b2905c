package graft.cdc.pgwire

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/**
 * Byte-level golden-fixture session for the pg-wire codec, independent
 * of [[FakeWalsender]]: every server→client byte below is a literal hex
 * constant hand-assembled from the public PostgreSQL protocol
 * documentation ("Frontend/Backend Protocol" message formats and the
 * "Streaming Replication Protocol"), and every client→server frame is
 * compared against hand-assembled golden bytes — NOT against anything
 * produced by the `PgWire` encoder. FakeWalsender builds its frames
 * with the same codec the client uses, so a shared framing bug (wrong
 * length convention, missing NUL, endianness) would pass both sides of
 * that fake; it cannot pass this fixture. This is the recorded-trace
 * analogue of the reference's live-container test
 * (`pkg/pgrepl/replicator_test.go:22-94`) for a sandbox without Docker.
 *
 * Session under test: startup w/ `replication=database` → MD5 auth →
 * publication-tables query → slot resume query → START_REPLICATION →
 * CopyBoth with 3 XLogData frames (wal2json B/I/C) → keepalive w/
 * reply-requested → standby status update → CopyDone → Terminate.
 */
class RecordedWalsenderSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(b => Integer.parseInt(b, 16).toByte).toArray

  // ============================ client → server (expected golden bytes)

  // StartupMessage: int32 len, int32 196608 (protocol 3.0), then
  // "user\0u\0database\0db\0replication\0database\0" + terminator NUL
  private val STARTUP = hex(
    "0000003100030000757365720075006461746162617365006462007265706c69" +
    "636174696f6e0064617461626173650000")
  // PasswordMessage 'p': "md5" + md5hex(md5hex("pw"+"u") + "salt") —
  // credential recomputed from the documented algorithm, not the client
  private val PASSWORD = hex(
    "70000000286d6435616132666630346532373664633538613035366335333739" +
    "386633356538336200")
  private val Q_PUBTABLES = hex(
    "510000008953454c45435420736368656d616e616d652c207461626c656e616d" +
    "652046524f4d2070675f7075626c69636174696f6e20700a204a4f494e207067" +
    "5f7075626c69636174696f6e5f7461626c6573207074204f4e20702e7075626e" +
    "616d65203d2070742e7075626e616d650a20574845524520702e7075626e616d" +
    "65203d20277075622700")
  private val Q_SLOT = hex(
    "510000005753454c45435420636f6e6669726d65645f666c7573685f6c736e20" +
    "46524f4d2070675f7265706c69636174696f6e5f736c6f747320574845524520" +
    "736c6f745f6e616d65203d202767726166745f7075622700")
  // START_REPLICATION SLOT "graft_pub" LOGICAL 0/015E7F40 (8 wal2json opts)
  private val Q_STARTREPL = hex(
    "51000000fe53544152545f5245504c49434154494f4e20534c4f542022677261" +
    "66745f70756222204c4f474943414c20302f3031354537463430202822707265" +
    "7474792d7072696e7422202766616c7365272c2022696e636c7564652d747261" +
    "6e73616374696f6e22202774727565272c2022696e636c7564652d6c736e2220" +
    "2774727565272c2022696e636c7564652d74696d657374616d70222027747275" +
    "65272c2022696e636c7564652d706b22202774727565272c2022666f726d6174" +
    "2d76657273696f6e22202732272c2022696e636c7564652d7869647322202774" +
    "727565272c20226164642d7461626c65732220277075626c69632e74272900")
  // CopyData 'd' carrying 'r' standby status: written=flushed=applied=
  // 0/15E7F40, clock (8 bytes at offset 30, masked — wall time), flag 0
  private val STANDBY_STATUS = hex(
    "64000000267200000000015e7f4000000000015e7f4000000000015e7f400000" +
    "00000000000000")
  private val TERMINATE = hex(
    "5800000004")

  // ============================ server → client (hand-assembled bytes)

  // AuthenticationMD5Password: 'R', len 12, code 5, salt "salt"
  private val AUTH_MD5 = hex("520000000c0000000573616c74")
  private val AUTH_OK = hex("520000000800000000")
  private val PARAM_STATUS = hex("53000000187365727665725f76657273696f6e0031342e3000")
  private val KEY_DATA = hex("4b0000000c000004d20000162e")
  // ReadyForQuery: 'Z', len 5, status 'I'
  private val READY = hex("5a0000000549")
  // RowDescription(schemaname, tablename) + DataRow(public, t) +
  // CommandComplete("SELECT 1") + ReadyForQuery
  private val RESP_PUBTABLES = hex(
    "540000003f0002736368656d616e616d650000000000000000000019ffffffff" +
    "ffff00007461626c656e616d650000000000000000000019ffffffffffff0000" +
    "44000000150002000000067075626c69630000000174430000000d53454c4543" +
    "542031005a0000000549")
  // RowDescription(confirmed_flush_lsn) + DataRow("0/15E7F40") + C + Z
  private val RESP_SLOT = hex(
    "540000002c0001636f6e6669726d65645f666c7573685f6c736e000000000000" +
    "0000000019ffffffffffff00004400000013000100000009302f313545374634" +
    "30430000000d53454c4543542031005a0000000549")
  // CopyBothResponse: 'W', len 7, overall format 0, zero columns
  private val COPY_BOTH = hex("5700000007000000")
  // three CopyData 'd' / XLogData 'w' frames: walStart, walEnd
  // (start+0x40), clock 700000000000000 µs, wal2json v2 payloads B/I/C
  private val XLOG_STREAM = hex(
    "640000006c7700000000015e7f4000000000015e7f8000027ca57357c0007b22" +
    "616374696f6e223a2242222c22786964223a372c226c736e223a22302f313545" +
    "37463430222c226e6578746c736e223a22302f31354538303030222c2274696d" +
    "657374616d70223a227473227d64000000dc7700000000015e7f800000000001" +
    "5e7fc000027ca57357c0007b22616374696f6e223a2249222c22786964223a37" +
    "2c226c736e223a22302f31354537463830222c226e6578746c736e223a22222c" +
    "2274696d657374616d70223a227473222c22736368656d61223a227075626c69" +
    "63222c227461626c65223a2274222c22636f6c756d6e73223a5b7b226e616d65" +
    "223a226964222c2274797065223a22696e7465676572222c2276616c7565223a" +
    "317d5d2c22706b223a5b7b226e616d65223a226964222c2274797065223a2269" +
    "6e7465676572227d5d7d640000006c7700000000015e7fc000000000015e8000" +
    "00027ca57357c0007b22616374696f6e223a2243222c22786964223a372c226c" +
    "736e223a22302f31354537464330222c226e6578746c736e223a22302f313545" +
    "38303030222c2274696d657374616d70223a227473227d")
  // PrimaryKeepalive 'k': walEnd 0/15E8000, clock, replyRequested=1
  private val KEEPALIVE = hex("64000000166b00000000015e800000027ca57357c00001")
  private val COPY_DONE = hex("6300000004")

  // slot-missing response: RowDescription + zero DataRows + C("SELECT 0") + Z
  private val RESP_SLOT_MISSING = hex(
    "540000002c0001636f6e6669726d65645f666c7573685f6c736e000000000000" +
    "0000000019ffffffffffff0000430000000d53454c4543542030005a00000005" +
    "49")
  // CREATE_REPLICATION_SLOT "graft_pub" LOGICAL wal2json NOEXPORT_SNAPSHOT
  private val Q_CREATE_SLOT = hex(
    "510000004b4352454154455f5245504c49434154494f4e5f534c4f5420226772" +
    "6166745f70756222204c4f474943414c2077616c326a736f6e204e4f4558504f" +
    "52545f534e415053484f5400")
  // T(slot_name, consistent_point, snapshot_name, output_plugin) +
  // D(graft_pub, 0/2000000, "", wal2json) + C + Z
  private val RESP_CREATE_SLOT = hex(
    "54000000850004736c6f745f6e616d650000000000000000000019ffffffffff" +
    "ff0000636f6e73697374656e745f706f696e740000000000000000000019ffff" +
    "ffffffff0000736e617073686f745f6e616d650000000000000000000019ffff" +
    "ffffffff00006f75747075745f706c7567696e0000000000000000000019ffff" +
    "ffffffff0000440000003000040000000967726166745f70756200000009302f" +
    "32303030303030000000000000000877616c326a736f6e430000001e43524541" +
    "54455f5245504c49434154494f4e5f534c4f542031005a0000000549")

  private sealed trait Step
  private final case class Expect(label: String, bytes: Array[Byte],
                                  maskFrom: Int = -1, maskLen: Int = 0) extends Step
  private final case class Send(bytes: Array[Byte]) extends Step

  /** Plays the byte script verbatim; any client byte that deviates from
    * the golden trace is recorded and fails the test. With `dribble`,
    * every server byte is written in its own flushed TCP write — the
    * maximally fragmented delivery a real network can produce. */
  private final class ScriptServer(steps: Seq[Step], dribble: Boolean = false) extends AutoCloseable {
    private val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val port: Int = server.getLocalPort
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val done = new java.util.concurrent.CountDownLatch(1)
    private val thread = new Thread(() => {
      try {
        val sock = server.accept()
        val in = new DataInputStream(sock.getInputStream)
        val out = new DataOutputStream(sock.getOutputStream)
        steps.foreach {
          case Expect(label, golden, maskFrom, maskLen) =>
            val got = new Array[Byte](golden.length)
            in.readFully(got)
            val mismatch = golden.indices.find { i =>
              val masked = maskFrom >= 0 && i >= maskFrom && i < maskFrom + maskLen
              !masked && got(i) != golden(i)
            }
            mismatch.foreach { i =>
              errors.add(f"$label: byte $i: got 0x${got(i)}%02x expected 0x${golden(i)}%02x " +
                s"(got ${got.map(b => f"$b%02x").mkString} " +
                s"expected ${golden.map(b => f"$b%02x").mkString})"): Unit
            }
          case Send(bytes) =>
            if (dribble) bytes.foreach { b => out.write(b.toInt); out.flush() }
            else { out.write(bytes); out.flush() }
        }
        sock.close()
      } catch {
        case t: Throwable => errors.add(s"server: $t"): Unit
      } finally done.countDown()
    }, "recorded-walsender")
    thread.setDaemon(true)
    thread.start()
    def awaitDone(): Unit = { done.await(30, java.util.concurrent.TimeUnit.SECONDS); () }
    override def close(): Unit = server.close()
  }

  test("client session matches the hand-assembled protocol-doc byte trace") {
    runGoldenSession(dribble = false)
  }

  test("frame parsing survives maximally fragmented TCP delivery (1 byte per write)") {
    // a real walsender's frames arrive at arbitrary TCP segment
    // boundaries; the client must never assume a read returns a whole
    // frame. Same golden session, every server byte its own write.
    runGoldenSession(dribble = true)
  }

  test("slot-create path: CREATE_REPLICATION_SLOT bytes match the golden trace") {
    val script = Seq(
      Expect("startup", STARTUP),
      Send(AUTH_MD5),
      Expect("md5 password", PASSWORD),
      Send(AUTH_OK ++ PARAM_STATUS ++ KEY_DATA ++ READY),
      Expect("slot resume query", Q_SLOT),
      Send(RESP_SLOT_MISSING), // no rows: the slot does not exist yet
      Expect("CREATE_REPLICATION_SLOT", Q_CREATE_SLOT),
      Send(RESP_CREATE_SLOT),
      Expect("terminate", TERMINATE))
    val server = new ScriptServer(script)
    val client = new PgReplicationClient("127.0.0.1", server.port, "u", "db",
      password = Some("pw"))
    try {
      client.connect()
      assert(client.confirmedFlushLsn("graft_pub").isEmpty)
      assert(client.createReplicationSlot("graft_pub") == 0x2000000L)
    } finally {
      client.close()
      server.awaitDone()
      server.close()
    }
    val errs = { val b = Vector.newBuilder[String]; server.errors.forEach(b += _); b.result() }
    assert(errs.isEmpty, s"client deviated from the recorded trace:\n${errs.mkString("\n")}")
  }

  private def runGoldenSession(dribble: Boolean): Unit = {
    val script = Seq(
      Expect("startup", STARTUP),
      Send(AUTH_MD5),
      Expect("md5 password", PASSWORD),
      Send(AUTH_OK ++ PARAM_STATUS ++ KEY_DATA ++ READY),
      Expect("publication tables query", Q_PUBTABLES),
      Send(RESP_PUBTABLES),
      Expect("slot resume query", Q_SLOT),
      Send(RESP_SLOT),
      Expect("START_REPLICATION", Q_STARTREPL),
      Send(COPY_BOTH ++ XLOG_STREAM ++ KEEPALIVE),
      // clock field (8 bytes at offset 30) is wall time — masked
      Expect("standby status", STANDBY_STATUS, maskFrom = 30, maskLen = 8),
      Send(COPY_DONE),
      Expect("terminate", TERMINATE))
    val server = new ScriptServer(script, dribble)
    val client = new PgReplicationClient("127.0.0.1", server.port, "u", "db",
      password = Some("pw"))
    try {
      client.connect()
      assert(client.publicationTables("pub") == Seq("public.t"))
      assert(client.confirmedFlushLsn("graft_pub").contains(0x15E7F40L))
      client.startReplication("graft_pub", 0x15E7F40L,
        PgWalFeed.pluginOptions(Seq("public.t")))

      // three XLogData frames with the exact LSN window and payloads
      val events = (1 to 3).map(_ => client.receive())
      val xs = events.map(_.get.toOption.get)
      assert(xs.map(_.walStart) == Seq(0x15E7F40L, 0x15E7F80L, 0x15E7FC0L))
      assert(xs.map(_.walEnd) == Seq(0x15E7F80L, 0x15E7FC0L, 0x15E8000L))
      assert(xs.forall(_.serverClock == 700000000000000L))
      val payloads = xs.map(x => new String(x.payload, StandardCharsets.UTF_8))
      assert(payloads.head == """{"action":"B","xid":7,"lsn":"0/15E7F40","nextlsn":"0/15E8000","timestamp":"ts"}""")
      assert(payloads(1).contains(""""table":"t""""))
      assert(payloads(2).startsWith("""{"action":"C""""))

      // keepalive with reply-requested → answer with the standby status
      val ka = client.receive().get.swap.toOption.get
      assert(ka.walEnd == 0x15E8000L && ka.replyRequested)
      client.sendStandbyStatus(0x15E7F40L)

      // orderly CopyDone ends the stream
      assert(client.receive().isEmpty)
    } finally {
      client.close()
      server.awaitDone()
      server.close()
    }
    val errs = { val b = Vector.newBuilder[String]; server.errors.forEach(b += _); b.result() }
    assert(errs.isEmpty, s"client deviated from the recorded trace:\n${errs.mkString("\n")}")
  }
}
