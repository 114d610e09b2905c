package graft.cdc.pgwire

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import WalsenderTrace.Frame

/**
 * Replays the committed REAL-walsender trace
 * (`src/test/resources/pgwire/walsender-pg-pgoutput.trace`, recorded by
 * [[RecordWalsenderTrace]] against a live PostgreSQL through a recording
 * proxy) and asserts:
 *
 *  1. the client, driven by the same deterministic session script,
 *     produces byte-identical frames to what it sent to the real server
 *     (standby-status clock fields masked — the only legitimately
 *     nondeterministic bytes);
 *  2. the assembled pgoutput→envelope transactions equal what the live
 *     run produced (sidecar), pinning the whole decode path to real
 *     server output.
 *
 * Unlike [[RecordedWalsenderSpec]] (hand-assembled from the protocol
 * docs), these bytes came from an actual server — a shared misreading of
 * the docs by client and fixture author cannot pass here. Runs in any
 * environment; no Postgres needed at replay time.
 */
class LiveTraceReplaySpec extends AnyFunSuite {

  private def resource(name: String): Option[java.nio.file.Path] = {
    val p = java.nio.file.Paths.get("src/test/resources/pgwire", name)
    if (java.nio.file.Files.exists(p)) Some(p) else None
  }

  /** Serves the recorded server bytes in file order; checks every client
    * byte against the recorded client stream with the clock masks. */
  private final class TracePlayer(frames: Seq[Frame]) extends AutoCloseable {
    private val clientStream = frames.filter(_.dir == 'C').flatMap(_.bytes).toArray
    private val masks = WalsenderTrace.clockMaskRanges(clientStream)
    private def masked(i: Int): Boolean = masks.exists { case (a, b) => i >= a && i < b }

    private val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val port: Int = server.getLocalPort
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val done = new java.util.concurrent.CountDownLatch(1)

    // trailing server frames after the final client frame are dropped:
    // the live client may close before consuming a final keepalive
    private val steps: Seq[Frame] = {
      val lastC = frames.lastIndexWhere(_.dir == 'C')
      frames.take(lastC + 1)
    }

    private val thread = new Thread(() => {
      try {
        val sock = server.accept()
        sock.setTcpNoDelay(true)
        val in = new DataInputStream(sock.getInputStream)
        val out = new DataOutputStream(sock.getOutputStream)
        var cPos = 0 // absolute offset into the recorded client stream
        steps.foreach {
          case Frame('S', bytes) => out.write(bytes); out.flush()
          case Frame(_, golden) =>
            val got = new Array[Byte](golden.length)
            in.readFully(got)
            golden.indices.foreach { i =>
              val abs = cPos + i
              if (!masked(abs) && got(i) != golden(i))
                errors.add(f"client stream byte $abs: got 0x${got(i)}%02x " +
                  f"expected 0x${golden(i)}%02x"): Unit
            }
            cPos += golden.length
        }
        sock.close()
      } catch { case t: Throwable => errors.add(s"player: $t"): Unit }
      finally done.countDown()
    }, "trace-player")
    thread.setDaemon(true)
    thread.start()

    def awaitDone(): Unit = { done.await(30, java.util.concurrent.TimeUnit.SECONDS); () }
    override def close(): Unit = server.close()
  }

  test("client re-produces its recorded byte stream against the real-walsender trace") {
    val tracePath = resource("walsender-pg-pgoutput.trace")
      .getOrElse(cancel("trace fixture not recorded yet"))
    val sidePath = resource("walsender-pg-pgoutput.json")
      .getOrElse(cancel("trace sidecar missing — re-record the fixture"))
    val side = new ObjectMapper().readTree(java.nio.file.Files.readAllBytes(sidePath))

    val frames = WalsenderTrace.read(tracePath)
    assert(frames.exists(_.dir == 'S') && frames.exists(_.dir == 'C'))

    val player = new TracePlayer(frames)
    val client = new PgReplicationClient("127.0.0.1", player.port,
      side.get("user").asText, side.get("database").asText,
      password = Some(side.get("password").asText))
    val envelopes =
      try WalsenderTrace.driveSession(client, side.get("publication").asText,
        side.get("slot").asText, side.get("expect_commits").asInt)
      finally {
        client.close()
        player.awaitDone()
        player.close()
      }

    val errs = { val b = Vector.newBuilder[String]; player.errors.forEach(b += _); b.result() }
    assert(errs.isEmpty,
      s"client deviated from the live-recorded byte stream:\n${errs.take(5).mkString("\n")}")

    // decode parity: envelopes assembled from the replayed bytes must
    // equal what the live session assembled
    val expected = (0 until side.get("envelopes").size).map { i =>
      val e = side.get("envelopes").get(i)
      (e.get("commit_lsn").asLong, e.get("line").asText)
    }
    assert(envelopes == expected)
  }

  test("the recorded session exercises md5 auth and pgoutput framing") {
    val tracePath = resource("walsender-pg-pgoutput.trace")
      .getOrElse(cancel("trace fixture not recorded yet"))
    val frames = WalsenderTrace.read(tracePath)
    val serverBytes = frames.filter(_.dir == 'S').flatMap(_.bytes).toArray
    // AuthenticationMD5Password: 'R' len=12 code=5 — must appear in the
    // server stream (the HBA rule forces md5 on the recorded session)
    val authMd5 = Array[Byte]('R', 0, 0, 0, 12, 0, 0, 0, 5)
    assert(serverBytes.sliding(authMd5.length).exists(_.sameElements(authMd5)),
      "recorded session did not negotiate md5 auth")
    // CopyBothResponse 'W' marks the replication stream switch
    assert(serverBytes.contains('W'.toByte))
    // at least one XLogData CopyData frame carrying a pgoutput Relation
    // message ('R' after the 24-byte XLogData header)
    val clientStream = frames.filter(_.dir == 'C').flatMap(_.bytes).toArray
    assert(WalsenderTrace.clockMaskRanges(clientStream).nonEmpty,
      "no standby status update in the recorded client stream")
    assert(new String(clientStream, StandardCharsets.ISO_8859_1).contains("START_REPLICATION"))
  }
}
