package graft.cdc.pgwire

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.collection.mutable.ListBuffer

/**
 * Recorded-walsender trace tooling: a byte-level recording proxy, the
 * deterministic replication session script shared by the recorder and
 * the replayer, and the trace file format.
 *
 * The point of the ceremony: the committed `.trace` fixture holds the
 * bytes a REAL PostgreSQL walsender produced (recorded through
 * [[RecordingProxy]] by [[RecordWalsenderTrace]]), and
 * `LiveTraceReplaySpec` re-drives the same client logic against those
 * bytes in any environment — so the pg-wire client is pinned to actual
 * server behavior, not to a hand-assembled reading of the protocol docs
 * (which [[RecordedWalsenderSpec]] already covers). This closes the
 * round-9 "shared protocol-doc misreading" seam without needing Postgres
 * in CI.
 *
 * Trace format: magic "PGT1", then frames of
 * `[dir: 'C'|'S'][len: int32][bytes]` in arrival order (consecutive
 * same-direction chunks merged). Client→server frames are causally
 * ordered after every server byte the client consumed to produce them,
 * so replaying server frames and expecting client frames in file order
 * cannot deadlock.
 */
object WalsenderTrace {

  final case class Frame(dir: Char, bytes: Array[Byte])

  def write(path: Path, frames: Seq[Frame]): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(Files.newOutputStream(path)))
    try {
      out.write("PGT1".getBytes(StandardCharsets.US_ASCII))
      frames.foreach { f =>
        out.writeByte(f.dir.toInt); out.writeInt(f.bytes.length); out.write(f.bytes)
      }
    } finally out.close()
  }

  def read(path: Path): Seq[Frame] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(Files.newInputStream(path)))
    try {
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(new String(magic, StandardCharsets.US_ASCII) == "PGT1", "bad trace magic")
      val frames = ListBuffer[Frame]()
      var eof = false
      while (!eof) {
        val d = in.read()
        if (d < 0) eof = true
        else {
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          frames += Frame(d.toChar, b)
        }
      }
      frames.toList
    } finally in.close()
  }

  /** Merge consecutive same-direction frames. */
  def coalesce(frames: Seq[Frame]): Seq[Frame] =
    frames.foldLeft(ListBuffer[Frame]()) { (acc, f) =>
      acc.lastOption match {
        case Some(last) if last.dir == f.dir =>
          acc(acc.size - 1) = Frame(last.dir, last.bytes ++ f.bytes); acc
        case _ => acc += f
      }
    }.toList

  /**
   * Byte ranges in the client→server stream that are legitimately
   * nondeterministic: the 8-byte clock field of every standby status
   * update ('d' CopyData whose body starts with 'r', clock at offset 30
   * of the message). Walks the concatenated client stream message-wise
   * (startup message first — no type byte), returns absolute offsets.
   */
  def clockMaskRanges(client: Array[Byte]): Seq[(Int, Int)] = {
    val masks = ListBuffer[(Int, Int)]()
    var pos = 0
    // startup message: int32 len (includes itself), no type byte
    if (client.length >= 4) {
      val len = java.nio.ByteBuffer.wrap(client, 0, 4).getInt
      pos = len
    }
    while (pos + 5 <= client.length) {
      val tpe = client(pos).toChar
      val len = java.nio.ByteBuffer.wrap(client, pos + 1, 4).getInt
      // standby status CopyData: len = 4 (itself) + 34-byte 'r' body
      if (tpe == 'd' && len >= 4 + 34 && client(pos + 5) == 'r'.toByte)
        masks += ((pos + 30, pos + 38))
      pos += 1 + len
    }
    masks.toList
  }

  /**
   * The deterministic replication session both the recorder (against a
   * live walsender) and the replayer (against the recorded bytes) drive:
   * resume the pre-created slot, START_REPLICATION with the pgoutput
   * options, assemble envelopes until `expectCommits` transactions, ack
   * the last commit. Every client action is a pure function of the
   * server's bytes, so the same server bytes always produce the same
   * client bytes (modulo the masked standby-status clock).
   */
  def driveSession(client: PgReplicationClient, publication: String, slot: String,
                   expectCommits: Int): Seq[(Long, String)] = {
    client.connect()
    val tables = client.publicationTables(publication)
    val start = client.confirmedFlushLsn(slot)
      .getOrElse(sys.error(s"slot $slot must exist before the session"))
    client.startReplication(slot, start, PgWalFeed.optionsFor("pgoutput", publication, tables))
    val builder = new PgOutputTxBuilder
    val envelopes = ListBuffer[(Long, String)]()
    var lastCommit = 0L
    while (envelopes.size < expectCommits) {
      client.receive() match {
        case Some(Right(x)) =>
          builder.feed(x).foreach { e => lastCommit = e._1; envelopes += e }
        case Some(Left(ka)) =>
          if (ka.replyRequested) client.sendStandbyStatus(lastCommit)
        case None =>
          sys.error(s"stream ended after ${envelopes.size}/$expectCommits transactions")
      }
    }
    client.sendStandbyStatus(lastCommit)
    envelopes.toList
  }
}

/** One-connection TCP recording proxy: forwards bytes both ways between
  * the accepted client and `targetHost:targetPort`, logging every chunk
  * with its direction in arrival order. */
final class RecordingProxy(targetHost: String, targetPort: Int) extends AutoCloseable {
  import WalsenderTrace.Frame

  private val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  private val log = ListBuffer[Frame]()
  private val done = new java.util.concurrent.CountDownLatch(2)
  @volatile private var failure: Throwable = _

  private def pump(dir: Char, from: java.io.InputStream, to: java.io.OutputStream): Unit = {
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = from.read(buf)
      while (n > 0) {
        log.synchronized { log += Frame(dir, java.util.Arrays.copyOf(buf, n)) }
        to.write(buf, 0, n); to.flush()
        n = from.read(buf)
      }
    } catch { case _: java.io.IOException => () } // peer closed: normal end
    finally {
      try to.flush() catch { case _: Throwable => () }
      done.countDown()
    }
  }

  private val acceptor = new Thread(() => {
    try {
      val cli = server.accept()
      cli.setTcpNoDelay(true)
      val srv = new Socket()
      srv.connect(new java.net.InetSocketAddress(targetHost, targetPort), 15000)
      srv.setTcpNoDelay(true)
      val t1 = new Thread(() => pump('C', cli.getInputStream, srv.getOutputStream), "proxy-c2s")
      val t2 = new Thread(() => pump('S', srv.getInputStream, cli.getOutputStream), "proxy-s2c")
      t1.setDaemon(true); t2.setDaemon(true)
      t1.start(); t2.start()
      t1.join(); t2.join()
      try cli.close() catch { case _: Throwable => () }
      try srv.close() catch { case _: Throwable => () }
    } catch { case t: Throwable => failure = t; done.countDown(); done.countDown() }
  }, "proxy-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Wait for both directions to drain, then return the coalesced log.
    * A timeout is an error — returning a truncated log would record an
    * incomplete trace fixture that only fails much later, at replay. */
  def frames(timeoutMs: Long = 30000): Seq[Frame] = {
    val drained = done.await(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    if (failure != null) throw new IllegalStateException("proxy failed", failure)
    require(drained, s"proxy streams not drained within ${timeoutMs}ms — trace would be truncated")
    log.synchronized(WalsenderTrace.coalesce(log.toList))
  }

  override def close(): Unit = try server.close() catch { case _: Throwable => () }
}
