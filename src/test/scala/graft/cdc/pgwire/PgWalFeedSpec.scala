package graft.cdc.pgwire

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.cdc.{TableColumn, TableSchema, WalDecoder}
import graft.cdc.source.{FileWalFeed, WalFeed}
import org.apache.spark.sql.streaming.Trigger
import PgWire._

/**
 * Parity proof for the pg-wire transport: the [[PgWalFeed]] spooler fed
 * by a live (fake) walsender serves the SAME transactions — byte-exact
 * lines at the [[WalFeed]] interface, identical decoded tables through
 * the full `graft-wal` streaming source — as a [[FileWalFeed]] reading
 * pre-spooled files. This is the integration the reference wires in
 * `pkg/pgrepl/replicator.go:160-226` (stream → assemble → feed channel).
 */
class PgWalFeedSpec extends SparkSpec {

  private val tSchema = TableSchema("t", Seq(
    TableColumn("id", "integer", nullable = false, isPrimary = true),
    TableColumn("name", "text", nullable = true, isPrimary = false)))

  /** wal2json v2 frames for `n` transactions of two inserts each. */
  private def scenario(n: Int): (Seq[String], Seq[Long]) = {
    val frames = Vector.newBuilder[String]
    val lsns = Vector.newBuilder[Long]
    for (k <- 1 to n) {
      val commit = 0x1000L * k
      val commitText = Lsn.format(commit)
      lsns += commit
      frames += s"""{"action":"B","xid":$k,"lsn":"0/F00","nextlsn":"$commitText","timestamp":"ts"}"""
      for (i <- 0 until 2)
        frames += s"""{"action":"I","xid":$k,"lsn":"0/F0$i","nextlsn":"","timestamp":"ts","schema":"public","table":"t","columns":[{"name":"id","type":"integer","value":${k * 10 + i}},{"name":"name","type":"text","value":"row-$k-$i"}],"pk":[{"name":"id","type":"integer"}]}"""
      frames += s"""{"action":"C","xid":$k,"lsn":"0/F09","nextlsn":"$commitText","timestamp":"ts"}"""
    }
    (frames.result(), lsns.result())
  }

  /** The envelope lines the same frames produce when assembled directly. */
  private def directLines(frames: Seq[String]): Seq[String] = {
    val b = new Wal2JsonTxBuilder
    frames.flatMap(f => b.feed(f).map(_._2))
  }

  private def walsenderFor(frames: Seq[String]): FakeWalsender =
    new FakeWalsender(
      publications = Map("pub" -> Seq("public" -> "t")),
      stream = frames.zipWithIndex.map { case (p, i) => (0xF00L + i * 8, p) })

  test("WalFeed parity: spooled lines are byte-identical to direct assembly; ack reaches the server") {
    val (frames, lsns) = scenario(6)
    val expected = directLines(frames)
    assert(expected.size == 6)

    val base = Files.createTempDirectory("pgfeed").toString
    val server = walsenderFor(frames)
    val feed = new PgWalFeed(
      new PgReplicationClient("127.0.0.1", server.port, "u", "db"), "pub", s"$base/spool")
    try {
      val tables = feed.start()
      assert(tables == Seq("public.t"))
      assert(feed.slot == "graft_pub")
      server.awaitStreamed()

      // poll: the background receive loop spools asynchronously
      val deadline = System.nanoTime() + 30e9.toLong
      while (feed.latestLsn < lsns.last && System.nanoTime() < deadline) Thread.sleep(20)

      val refs = feed.txRefsAfter(0L, Int.MaxValue)
      assert(refs.map(_.lsn) == lsns)
      assert(refs.map(WalFeed.readRef) == expected, "spooled lines must be byte-identical")

      // ack: durable local cursor + standby status to the server
      feed.ack(lsns.last)
      assert(feed.ackedLsn == lsns.last)
      val ackDeadline = System.nanoTime() + 10e9.toLong
      while (server.acks.isEmpty && System.nanoTime() < ackDeadline) Thread.sleep(10)
      assert(server.acks == Seq(lsns.last))
      server.check()
    } finally { feed.close(); server.close() }
  }

  test("spool rolls into segments; ack GCs segments below the durable watermark; refs survive a roll") {
    val (frames, lsns) = scenario(6)
    val expected = directLines(frames)
    val base = Files.createTempDirectory("pgfeed3").toString
    val spool = s"$base/spool"
    val server = walsenderFor(frames)
    // tiny segment threshold: every line seals its segment → 6 segments
    val feed = new PgWalFeed(
      new PgReplicationClient("127.0.0.1", server.port, "u", "db"), "pub", spool,
      segmentBytes = 1L)
    try {
      feed.start()
      server.awaitStreamed()
      val deadline = System.nanoTime() + 30e9.toLong
      while (feed.latestLsn < lsns.last && System.nanoTime() < deadline) Thread.sleep(20)

      def segments: Seq[String] =
        graft.core.FsUtil.listDirSorted(Paths.get(spool))
          .map(_.getFileName.toString).filter(_.startsWith("spool-"))
      assert(segments.size == 6, s"one sealed segment per line, got $segments")

      // refs span the roll boundaries and read back byte-identical
      val refs = feed.txRefsAfter(0L, Int.MaxValue)
      assert(refs.map(_.lsn) == lsns)
      assert(refs.map(_.file).distinct.size == 6, "refs must span segments")
      assert(refs.map(graft.cdc.source.WalFeed.readRef) == expected)

      // ack at tx4: segments wholly at/below the watermark disappear;
      // refs above it stay readable
      feed.ack(lsns(3))
      assert(segments.size == 2, s"acked segments must be deleted, got $segments")
      val tail = feed.txRefsAfter(lsns(3), Int.MaxValue)
      assert(tail.map(_.lsn) == lsns.drop(4))
      assert(tail.map(graft.cdc.source.WalFeed.readRef) == expected.drop(4))

      // final ack reclaims everything but the (empty) active segment
      feed.ack(lsns.last)
      assert(segments.forall(s => Files.size(Paths.get(spool, s)) == 0L),
        s"only the active segment may remain, got $segments")
      server.check()
    } finally { feed.close(); server.close() }

    // a fresh feed over the surviving spool resumes across segments:
    // nothing below the ack is served again (restart-resume contract)
    val resumed = new FileWalFeed(spool)
    assert(resumed.ackedLsn == lsns.last)
    assert(resumed.txRefsAfter(resumed.ackedLsn, Int.MaxValue).isEmpty)
  }

  test("restart resumes from the server slot: START_REPLICATION at the acked LSN, no re-spool") {
    val (frames, lsns) = scenario(6)
    val firstFrames = frames.take(3 * 4)  // txs 1-3 (B + 2×I + C each)
    val restFrames = frames.drop(3 * 4)   // txs 4-6
    val base = Files.createTempDirectory("pgfeed4").toString
    val spool = s"$base/spool"

    // session 1: fresh slot, stream txs 1-3, ack through tx3
    val server1 = new FakeWalsender(
      publications = Map("pub" -> Seq("public" -> "t")),
      stream = firstFrames.zipWithIndex.map { case (p, i) => (0xF00L + i * 8, p) })
    val feed1 = new PgWalFeed(
      new PgReplicationClient("127.0.0.1", server1.port, "u", "db"), "pub", spool)
    try {
      feed1.start()
      server1.awaitStreamed()
      val deadline = System.nanoTime() + 30e9.toLong
      while (feed1.latestLsn < lsns(2) && System.nanoTime() < deadline) Thread.sleep(20)
      feed1.ack(lsns(2))
      assert(server1.createdSlots.size() == 1, "fresh run must create the slot")
    } finally { feed1.close(); server1.close() }

    // session 2: the server slot remembers the ack — resume streams 4-6
    val server2 = new FakeWalsender(
      publications = Map("pub" -> Seq("public" -> "t")),
      slotLsn = Some(lsns(2)),
      stream = restFrames.zipWithIndex.map { case (p, i) => (0xF80L + i * 8, p) })
    val feed2 = new PgWalFeed(
      new PgReplicationClient("127.0.0.1", server2.port, "u", "db"), "pub", spool)
    try {
      feed2.start()
      server2.awaitStreamed()
      val deadline = System.nanoTime() + 30e9.toLong
      while (feed2.latestLsn < lsns.last && System.nanoTime() < deadline) Thread.sleep(20)

      assert(server2.createdSlots.isEmpty, "resume must NOT recreate the slot")
      import scala.jdk.CollectionConverters._
      val startRepl = server2.queries.asScala.find(_.startsWith("START_REPLICATION"))
        .getOrElse(fail("no START_REPLICATION issued"))
      assert(startRepl.contains(PgWire.Lsn.format(lsns(2))),
        s"must resume from the slot's confirmed_flush_lsn: $startRepl")

      // exactly the tail transactions appear after the ack (refs below
      // the retention watermark are pruned from the index by design)
      val tail = feed2.txRefsAfter(lsns(2), Int.MaxValue)
      assert(tail.map(_.lsn) == lsns.drop(3))
      // and nothing was re-spooled: the files hold 6 lines total
      val spooledLines = graft.core.FsUtil.listDirSorted(Paths.get(spool))
        .filter(p => !p.getFileName.toString.startsWith("_") && Files.isRegularFile(p))
        .map(p => Files.readString(p).count(_ == '\n')).sum
      assert(spooledLines == 6,
        s"each tx exactly once across restarts, got $spooledLines lines")
      server2.check()
    } finally { feed2.close(); server2.close() }
  }

  test("crash-resume: re-streamed spooled-but-unacked txs are not spooled or served twice") {
    val (frames, lsns) = scenario(6)
    val perTx = 4 // B + 2×I + C
    val base = Files.createTempDirectory("pgfeed5").toString
    val spool = s"$base/spool"

    // session 1: stream txs 1-3 but ack only tx1 — txs 2-3 are durably
    // spooled yet the server's confirmed_flush_lsn stays at tx1
    val server1 = new FakeWalsender(
      publications = Map("pub" -> Seq("public" -> "t")),
      stream = frames.take(3 * perTx).zipWithIndex.map { case (p, i) => (0xF00L + i * 8, p) })
    val feed1 = new PgWalFeed(
      new PgReplicationClient("127.0.0.1", server1.port, "u", "db"), "pub", spool)
    try {
      feed1.start()
      server1.awaitStreamed()
      val deadline = System.nanoTime() + 30e9.toLong
      while (feed1.latestLsn < lsns(2) && System.nanoTime() < deadline) Thread.sleep(20)
      feed1.ack(lsns(0))
    } finally { feed1.close(); server1.close() }

    // session 2: the walsender restreams from confirmed_flush (tx1) —
    // txs 2-3 arrive AGAIN, then the new txs 4-6
    val server2 = new FakeWalsender(
      publications = Map("pub" -> Seq("public" -> "t")),
      slotLsn = Some(lsns(0)),
      stream = frames.drop(1 * perTx).zipWithIndex.map { case (p, i) => (0xF80L + i * 8, p) })
    val feed2 = new PgWalFeed(
      new PgReplicationClient("127.0.0.1", server2.port, "u", "db"), "pub", spool)
    try {
      feed2.start()
      server2.awaitStreamed()
      val deadline = System.nanoTime() + 30e9.toLong
      while (feed2.latestLsn < lsns.last && System.nanoTime() < deadline) Thread.sleep(20)

      // every tx above the ack exactly once at the serving interface
      val served = feed2.txRefsAfter(lsns(0), Int.MaxValue)
      assert(served.map(_.lsn) == lsns.drop(1),
        s"each unacked tx exactly once, got ${served.map(_.lsn)}")
      // and the re-sent copies were never appended: 6 lines on disk total
      val spooledLines = graft.core.FsUtil.listDirSorted(Paths.get(spool))
        .filter(p => !p.getFileName.toString.startsWith("_") && Files.isRegularFile(p))
        .map(p => Files.readString(p).count(_ == '\n')).sum
      assert(spooledLines == 6, s"re-sent txs must not re-spool, got $spooledLines lines")
      server2.check()
    } finally { feed2.close(); server2.close() }
  }

  test("a dirty spool with duplicate commit LSNs still serves each tx once") {
    // spools written before the resume guard existed can hold two copies
    // of one tx — the index must serve the first and drop the second
    val base = Files.createTempDirectory("dupspool").toString
    val line1 = """{"commit_lsn":4096,"records":[{"action":"I","table":"t"}]}"""
    val line2 = """{"commit_lsn":8192,"records":[{"action":"I","table":"t"}]}"""
    Files.write(Paths.get(base, "spool-00000000.jsonl"),
      s"$line1\n$line2\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.write(Paths.get(base, "spool-00000001.jsonl"),
      s"$line2\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)) // duplicate copy
    val feed = new FileWalFeed(base)
    val refs = feed.txRefsAfter(0L, Int.MaxValue)
    assert(refs.map(_.lsn) == Seq(4096L, 8192L), s"duplicate LSN served twice: ${refs.map(_.lsn)}")
  }

  test("end-to-end parity: graft-wal over pgHost decodes to the identical table as file input") {
    val (frames, lsns) = scenario(6)
    val expected = directLines(frames)

    val base = Files.createTempDirectory("pgfeed2").toString
    // PATH A: pre-spooled file consumed by the stock FileWalFeed path
    val dirA = s"$base/direct"; Files.createDirectories(Paths.get(dirA))
    Files.writeString(Paths.get(dirA, "feed.jsonl"), expected.mkString("", "\n", "\n"))

    // PATH B: live pg-wire transport through the actual streaming source
    val server = walsenderFor(frames)
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream.format("graft-wal")
      .option("path", s"$base/spool")
      .option("pgHost", "127.0.0.1")
      .option("pgPort", server.port.toString)
      .option("pgUser", "u")
      .option("pgDatabase", "db")
      .option("publication", "pub")
      .load()
      .writeStream
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => collected.add((r.getLong(1), r.getString(0)))): Unit
      }
      .start()
    try {
      val deadline = System.nanoTime() + 60e9.toLong
      while (collected.size < expected.size && System.nanoTime() < deadline) Thread.sleep(50)
    } finally { q.stop(); server.close() }

    val got = { val b = Vector.newBuilder[(Long, String)]; collected.forEach(b += _); b.result() }
      .sortBy(_._1)
    assert(got.map(_._1) == lsns)
    assert(got.map(_._2) == expected, "streamed lines must equal the file-feed lines")

    // decode both paths with the replay pipeline — identical tables
    import scala.jdk.CollectionConverters._
    val linesA = spark.read.text(dirA)
    val linesB = spark.createDataFrame(
      got.map(l => org.apache.spark.sql.Row(l._2)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType))))
    def decode(lines: org.apache.spark.sql.DataFrame): Seq[(Int, String)] =
      WalDecoder.decodeTables(spark, lines, Seq(tSchema))("t")
        .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    val a = decode(linesA)
    assert(a == decode(linesB))
    assert(a.size == 12 && a.head == (10, "row-1-0"))
  }
}
