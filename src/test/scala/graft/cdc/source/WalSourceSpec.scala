package graft.cdc.source

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger

/**
 * Custom MicroBatchStream CDC source spec: LSN offsets, ack-on-commit,
 * resume-from-ack, tx-atomic batches, backpressure.
 *
 * Note on ack timing: Spark calls `MicroBatchStream.commit` when it
 * constructs the NEXT batch (or on restart recovery), so the durable ack
 * lags one cycle — the checkpoint is the exact cursor. Tests drive a
 * second run where needed to observe the ack, mirroring how
 * `confirmed_flush_lsn` only advances on the next status update.
 */
class WalSourceSpec extends SparkSpec {

  private def tx(lsn: Long, id: Int): String =
    s"""{"commit_lsn": $lsn, "records": [{"action": "I", "xid": $id,
       |"lsn": "0/$lsn", "nextlsn": "", "timestamp": "t", "schema": "public",
       |"table": "t", "columns": [{"name": "id", "type": "integer",
       |"value": $id}], "pk": []}]}""".stripMargin.replace("\n", " ")

  private def runOnce(walDir: String, ckpt: String,
                      out: java.util.List[Seq[Long]], maxTx: Option[Int] = None): Unit = {
    var reader = spark.readStream.format("graft-wal").option("path", walDir)
    maxTx.foreach(n => reader = reader.option("maxTxPerTrigger", n.toString))
    val q = reader.load().writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect().map(_.getLong(1)).toSeq.sorted
        if (rows.nonEmpty) out.add(rows): Unit
      }
      .start()
    q.awaitTermination(120000)
    ()
  }

  private def flat(l: java.util.List[Seq[Long]]): Seq[Long] = {
    val b = Seq.newBuilder[Long]; l.forEach(s => b ++= s); b.result()
  }

  test("reads txs with LSN offsets; ack advances on next cycle (S1/S5)") {
    val base = Files.createTempDirectory("walsrc").toString
    val wal = s"$base/wal"; Files.createDirectories(Paths.get(wal))
    Files.writeString(Paths.get(wal, "a.json"), tx(100, 1) + "\n" + tx(200, 2))
    val feed = new FileWalFeed(wal)
    assert(feed.ackedLsn == 0L)

    val got = new java.util.ArrayList[Seq[Long]]()
    runOnce(wal, s"$base/ckpt", got)
    assert(flat(got) == Seq(100L, 200L))
    // commit() fires when the NEXT batch runs (ack lags one cycle, like
    // confirmed_flush_lsn): feed one more tx and re-run on the same ckpt
    Files.writeString(Paths.get(wal, "b.json"), tx(300, 3))
    runOnce(wal, s"$base/ckpt", got)
    assert(flat(got) == Seq(100L, 200L, 300L)) // no reprocessing via checkpoint
    assert(feed.ackedLsn >= 200L)              // StandbyStatusUpdate analog advanced
  }

  test("resume from acked LSN when checkpoint is lost (confirmed_flush_lsn)") {
    val base = Files.createTempDirectory("walsrc2").toString
    val wal = s"$base/wal"; Files.createDirectories(Paths.get(wal))
    Files.writeString(Paths.get(wal, "a.json"), tx(100, 1))
    val got1 = new java.util.ArrayList[Seq[Long]]()
    runOnce(wal, s"$base/ckpt1", got1)
    Files.writeString(Paths.get(wal, "b.json"), tx(200, 2))
    runOnce(wal, s"$base/ckpt1", got1) // batch for tx200 commits tx100's offset
    assert(new FileWalFeed(wal).ackedLsn == 100L)

    // FRESH checkpoint dir (checkpoint lost) — the source resumes from
    // the acked LSN: tx100 is NOT reprocessed; tx200 (acked-but-not-
    // committed window) is replayed once = the reference's at-least-once
    // crash window (SURVEY §2.12)
    val got2 = new java.util.ArrayList[Seq[Long]]()
    runOnce(wal, s"$base/ckpt2", got2)
    assert(flat(got2) == Seq(200L), s"got: ${flat(got2)}")
  }

  test("backpressure: maxTxPerTrigger bounds each micro-batch") {
    val base = Files.createTempDirectory("walsrc3").toString
    val wal = s"$base/wal"; Files.createDirectories(Paths.get(wal))
    Files.writeString(Paths.get(wal, "a.json"),
      (1 to 5).map(i => tx(i * 100L, i)).mkString("\n"))

    val batches = new java.util.ArrayList[Seq[Long]]()
    runOnce(wal, s"$base/ckpt", batches, maxTx = Some(2))
    val sizes = { val b = Seq.newBuilder[Int]; batches.forEach(s => b += s.size); b.result() }
    assert(sizes.forall(_ <= 2), s"batch sizes: $sizes")
    assert(sizes.sum == 5)
    assert(flat(batches) == Seq(100L, 200L, 300L, 400L, 500L))
  }

  test("feed ignores sidecar files and reports latest LSN") {
    val base = Files.createTempDirectory("walsrc4").toString
    Files.writeString(Paths.get(base, "a.json"), tx(100, 1))
    val feed = new FileWalFeed(base)
    feed.ack(50L)
    assert(feed.latestLsn == 100L)
    assert(feed.txAfter(0L, 10).map(_._1) == Seq(100L))
    assert(feed.txAfter(100L, 10).isEmpty)
  }

  test("partitions carry file-range refs, never payload; executors read the bytes") {
    val base = Files.createTempDirectory("walsrc5").toString
    val wal = s"$base/wal"; Files.createDirectories(Paths.get(wal))
    val lines = (1 to 5).map(i => tx(i * 100L, i))
    Files.writeString(Paths.get(wal, "a.json"), lines.mkString("\n"))

    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val stream = new WalMicroBatchStream(new FileWalFeed(wal), Int.MaxValue, conf)
    val parts = stream.planInputPartitions(LsnOffset(0L), LsnOffset(500L))
    val refs = parts.flatMap(_.asInstanceOf[WalInputPartition].refs)
    assert(refs.map(_.lsn).toSeq == Seq(100L, 200L, 300L, 400L, 500L))

    // the serialized task payload contains metadata only — no tx JSON
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    parts.foreach(oos.writeObject); oos.close()
    val serialized = new String(bos.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!serialized.contains("\"records\""), "partition leaked payload to the driver plan")
    assert(!serialized.contains("\"columns\""), "partition leaked payload to the driver plan")

    // the executor-side reader reproduces the exact lines from the refs
    val factory = new WalReaderFactory(conf)
    val got = parts.flatMap { p =>
      val r = factory.createReader(p)
      val buf = Vector.newBuilder[(Long, String)]
      while (r.next()) { val row = r.get(); buf += ((row.getLong(1), row.getUTF8String(0).toString)) }
      r.close()
      buf.result()
    }
    assert(got.map(_._1).toSeq == Seq(100L, 200L, 300L, 400L, 500L))
    assert(got.map(_._2).toSeq == lines)
  }

  test("incremental tail: appended bytes are indexed without rescanning, unterminated tail included") {
    val base = Files.createTempDirectory("walsrc6").toString
    val f = Paths.get(base, "a.json")
    Files.writeString(f, tx(100, 1) + "\n")
    val feed = new FileWalFeed(base)
    assert(feed.txRefsAfter(0L, 100).map(_.lsn) == Seq(100L))

    // append one terminated and one unterminated line to the SAME file
    Files.writeString(f, tx(200, 2) + "\n" + tx(300, 3),
      java.nio.file.StandardOpenOption.APPEND)
    val refs = feed.txRefsAfter(0L, 100)
    assert(refs.map(_.lsn) == Seq(100L, 200L, 300L))
    // refs point at the exact line bytes
    assert(refs.map(graft.cdc.source.WalFeed.readRef) == Seq(tx(100, 1), tx(200, 2), tx(300, 3)))
    // a new file shows up too
    Files.writeString(Paths.get(base, "b.json"), tx(400, 4))
    assert(feed.txRefsAfter(250L, 100).map(_.lsn) == Seq(300L, 400L))
    assert(feed.latestLsn == 400L)
  }

  test("torn read: a truncated tail line stays pending until the newline arrives") {
    val base = Files.createTempDirectory("walsrc8").toString
    val f = Paths.get(base, "a.json")
    val full = tx(200, 2)
    // a concurrent writer's append observed mid-write: the visible prefix
    // still matches the commit_lsn regex but is NOT a complete line
    val torn = full.substring(0, full.length / 2)
    Files.writeString(f, tx(100, 1) + "\n" + torn)
    val feed = new FileWalFeed(base)
    assert(feed.txRefsAfter(0L, 100).map(_.lsn) == Seq(100L), "torn tail must not be indexed")
    assert(feed.latestLsn == 100L)

    // the writer finishes the line: the SAME feed (cursor parked at the
    // line start) indexes the completed line with byte-exact payload
    Files.writeString(f, full.substring(full.length / 2) + "\n",
      java.nio.file.StandardOpenOption.APPEND)
    val refs = feed.txRefsAfter(0L, 100)
    assert(refs.map(_.lsn) == Seq(100L, 200L))
    assert(WalFeed.readRef(refs.last) == full, "payload must be the full line, not the torn prefix")
  }

  test("torn read: complete-JSON tail without newline is consumed (EOF-closed spool)") {
    val base = Files.createTempDirectory("walsrc9").toString
    val f = Paths.get(base, "a.json")
    Files.writeString(f, tx(100, 1)) // no trailing newline, but complete JSON
    val feed = new FileWalFeed(base)
    val refs = feed.txRefsAfter(0L, 100)
    assert(refs.map(_.lsn) == Seq(100L))
    assert(WalFeed.readRef(refs.head) == tx(100, 1))
    // re-refresh must not duplicate the consumed tail
    assert(feed.txRefsAfter(0L, 100).map(_.lsn) == Seq(100L))
  }

  test("poison pill: a committed line without commit_lsn is skipped, stream continues") {
    val base = Files.createTempDirectory("walsrc10").toString
    val wal = s"$base/wal"; Files.createDirectories(Paths.get(wal))
    // garbage line BETWEEN two valid transactions — formerly this threw
    // on every trigger (cursor never advanced past the line) and killed
    // the stream permanently
    Files.writeString(Paths.get(wal, "a.json"),
      tx(100, 1) + "\n" + """{"oops": "no lsn here"}""" + "\n" + tx(200, 2) + "\n")
    val feed = new FileWalFeed(wal)
    assert(feed.txRefsAfter(0L, 100).map(_.lsn) == Seq(100L, 200L))
    assert(feed.malformedSkipped == 1L)
    // repeated refreshes do not re-count (cursor advanced past the line)
    assert(feed.txRefsAfter(0L, 100).map(_.lsn) == Seq(100L, 200L))
    assert(feed.malformedSkipped == 1L)

    // the full streaming source delivers the surrounding transactions
    val got = new java.util.ArrayList[Seq[Long]]()
    runOnce(wal, s"$base/ckpt", got)
    assert(flat(got) == Seq(100L, 200L))
  }

  test("index prunes refs at or below the durable ack (retention watermark)") {
    val base = Files.createTempDirectory("walsrc7").toString
    Files.writeString(Paths.get(base, "a.json"), (1 to 4).map(i => tx(i * 100L, i)).mkString("\n"))
    val feed = new FileWalFeed(base)
    assert(feed.txRefsAfter(0L, 100).size == 4)
    feed.ack(200L)
    // acked refs are dropped from the index; later reads still correct
    assert(feed.txRefsAfter(200L, 100).map(_.lsn) == Seq(300L, 400L))
    assert(feed.latestLsn == 400L)
  }
}
