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
}
