package graft.cdc.source

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/**
 * Custom Structured Streaming CDC source (S1/S2/S5): a DataSourceV2
 * `MicroBatchStream` over a wal2json transaction feed with **LSN
 * offsets** and **ack-on-commit**.
 *
 * Spark-native equivalent of the reference's replication client
 * (`pkg/pgrepl/replicator.go:61-226`):
 *  - resume: `initialOffset` = last *acked* LSN, exactly like resuming a
 *    slot from `confirmed_flush_lsn` (`replicator.go:105-130`);
 *  - batch: `(start, end]` by commit LSN — a transaction is never split
 *    across batches (tx atomicity, S3), because the feed is
 *    one-tx-per-line;
 *  - ack: `commit(offset)` records the LSN durably — the
 *    `StandbyStatusUpdate` of `Commit(ctx, lsn)` (`replicator.go:213-226`,
 *    S5) — only after Spark has durably completed the batch. Spark
 *    invokes `commit` at the NEXT batch construction, so the ack lags
 *    one cycle: the checkpoint is the exact cursor, the ack is the
 *    retention watermark. Losing the checkpoint replays at most one
 *    acked-but-uncommitted window — the same at-least-once crash window
 *    the reference accepts between upload and cleanup (SURVEY §2.12
 *    streaming semantics);
 *  - backpressure: `maxTxPerTrigger` caps a batch (the channel
 *    blocking-send of `replicator.go:70,194` becomes bounded admission).
 *
 * The transport is a pluggable [[WalFeed]]; [[FileWalFeed]] tails
 * JSON-lines files (zero-egress build). A pg-wire replication client
 * implements the same trait against a live database.
 *
 * Usage: `spark.readStream.format("graft-wal").option("path", dir).load()`
 * → schema `(value STRING, commit_lsn LONG)`, directly consumable by
 * [[graft.cdc.WalDecoder.decodeRecords]].
 */
class WalSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-wal"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WalSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WalTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object WalSource {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("commit_lsn", LongType, nullable = false)))
}

/** Transaction feed: ordered (lsn, line) pairs + durable ack cursor. */
trait WalFeed extends Serializable {
  def txAfter(lsn: Long, max: Int): Seq[(Long, String)]
  def latestLsn: Long
  def ack(lsn: Long): Unit
  def ackedLsn: Long
}

/**
 * File-backed feed: JSON-lines files in a directory (same envelope as
 * `internal/app/testdata/wal.input`), ordered by commit LSN; the ack
 * cursor is a sidecar file — the durable analog of
 * `confirmed_flush_lsn`.
 */
final class FileWalFeed(dir: String) extends WalFeed {
  private def ackPath: Path = Paths.get(dir, "_acked_lsn")
  private val LsnRe = """"commit_lsn"\s*:\s*(\d+)""".r

  private def scan(): Seq[(Long, String)] = {
    // scan runs several times per micro-batch on a long-lived query
    // (latestOffset, planInputPartitions, reportLatestOffset) — the
    // directory stream must be closed eagerly, not left to GC
    graft.core.FsUtil.listDir(Paths.get(dir))
      .filter(p => !p.getFileName.toString.startsWith("_"))
      .flatMap(p => Files.readAllLines(p, StandardCharsets.UTF_8).asScala)
      .filter(_.trim.nonEmpty)
      .map { line =>
        val lsn = LsnRe.findFirstMatchIn(line).map(_.group(1).toLong)
          .getOrElse(throw new IllegalArgumentException(s"wal line without commit_lsn: $line"))
        (lsn, line)
      }
      .sortBy(_._1)
  }

  override def txAfter(lsn: Long, max: Int): Seq[(Long, String)] =
    scan().filter(_._1 > lsn).take(max)

  override def latestLsn: Long = {
    val s = scan()
    if (s.isEmpty) ackedLsn else s.last._1
  }

  override def ack(lsn: Long): Unit = {
    val tmp = Paths.get(dir, "_acked_lsn.tmp")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(tmp, lsn.toString)
    Files.move(tmp, ackPath, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def ackedLsn: Long =
    if (Files.exists(ackPath)) Files.readString(ackPath).trim.toLong else 0L
}

final case class LsnOffset(lsn: Long) extends Offset {
  override def json(): String = s"""{"lsn":$lsn}"""
}

class WalTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-wal(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = WalSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new WalScan(options.asScala.toMap)
}

class WalScan(options: Map[String, String]) extends Scan {
  override def readSchema(): StructType = WalSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val dir = options.getOrElse("path",
      throw new IllegalArgumentException("graft-wal requires option 'path'"))
    val maxTx = options.get("maxtxpertrigger").map(_.toInt).getOrElse(Int.MaxValue)
    new WalMicroBatchStream(new FileWalFeed(dir), maxTx)
  }
}

class WalMicroBatchStream(feed: WalFeed, maxTxPerTrigger: Int)
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: fixed target captured at query start, so the
  // run drains exactly the data present then terminates.
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = LsnOffset(feed.ackedLsn) // resume ≡ confirmed_flush_lsn

  override def getDefaultReadLimit: ReadLimit =
    if (maxTxPerTrigger == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxTxPerTrigger)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(feed.latestLsn)

  override def reportLatestOffset(): Offset = LsnOffset(feed.latestLsn)

  /** Admission control: advance from `start` by at most the read limit
    * (the bounded analog of the reference's blocking channel send,
    * `replicator.go:70,194`). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LsnOffset].lsn
    val cap = limit match {
      case r: ReadMaxRows => r.maxRows().toInt
      case _ => Int.MaxValue
    }
    val txs = feed.txAfter(from, cap)
    val end = if (txs.isEmpty) from else txs.last._1
    LsnOffset(availableNowTarget.fold(end)(t => math.min(end, t)))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def deserializeOffset(json: String): Offset = {
    val m = """"lsn"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
    LsnOffset(m.map(_.group(1).toLong).getOrElse(0L))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LsnOffset].lsn
    val e = end.asInstanceOf[LsnOffset].lsn
    val txs = feed.txAfter(s, Int.MaxValue).filter(_._1 <= e)
    if (txs.isEmpty) Array.empty
    else {
      // split a large batch into contiguous LSN-range chunks so decode
      // parallelizes across executors (one partition would serialize the
      // whole window into a single task at scale); tx atomicity is
      // per-line so any chunking is safe
      val chunkSize = math.max(1, math.min(10000, txs.length / 32 + 1))
      txs.grouped(chunkSize).map(c => WalInputPartition(c.toArray): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = new WalReaderFactory

  /** S5: LSN ack after the batch is durably committed by the engine. */
  override def commit(end: Offset): Unit = feed.ack(end.asInstanceOf[LsnOffset].lsn)

  override def stop(): Unit = ()
}

final case class WalInputPartition(txs: Array[(Long, String)]) extends InputPartition

class WalReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val txs = partition.asInstanceOf[WalInputPartition].txs
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < txs.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(txs(i)._2), txs(i)._1)
      override def close(): Unit = ()
    }
  }
}
