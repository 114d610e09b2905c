package graft.cdc.pgwire

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.cdc.source.{FileWalFeed, WalFeed, WalTxRef}
import PgWire._

/**
 * Assembles wal2json format-version-2 records — one JSON object per
 * XLogData frame — into the one-transaction-per-line envelope the WAL
 * spool uses (`{"commit_lsn":N,"records":[...]}`), mirroring the
 * reference's B..C assembly loop (`pkg/pgrepl/replicator.go:160-204`):
 *
 *  - `B` opens a transaction and pins `nextlsn` as the commit LSN;
 *  - data records accumulate in arrival order;
 *  - `C` must carry the same `nextlsn` (else the tx is dropped with an
 *    error, like `replicator.go:184-188`); an empty tx emits nothing.
 *
 * Not thread-safe: owned by the single receive loop.
 */
final class Wal2JsonTxBuilder {
  private val mapper = new ObjectMapper()
  private var records: ArrayNode = mapper.createArrayNode()
  private var commitLsnText: Option[String] = None

  /** Feed one wal2json record; returns the completed tx envelope (and
    * its commit LSN) when this record is the matching commit. */
  def feed(payload: String): Option[(Long, String)] = {
    val node = mapper.readTree(payload)
    val action = Option(node.get("action")).map(_.asText).getOrElse("")
    action match {
      case "B" =>
        commitLsnText = Option(node.get("nextlsn")).map(_.asText).filter(_.nonEmpty)
        records = mapper.createArrayNode()
        None
      case "C" =>
        val endLsn = Option(node.get("nextlsn")).map(_.asText)
        val out =
          if (endLsn != commitLsnText) {
            // commit/begin mismatch: drop, like replicator.go:184-188
            None
          } else if (records.size() == 0) None
          else {
            val lsn = Lsn.parse(commitLsnText.get)
            val env: ObjectNode = mapper.createObjectNode()
            env.put("commit_lsn", lsn)
            env.set[ObjectNode]("records", records)
            Some((lsn, mapper.writeValueAsString(env)))
          }
        records = mapper.createArrayNode()
        commitLsnText = None
        out
      case "" => None // keepalive-shaped or unknown: nothing to do
      case _ =>
        records.add(node)
        None
    }
  }
}

/**
 * Live-database [[WalFeed]]: runs a [[PgReplicationClient]] on a
 * background thread and spools each completed transaction as one line to
 * `spoolDir`, where an inner [[FileWalFeed]] serves the same
 * metadata-ref interface the streaming source plans against. The spool
 * is the durability boundary: a line is written (one `write` call,
 * newline-terminated) before the transaction is visible to Spark, and
 * `ack` advances both the local retention cursor and the server's
 * `confirmed_flush_lsn` via a standby status update — the
 * `Commit(ctx, lsn)` of `pkg/pgrepl/replicator.go:213-226`.
 *
 * Construction mirrors `replicator.go:61-130`: resume from the slot's
 * `confirmed_flush_lsn` when it exists, else create the slot and start
 * from its consistent point; plugin options are the reference's wal2json
 * set (`replicator.go:140-150`).
 */
final class PgWalFeed(
    client: PgReplicationClient,
    publication: String,
    spoolDir: String,
    slotPrefix: String = "graft") extends WalFeed with AutoCloseable {

  @transient private val inner = new FileWalFeed(spoolDir)
  @transient @volatile private var failure: Throwable = _
  @transient @volatile private var running = false
  @transient @volatile private var lastAcked = 0L
  @transient private var loop: Thread = _

  val slot: String = s"${slotPrefix}_$publication"

  /** Connect, resume-or-create the slot, start streaming; returns the
    * publication tables (like `StartReplication`'s second result). */
  def start(): Seq[String] = synchronized {
    require(!running, "feed already started")
    client.connect()
    val tables = client.publicationTables(publication)
    val startLsn = client.confirmedFlushLsn(slot).getOrElse(client.createReplicationSlot(slot))
    lastAcked = inner.ackedLsn
    client.startReplication(slot, startLsn, PgWalFeed.pluginOptions(tables))
    running = true
    loop = new Thread(() => receiveLoop(), s"pg-wal-feed-$slot")
    loop.setDaemon(true)
    loop.start()
    tables
  }

  private def receiveLoop(): Unit = {
    val builder = new Wal2JsonTxBuilder
    val spool = Paths.get(spoolDir, "spool.jsonl")
    Files.createDirectories(Paths.get(spoolDir))
    try {
      var open = true
      while (open && running) {
        client.receive() match {
          case None => open = false
          case Some(Left(ka)) =>
            if (ka.replyRequested) client.sendStandbyStatus(lastAcked)
          case Some(Right(x)) =>
            val payload = new String(x.payload, StandardCharsets.UTF_8)
            builder.feed(payload).foreach { case (_, line) =>
              // whole line in one write call (spool contract: readers may
              // observe torn appends but never mixed lines)
              Files.write(spool, (line + "\n").getBytes(StandardCharsets.UTF_8),
                StandardOpenOption.CREATE, StandardOpenOption.APPEND)
            }
        }
      }
    } catch {
      case t: Throwable => if (running) failure = t
    }
  }

  private def checkFailed(): Unit = {
    val f = failure
    if (f != null) throw new IllegalStateException("pg-wal feed receive loop failed", f)
  }

  override def txRefsAfter(lsn: Long, max: Int): Seq[WalTxRef] = {
    checkFailed(); inner.txRefsAfter(lsn, max)
  }

  override def latestLsn: Long = { checkFailed(); inner.latestLsn }

  /** Durable ack: local retention cursor + the server's standby status
    * update (`confirmed_flush_lsn`). */
  override def ack(lsn: Long): Unit = {
    inner.ack(lsn)
    lastAcked = math.max(lastAcked, lsn)
    if (running && failure == null) client.sendStandbyStatus(lsn)
  }

  override def ackedLsn: Long = inner.ackedLsn

  override def close(): Unit = synchronized {
    running = false
    client.close()
    if (loop != null) loop.join(5000)
  }
}

object PgWalFeed {
  /** The reference's wal2json plugin options (`replicator.go:140-150`). */
  def pluginOptions(tables: Seq[String]): Seq[(String, String)] = Seq(
    "pretty-print" -> "false",
    "include-transaction" -> "true",
    "include-lsn" -> "true",
    "include-timestamp" -> "true",
    "include-pk" -> "true",
    "format-version" -> "2",
    "include-xids" -> "true",
    "add-tables" -> tables.mkString(","))
}
