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
 * **Spool retention**: lines land in fixed-size segments
 * (`spool-NNNNNNNN.jsonl`, rolled once a segment reaches `segmentBytes`;
 * each restart opens a fresh segment). Sealed segments are immutable —
 * never renamed, so [[WalTxRef]] file paths stay valid across rolls —
 * and `ack` deletes every sealed segment whose highest commit LSN is at
 * or below the durable ack: those refs are below the resume point
 * (`initialOffset == ackedLsn`) and can never be requested again. Local
 * disk is therefore O(unacked WAL) + one segment, the same bounded
 * footprint the reference gets from deleting its buffer DB every window
 * (`internal/app/db.go:404-421`).
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
    slotPrefix: String = "graft",
    segmentBytes: Long = PgWalFeed.DefaultSegmentBytes,
    plugin: String = "wal2json") extends WalFeed with AutoCloseable {

  require(PgWalFeed.SupportedPlugins(plugin),
    s"unsupported logical decoding plugin '$plugin' (supported: ${PgWalFeed.SupportedPlugins.mkString(", ")})")

  @transient private val inner = new FileWalFeed(spoolDir)
  @transient @volatile private var failure: Throwable = _
  @transient @volatile private var running = false
  @transient @volatile private var lastAcked = 0L
  @transient private var loop: Thread = _

  // Segment state: seq/size/lastLsn are owned by the receive loop after
  // start() (thread-start happens-before); the active path is volatile
  // so the GC on the ack thread never deletes the file being written.
  @transient private var segSeq = 0L
  @transient private var segSize = 0L
  @transient private var segLastLsn = 0L
  @transient @volatile private var activeSegment: String = ""
  // sealed segment -> highest commit LSN it contains (lazy for segments
  // inherited from a previous process, cached once computed)
  @transient private val sealedMaxLsn =
    new java.util.concurrent.ConcurrentHashMap[java.nio.file.Path, java.lang.Long]()

  val slot: String = s"${slotPrefix}_$publication"

  // Crash-resume duplicate guard: the server restreams from
  // confirmed_flush_lsn, which can be BEHIND what this spool already
  // holds (spooled-but-unacked transactions at the crash). Re-sent
  // transactions at or below the spool's high-water mark at start are
  // already durably on disk and must not be appended again — a second
  // copy would be served twice downstream.
  @transient @volatile private var resumeSkipBelow = 0L

  private def segPath(seq: Long): java.nio.file.Path =
    Paths.get(spoolDir, f"spool-$seq%08d.jsonl")

  /** Connect, resume-or-create the slot, start streaming; returns the
    * publication tables (like `StartReplication`'s second result). */
  def start(): Seq[String] = synchronized {
    require(!running, "feed already started")
    client.connect()
    val tables = client.publicationTables(publication)
    val startLsn = client.confirmedFlushLsn(slot).getOrElse(client.createReplicationSlot(slot, plugin))
    lastAcked = inner.ackedLsn
    // scan pre-existing segments once: anything the previous process
    // spooled durably is the resume floor for appends (torn tails are
    // not parsed, so a partially-written tx is correctly re-spooled)
    resumeSkipBelow = inner.latestLsn
    // open a fresh segment after any pre-existing ones (old segments are
    // sealed; their max LSNs are recovered lazily at GC time)
    Files.createDirectories(Paths.get(spoolDir))
    val existing = graft.core.FsUtil.listDirSorted(Paths.get(spoolDir))
      .flatMap(p => p.getFileName.toString match {
        case PgWalFeed.SegmentName(n) => Some(n.toLong)
        case _ => None
      })
    segSeq = existing.foldLeft(-1L)(math.max) + 1
    segSize = 0L
    segLastLsn = 0L
    activeSegment = segPath(segSeq).toString
    client.startReplication(slot, startLsn,
      PgWalFeed.optionsFor(plugin, publication, tables))
    running = true
    loop = new Thread(() => receiveLoop(), s"pg-wal-feed-$slot")
    loop.setDaemon(true)
    loop.start()
    tables
  }

  private def receiveLoop(): Unit = {
    // one framer per connection: wal2json frames are JSON text, pgoutput
    // frames are the binary logical-replication messages — both assemble
    // into the identical one-tx-per-line spool envelope
    val framer: PgWire.XLogData => Option[(Long, String)] = plugin match {
      case "pgoutput" =>
        val b = new PgOutputTxBuilder; b.feed
      case _ =>
        val b = new Wal2JsonTxBuilder
        x => b.feed(new String(x.payload, StandardCharsets.UTF_8))
    }
    try {
      var open = true
      while (open && running) {
        client.receive() match {
          case None => open = false
          case Some(Left(ka)) =>
            if (ka.replyRequested) client.sendStandbyStatus(lastAcked)
          case Some(Right(x)) =>
            // lsn <= resumeSkipBelow is a crash-resume duplicate: already
            // durably spooled by a previous process; the walsender
            // restreams from the (older) confirmed_flush_lsn
            framer(x).filter(_._1 > resumeSkipBelow).foreach { case (lsn, line) =>
              // whole line in one write call (spool contract: readers may
              // observe torn appends but never mixed lines)
              val bytes = (line + "\n").getBytes(StandardCharsets.UTF_8)
              Files.write(segPath(segSeq), bytes,
                StandardOpenOption.CREATE, StandardOpenOption.APPEND)
              segSize += bytes.length
              segLastLsn = lsn
              if (segSize >= segmentBytes) {
                // seal the current segment (immutable from here on) and
                // roll to the next; the seal records its max LSN for GC
                sealedMaxLsn.put(segPath(segSeq), segLastLsn)
                segSeq += 1
                segSize = 0L
                activeSegment = segPath(segSeq).toString
              }
            }
        }
      }
    } catch {
      case t: Throwable => if (running) failure = t
    }
  }

  /** Highest commit LSN in a sealed segment: from the seal record, else
    * (segments inherited across restarts) one linear scan, cached. A
    * garbage-only file reports 0 and is only removed when empty. */
  private def maxLsnOf(p: java.nio.file.Path): Long =
    sealedMaxLsn.computeIfAbsent(p, { p1 =>
      val LsnRe = """"commit_lsn"\s*:\s*(\d+)""".r
      var max = 0L
      val reader = Files.newBufferedReader(p1, StandardCharsets.UTF_8)
      try {
        var line = reader.readLine()
        while (line != null) {
          LsnRe.findFirstMatchIn(line).foreach(m => max = math.max(max, m.group(1).toLong))
          line = reader.readLine()
        }
      } finally reader.close()
      max
    })

  /** Delete sealed segments whose every line is at or below the durable
    * ack — the retention GC the round-6 audit flagged as missing. */
  private def gcSpool(acked: Long): Unit = {
    val dir = Paths.get(spoolDir)
    if (!Files.isDirectory(dir)) return
    for (p <- graft.core.FsUtil.listDirSorted(dir)
         if p.toString != activeSegment && Files.isRegularFile(p)) {
      val candidate = p.getFileName.toString match {
        case PgWalFeed.SegmentName(_) => true
        case "spool.jsonl" => true // pre-segmentation legacy spool
        case _ => false
      }
      if (candidate) {
        val max = if (Files.size(p) == 0L) 0L else maxLsnOf(p)
        if (max <= acked && (max > 0L || Files.size(p) == 0L)) {
          Files.deleteIfExists(p)
          sealedMaxLsn.remove(p)
        }
      }
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
    * update (`confirmed_flush_lsn`) + spool segment GC. */
  override def ack(lsn: Long): Unit = {
    inner.ack(lsn)
    lastAcked = math.max(lastAcked, lsn)
    if (running && failure == null) client.sendStandbyStatus(lsn)
    gcSpool(inner.ackedLsn)
  }

  override def ackedLsn: Long = inner.ackedLsn

  override def close(): Unit = synchronized {
    running = false
    client.close()
    if (loop != null) loop.join(5000)
  }
}

object PgWalFeed {
  /** Default spool segment size before rolling (64 MB: large enough that
    * segment count stays trivial, small enough that retention reclaims
    * disk promptly after each ack). */
  val DefaultSegmentBytes: Long = 64L * 1024 * 1024

  private[pgwire] val SegmentName = """spool-(\d+)\.jsonl""".r

  /** Logical decoding plugins this feed can assemble transactions from. */
  val SupportedPlugins: Set[String] = Set("wal2json", "pgoutput")

  /** START_REPLICATION plugin options by plugin. pgoutput's are the two
    * the built-in plugin requires (protocol docs, "Logical Streaming
    * Replication Parameters"); wal2json's are the reference's set. */
  def optionsFor(plugin: String, publication: String, tables: Seq[String]): Seq[(String, String)] =
    plugin match {
      case "pgoutput" => Seq(
        "proto_version" -> "1",
        "publication_names" -> publication)
      case _ => pluginOptions(tables)
    }

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
