package graft.engine

import graft.cdc.{TableSchema, WalDecoder}
import graft.core.{FsUtil, VaultName}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable file signer (C1). Production impl = keccak256 + secp256k1;
  * see [[graft.crypto.Keccak256]]. */
trait FileSigner extends Serializable {
  def sign(file: Path): Array[Byte]
}

/** Content-addressed store abstraction (Q3 read path + P8 upload). The
  * reference's provider HTTP API + IPFS cold store collapse to this trait;
  * zero-egress builds use [[LocalContentStore]]. */
trait ContentStore extends Serializable {
  def put(vault: VaultName, file: Path, timestampSec: Long, signature: Array[Byte]): String // → cid
  def get(cid: String): Option[Path]
  /** Drop an artifact from the hot store (compaction cleanup). Stores
    * without delete semantics (e.g. the provider HTTP API) return false;
    * readers then fall back to the cold tier like any cache miss. */
  def delete(cid: String): Boolean = false
}

/** Local-directory provider: `put` = atomic move into the store keyed by a
  * deterministic content id; `get` = lookup. Stands in for
  * `pkg/vaultsprovider/provider.go:124-214` without network egress. */
final class LocalContentStore(rootDir: String) extends ContentStore {
  private def root = { val p = Paths.get(rootDir); Files.createDirectories(p); p }

  override def put(vault: VaultName, file: Path, timestampSec: Long, sig: Array[Byte]): String = {
    val cid = LocalContentStore.contentId(file)
    val dest = root.resolve(s"$cid-${file.getFileName}")
    Files.move(file, dest, StandardCopyOption.REPLACE_EXISTING)
    cid
  }

  override def get(cid: String): Option[Path] =
    FsUtil.listDir(root).find(_.getFileName.toString.startsWith(cid + "-"))

  override def delete(cid: String): Boolean =
    get(cid).exists { p => FsUtil.deleteRecursive(p); true }
}

object LocalContentStore {
  /** Deterministic content id: CIDv1 (raw codec, sha2-256 multihash) in
    * multibase base32 — the reference's id format, computed offline
    * from the streamed content hash. Directory artifacts hash their
    * files in name order. */
  def contentId(file: Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def absorb(f: Path): Unit = {
      val in = Files.newInputStream(f)
      try {
        val buf = new Array[Byte](4096) // chunked like signing.go:79
        var n = in.read(buf)
        while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
    }
    if (Files.isDirectory(file)) {
      FsUtil.listDirSorted(file).filter(Files.isRegularFile(_)).foreach(absorb)
    } else absorb(file)
    CarV1.Cid.v1FromDigest(CarV1.CodecRaw, md.digest()).toString
  }
}

/**
 * Event-time export windows — P5's semantic upgrade over the reference's
 * processing-time rotation ticker (SURVEY §7.4): artifacts are batched
 * by the WAL record's commit TIMESTAMP, not by micro-batch arrival.
 * Tumbling `windowSeconds` windows; a window FINALIZES (sign + upload +
 * event) once the watermark — max observed event time minus
 * `latenessSeconds` — passes its end. A record arriving within the
 * lateness bound lands in its (still-pending) event-time window no
 * matter which micro-batch carried it; a record older than the
 * watermark is DROPPED — exactly Structured Streaming's append-mode
 * watermark contract, applied to file artifacts.
 *
 * State is the staging FILESYSTEM, not the state store: each pending
 * window accumulates per-batch parquet sub-writes (overwrite-idempotent
 * under batch replay), and the watermark file commits after
 * finalization — a crash replays losslessly (re-appended batches
 * overwrite their own sub-dirs; a re-finalized window re-uploads the
 * same content-addressed artifact). At 100 TB a pending window is
 * gigabytes; files-as-state (vs `flatMapGroupsWithState` rows-in-state)
 * is what lets this shape scale.
 *
 * Adversarial inputs (r14, spec-pinned in `StreamPipelineSpec`):
 *  - a LATE-DATA FLOOD (arbitrarily many records aimed at closed
 *    windows) is dropped record-by-record at the `live` filter and
 *    never creates a pending slice — the pending store is bounded by
 *    OPEN-window rows regardless of flood size (the
 *    `file_feed_eventtime_hostile_late` INGEST_BENCH arm prices it);
 *  - a STALLED event time freezes the watermark: exactly the open
 *    windows accumulate (that data is genuinely unfinalizable), and
 *    resumption flushes each exactly once;
 *  - a FAR-FUTURE outlier timestamp advances the watermark past every
 *    in-band window (Structured Streaming's own contract, inherited
 *    deliberately — a clamp heuristic would hide producer clock bugs);
 *    subsequent in-band records drop. Feeds are expected to sanitize
 *    timestamps upstream.
 */
final case class EventTimeWindows(windowSeconds: Long, latenessSeconds: Long) {
  require(windowSeconds > 0 && latenessSeconds >= 0,
    "eventTime: windowSeconds > 0 and latenessSeconds >= 0 required")
}

/**
 * The windowed vault sink (P5-P10): for one micro-batch of WAL lines,
 * decode per-table typed DataFrames, write one parquet snapshot per
 * non-empty table (P6 empty-skip), sign it, hand it to the content store,
 * record an event, clean staging (P10).
 *
 * Called from `foreachBatch` — micro-batch sequencing replaces the
 * reference's mutex-serialized ticker rotation (`internal/app/db.go:83-101`).
 * Output naming `<table>-<windowId>` mirrors `<table>-<unixnano>.db.parquet`
 * (`internal/app/db.go:168`). Single-file output (`coalesce(1)`) matches the
 * reference's one-file-per-window contract; at 100 TB disable
 * `singleFile` to write a directory per window instead (no serialization
 * point) — the event log then records the directory.
 */
final class VaultSink(
    namespace: String,
    schemas: Seq[TableSchema],
    stagingDir: String,
    store: ContentStore,
    signer: Option[FileSigner] = None,
    catalog: Option[graft.catalog.VaultCatalog] = None,
    replayActions: Set[String] = Set("I"),
    singleFile: Boolean = true,
    clock: () => Long = () => java.time.Instant.now().getEpochSecond,
    // mid-stream DDL contract (default ON for the streaming pipeline):
    // a record diverging from the stream-start schema fails the batch
    // loudly (PgValueDecoder.schemaDriftGuard) instead of silently
    // dropping a newly added column from the uploaded artifacts
    strictSchema: Boolean = true,
    // drift comparison mode under strictSchema: Exact is the steady-state
    // streaming default (catches trailing-column DROPs too); pass
    // DriftMode.Prefix ONLY as the explicit recovery flag when replaying
    // pre-ALTER spool history under a refreshed (widened) schema — see
    // PgValueDecoder.schemaDriftGuard
    driftMode: graft.cdc.DriftMode = graft.cdc.DriftMode.Exact,
    // pgNumericAsDecimal: decode numeric(p,s) columns to exact decimals
    // in the uploaded artifacts instead of the reference's lossy double
    // (graft.core.PgTypes.of) — the same opt-in the batch entry points
    // take, threaded here so streaming money columns can be exact too
    numericAsDecimal: Boolean = false,
    // event-time mode (see [[EventTimeWindows]]); None = the reference-
    // parity default, micro-batch = upload window (processing time)
    eventTime: Option[EventTimeWindows] = None) extends Serializable {

  def processBatch(batch: DataFrame, windowId: Long): Seq[(String, String)] = {
    // Event timestamp = real upload time in epoch seconds (like the
    // reference stamping uploads with unix time, internal/app/db.go:198),
    // NOT the micro-batch id — windowId is only an artifact-naming token.
    // One timestamp per window keeps all tables of a window coherent.
    val ts = clock()
    val spark = batch.sparkSession
    eventTime match {
      case Some(w) => eventTimeBatch(spark, batch, windowId, w, ts)
      case None =>
        val tables = WalDecoder.decodeTables(spark, batch, schemas, replayActions,
          strict = strictSchema, driftMode = driftMode,
          numericAsDecimal = numericAsDecimal)
        tables.toSeq.sortBy(_._1).flatMap { case (table, df) =>
          publish(spark, table, df, windowId, ts)
        }
    }
  }

  /** Event-time micro-batch step: decode with the per-record wal
    * timestamp, drop records whose window already closed (older than
    * the stored watermark), append the rest into their pending window
    * directories (one overwrite-idempotent sub-dir per batch), advance
    * the watermark, and finalize every window it passed. */
  private def eventTimeBatch(spark: SparkSession, batch: DataFrame,
                             batchId: Long, w: EventTimeWindows,
                             ts: Long): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    val pendingRoot = Paths.get(stagingDir, "pending")
    val wmFile = Paths.get(stagingDir, "_watermark")
    val priorWm =
      if (Files.exists(wmFile)) Files.readString(wmFile).trim.toLong
      else Long.MinValue
    // ONE narrow records-level pass for the watermark input (action +
    // timestamp only — no per-table pivot, no per-table agg jobs), then
    // one full decode per table for the pending writes. The previous
    // shape ran a per-table max() agg over the fully-decoded batch —
    // 2T full parses of the batch where T+1 (one narrow) suffice.
    val maxSeen = WalDecoder.maxEventTime(spark, batch,
        schemas.map(_.table), replayActions)
      .getOrElse(Long.MinValue)
    val tables = WalDecoder.decodeTablesWithTs(spark, batch, schemas,
      replayActions, strict = strictSchema, driftMode = driftMode,
      numericAsDecimal = numericAsDecimal)
    tables.toSeq.sortBy(_._1).foreach { case (table, df0) =>
      // keep records whose window is still open; a NULL/unparseable
      // timestamp is droppable-late by contract (never fails the stream)
      val live = df0
        .withColumn("__wstart",
          (floor(col("__graft_ts").cast("long") / w.windowSeconds) *
            w.windowSeconds).cast("long"))
        .where(col("__wstart").isNotNull &&
          col("__wstart") + w.windowSeconds > priorWm)
        .drop("__graft_ts")
      // one job writes every window's slice of this batch; replay of the
      // same batchId overwrites its own sub-dir — idempotent
      live.write.mode("overwrite").partitionBy("__wstart")
        .parquet(pendingRoot.resolve(table).resolve(f"batch-$batchId%012d").toString)
    }
    val newWm =
      if (maxSeen == Long.MinValue) priorWm
      else math.max(priorWm, maxSeen - w.latenessSeconds)
    // finalize windows that closed THIS batch — (priorWm, newWm] only,
    // and DELETE NOTHING yet: pending slices must outlive both the
    // publish and the watermark commit below, or a failure between them
    // (transient store error on a later window, crash before the move)
    // would leave the replayed finalize only a PARTIAL slice set and
    // silently publish a window missing rows. Windows already closed vs
    // priorWm are NEVER (re)published: the watermark is the commit
    // point, so a window closed under the DURABLE priorWm has certainly
    // published — any slices it still owns are leftovers of a cleanup
    // that crashed after a prior commit (their batch's own overwrite on
    // replay may have erased one slice, so republishing from what
    // remains would upload a PARTIAL artifact under a new cid). They
    // are reclaimed below, after this batch's own commit point.
    val out = schemas.map(_.table).sorted.flatMap { table =>
      val tdir = pendingRoot.resolve(table)
      if (!Files.exists(tdir)) Nil
      else {
        val batchDirs = FsUtil.listDir(tdir)
          .filter(_.getFileName.toString.startsWith("batch-"))
        val wstarts = batchDirs
          .flatMap(b => FsUtil.listDir(b)
            .map(_.getFileName.toString)
            .filter(_.startsWith("__wstart="))
            .map(_.stripPrefix("__wstart=").toLong))
          .distinct.sorted
        wstarts.filter(ws => ws + w.windowSeconds <= newWm &&
            ws + w.windowSeconds > priorWm).flatMap { ws =>
          val slices = batchDirs.map(_.resolve(s"__wstart=$ws"))
            .filter(Files.exists(_))
          val df = spark.read.parquet(slices.map(_.toString): _*)
          publish(spark, table, df, ws, ts)
        }
      }
    }
    // COMMIT POINT: the watermark move. A crash anywhere above replays
    // the whole batch against intact slices — every re-publish sees the
    // FULL slice set, so the content-addressed put re-produces the same
    // cid (the reference's UploadAll at-least-once shape).
    val tmp = Paths.get(stagingDir, "_watermark.tmp")
    Files.createDirectories(tmp.getParent)
    Files.writeString(tmp, newWm.toString)
    Files.move(tmp, wmFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // cleanup strictly after the commit point, by PREDICATE rather than
    // a published-this-call list: reclaim every slice whose window is
    // closed vs the committed watermark — the ones just published AND
    // any orphans of a cleanup that crashed after an earlier commit.
    // A crash inside THIS cleanup just leaves more such orphans for the
    // next batch; nothing is ever republished from them.
    schemas.map(t => pendingRoot.resolve(t.table)).filter(Files.exists(_))
      .foreach { tdir =>
        val batchDirs = FsUtil.listDir(tdir)
          .filter(_.getFileName.toString.startsWith("batch-"))
        batchDirs.foreach { b =>
          FsUtil.listDir(b)
            .filter { p =>
              val n = p.getFileName.toString
              n.startsWith("__wstart=") &&
                n.stripPrefix("__wstart=").toLong + w.windowSeconds <= newWm
            }
            .foreach(FsUtil.deleteRecursive(_))
        }
        // P10 analog: a batch sub-dir with no window slices left (all
        // finalized, or its every record was dropped as late) holds only
        // markers — drop it so pending state stays O(open windows)
        batchDirs
          .filter(b => Files.exists(b) &&
            !FsUtil.listDir(b).exists(_.getFileName.toString.startsWith("__wstart=")))
          .foreach(FsUtil.deleteRecursive(_))
      }
    out
  }

  /** Stage → (optionally) single-file → sign → content-store put →
    * event-log append for one table's window slice. `windowToken` is the
    * artifact-naming token: the micro-batch id in processing-time mode,
    * the window start (epoch seconds) in event-time mode. */
  private def publish(spark: SparkSession, table: String, df: DataFrame,
                      windowToken: Long, ts: Long): Option[(String, String)] = {
    val pk = schemas.find(_.table == table).toSeq
      .flatMap(_.columns.filter(_.isPrimary).map(_.name))
    // sort by PK within each output file: parquet row-group min/max
    // stats become selective, so PK-ranged reads of the artifact
    // prune row groups instead of scanning the window (sort applied
    // AFTER the single-file coalesce so that file is globally sorted)
    def pkSorted(d: DataFrame): DataFrame = pk match {
      case Nil => d
      case cols => d.sortWithinPartitions(cols.map(org.apache.spark.sql.functions.col): _*)
    }
    val out = if (singleFile) pkSorted(df.coalesce(1)) else pkSorted(df)
    val stagePath = Paths.get(stagingDir, s"$table-$windowToken")
    out.write.mode("overwrite").parquet(stagePath.toString)
    // P6: skip empty windows — cheap check on the written files
    val parts = FsUtil.listDir(stagePath).filter(_.toString.endsWith(".parquet"))
    val hasRows = parts.nonEmpty && spark.read.parquet(stagePath.toString).head(1).nonEmpty
    if (!hasRows) { FsUtil.deleteRecursive(stagePath); None }
    else {
      // singleFile: one `<table>-<window>.parquet` like the reference;
      // scale mode: upload the whole window DIRECTORY (all part files)
      val artifact =
        if (singleFile) singleParquetFile(stagePath, table, windowToken)
        else {
          val dir = stagePath.resolveSibling(s"$table-$windowToken")
          // strip _SUCCESS/. markers; keep only data files
          FsUtil.listDir(stagePath)
            .filter(p => !p.getFileName.toString.endsWith(".parquet"))
            .foreach(p => Files.deleteIfExists(p))
          Files.move(stagePath, dir, StandardCopyOption.REPLACE_EXISTING)
          dir
        }
      val sig = signer.map(_.sign(artifact)).getOrElse(Array.emptyByteArray)
      val vault = VaultName(namespace, table)
      // row-content ECMH digest recorded with the event: a retriever
      // can re-derive it from the downloaded parquet and compare —
      // content verification independent of the transport (the
      // reference's stated purpose for pkg/ecmh). Order-independent,
      // so it survives any row layout the reader produces.
      val digest = schemas.find(_.table == table).map { sch =>
        graft.crypto.EcmhAggregator.rowDigest(
          spark.read.parquet(artifact.toString), sch.columns.map(_.name))
      }.getOrElse("")
      val cid = store.put(vault, artifact, ts, sig)
      // ifAbsent + window token: a crash-replayed window (at-least-once
      // foreachBatch / event-time republish) re-derives the same content
      // cid for the SAME window — that append must not double the
      // listing row (advisor r12). A LATER window that legitimately
      // emits byte-identical content is a distinct (cid, window) and
      // appends normally with its own timestamp/expiry (advisor r13).
      // Deliberate re-uploads go through BatchWrite, which keeps the
      // append-always listing semantic.
      catalog.foreach(c => c.appendEvent(vault, cid, ts,
        isArchived = false, c.cacheExpiryFor(vault, ts), digest,
        ifAbsent = true, window = windowToken))
      FsUtil.deleteRecursive(stagePath)
      Some(table -> cid)
    }
  }

  private def singleParquetFile(dir: Path, table: String, windowId: Long): Path = {
    val part = FsUtil.listDir(dir).find(_.toString.endsWith(".parquet")).get
    val named = dir.resolveSibling(s"$table-$windowId.parquet")
    Files.move(part, named, StandardCopyOption.REPLACE_EXISTING)
    named
  }
}
