package graft.engine

import graft.cdc.TableSchema
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * The streaming replication pipeline (S1/P1/P5): a Structured Streaming
 * query over wal2json JSON lines with the windowed [[VaultSink]].
 *
 * v1 source: file stream of WAL JSON lines (same envelope as the
 * reference's `internal/app/testdata/wal.input`); the real pg-protocol
 * `MicroBatchStream` slots in behind the same DataFrame shape (M5 in
 * SURVEY §7.2). Offsets are checkpointed — `commit()` after batch success
 * gives the reference's ack-after-replay exactly-once contract
 * (`internal/app/streamer.go:53-58`) with crash recovery subsuming its
 * `UploadAll` startup sweep (`internal/app/db.go:214-246`).
 *
 * `Trigger.ProcessingTime(windowSeconds)` makes micro-batch = upload
 * window, mirroring the reference's default 3600 s rotation ticker
 * (`cmd/vaults/config.go:16-18`); `Trigger.AvailableNow` gives
 * deterministic batch boundaries for tests (SURVEY §7.4 risk 3).
 */
object StreamPipeline {

  def start(
      spark: SparkSession,
      namespace: String,
      schemas: Seq[TableSchema],
      walInputDir: String,
      stagingDir: String,
      checkpointDir: String,
      store: ContentStore,
      signer: Option[FileSigner] = None,
      catalog: Option[graft.catalog.VaultCatalog] = None,
      windowSeconds: Long = 3600L,
      availableNow: Boolean = false,
      maxTxPerTrigger: Option[Int] = None,
      replayActions: Set[String] = Set("I"),
      singleFile: Boolean = true,
      sourceOptions: Map[String, String] = Map.empty,
      strictSchema: Boolean = true,
      // the explicit recovery flag: pass DriftMode.Prefix only while
      // replaying pre-ALTER spool history under a refreshed schema;
      // steady-state streams keep Exact (trailing-drop DDL also fails
      // loud — PgValueDecoder.schemaDriftGuard)
      driftMode: graft.cdc.DriftMode = graft.cdc.DriftMode.Exact,
      numericAsDecimal: Boolean = false,
      // event-time export windows (P5 semantic upgrade, see
      // [[EventTimeWindows]]); None keeps the reference-parity default
      // where micro-batch = upload window
      eventTime: Option[EventTimeWindows] = None): StreamingQuery = {

    schemas.foreach(_.validate())
    // custom CDC source (graft.cdc.source.WalSource): LSN offsets +
    // ack-on-commit, the S1-S5 semantics; yields (value, commit_lsn).
    // `sourceOptions` passes transport switches through (pgHost/pgPort/
    // publication select the pg-wire feed spooling into walInputDir).
    var reader = spark.readStream.format("graft-wal").option("path", walInputDir)
    sourceOptions.foreach { case (k, v) => reader = reader.option(k, v) }
    maxTxPerTrigger.foreach(n => reader = reader.option("maxTxPerTrigger", n.toString))
    val lines = reader.load()

    // singleFile=false is the 100 TB shape: a directory artifact per
    // window, no coalesce(1) serialization point
    val sink = new VaultSink(namespace, schemas, stagingDir, store, signer,
      catalog, replayActions, singleFile, strictSchema = strictSchema,
      driftMode = driftMode,
      numericAsDecimal = numericAsDecimal, eventTime = eventTime)
    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime(windowSeconds * 1000L)

    lines.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        sink.processBatch(batch, batchId): Unit
      }
      .start()
  }
}
