package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Decodes a stream/batch of wal2json transaction lines into row-change
 * records and typed per-table DataFrames.
 *
 * Spark-native equivalent of the reference's replication consume + replay
 * path (`pkg/pgrepl/replicator.go:235-284` decode,
 * `internal/app/db.go:254-289` replay): instead of generating SQL INSERT
 * text per record, the whole decode is one declarative plan —
 * `from_json` → `explode(records)` → action filter → typed pivot — which
 * Catalyst pipelines and whole-stage-codegens. No shuffle anywhere: the
 * plan is narrow from text line to typed row.
 */
object WalDecoder {

  /** Raw text lines (one JSON tx per line) → one row per WAL record.
    * `recordFields = Some(...)` projects the parse schema to just those
    * record fields (cheaper JSON decode on the replay hot path). */
  def decodeRecords(lines: DataFrame,
                    recordFields: Option[Seq[String]] = None): DataFrame = {
    val valueCol = lines.columns.headOption.getOrElse("value")
    val schema = recordFields.fold(WalModel.txSchema)(WalModel.txSchemaProjected)
    lines
      .select(from_json(col(valueCol), schema).as("tx"))
      .where(col("tx").isNotNull && col("tx.records").isNotNull)
      .select(col("tx.commit_lsn").as("commit_lsn"),
              posexplode(col("tx.records")).as(Seq("record_idx", "r")))
      .select(col("commit_lsn"), col("record_idx"), col("r.*"))
  }

  /**
   * The documented append-only contract: only INSERT images are replayed
   * (`/root/reference/README.md:146`). The reference *code* actually
   * re-appends U and D images too (SURVEY §2.12); set
   * `replayActions = Set("I","U","D")` to reproduce that behavior for
   * differential testing.
   */
  def filterActions(records: DataFrame, replayActions: Set[String] = Set("I")): DataFrame =
    records.where(col("action").isin(replayActions.toSeq: _*))

  /**
   * Text-level pre-filter pushed BELOW the JSON parse: a tx line whose
   * raw text lacks every `"action":"X"` marker for the replayed actions
   * cannot contain a replayed record, so it never pays the Jackson
   * decode. Conservative (superset) — a value field that happens to
   * contain the marker just passes through to the exact post-parse
   * filter. With the append-only contract (I only) this skips ~all
   * U/D-only transactions at the scan, the dominant cost of the decode
   * path. Both wal2json spacings (`"action": "I"` / `"action":"I"`)
   * are matched.
   */
  def actionPrefilter(lines: DataFrame, replayActions: Set[String]): DataFrame = {
    val valueCol = lines.columns.headOption.getOrElse("value")
    val anyMarker = replayActions.toSeq.sorted.flatMap { a =>
      Seq(col(valueCol).contains(s""""action":"$a""""),
          col(valueCol).contains(s""""action": "$a""""))
    }.reduce(_ || _)
    lines.where(anyMarker)
  }

  /** Full batch decode: lines → Map(table → typed DataFrame). */
  def decodeTables(
      spark: SparkSession,
      lines: DataFrame,
      schemas: Seq[TableSchema],
      replayActions: Set[String] = Set("I")): Map[String, DataFrame] = {
    // replay needs only routing + payload fields; skip xid/lsn/pk/etc.
    val records = filterActions(
      decodeRecords(actionPrefilter(lines, replayActions),
        recordFields = Some(Seq("action", "table", "columns"))),
      replayActions)
    schemas.map { ts =>
      ts.table -> PgValueDecoder.pivotToTable(records.where(col("table") === ts.table), ts)
    }.toMap
  }
}
