package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CDC merge/upsert materialization: collapse an I/U/D change stream to
 * the LATEST live row per primary key.
 *
 * The reference replays every record as an append (`internal/app/db.go:
 * 254-289`) and documents updates/deletes as unsupported
 * (`/root/reference/README.md:146`); consumers wanting current state must
 * post-process the appended images. This operator IS that post-process,
 * Spark-native: one hash aggregation keyed on the primary key taking
 * `max_by(row, (commit_lsn, record_idx))` — WAL commit order — then
 * dropping keys whose final image is a DELETE.
 *
 * Scale shape: a single shuffle on the PK (map-side partial max_by
 * applies), no window sort, no join; state per key is one row regardless
 * of change-stream depth. The same plan works incrementally in
 * `foreachBatch` against a keyed sink.
 */
object CdcMerge {

  /**
   * Latest-state table from raw wal2json tx lines for one table schema.
   * Ordering key is (commit_lsn, record_idx): commit order between
   * transactions, wire order within one.
   */
  def latestState(lines: DataFrame, schema: TableSchema): DataFrame = {
    val pk = schema.columns.filter(_.isPrimary).map(_.name)
    require(pk.nonEmpty, s"table ${schema.table} has no primary key — cannot merge")
    val records = WalDecoder.decodeRecords(
        lines, recordFields = Some(Seq("action", "table", "columns")))
      .where(col("table") === schema.table &&
        col("action").isin("I", "U", "D"))
    val typed = PgValueDecoder.pivotToTable(records, schema,
      keepCols = Seq("action", "commit_lsn", "record_idx"))
    val dataCols = Seq("action") ++ schema.columns.map(_.name)
    typed
      .groupBy(pk.map(col): _*)
      .agg(max_by(
        struct(dataCols.map(col): _*),
        struct(col("commit_lsn"), col("record_idx"))).as("r"))
      .where(col("r.action") =!= "D")
      .select(schema.columns.map(c => col(s"r.${c.name}").as(c.name)): _*)
  }
}
