package graft.cdc

import org.apache.spark.sql.types._

/**
 * wal2json format-version-2 transaction envelope.
 *
 * Mirrors the reference's `pkg/pgrepl/tx.go:9-39`: a `Tx` is a commit LSN
 * plus ordered row-change `Record`s; each record carries action
 * ("I"/"U"/"D"; "B"/"C" markers are consumed by the source), xid, lsn,
 * timestamp, schema/table, columns (name/type/raw-JSON value) and pk list.
 *
 * `Column.value` is kept as the raw JSON token text (the reference keeps it
 * as `json.RawMessage`); typed decoding happens later per the table schema
 * (see [[PgValueDecoder]]).
 *
 * `identity` is wal2json format-2's old-key field: U and D records carry
 * the replica-identity (old) key values there, NOT in `columns` — a
 * DELETE's `columns` is absent entirely. The reference never reads it
 * (`pkg/pgrepl/tx.go:15-26` has no identity field — its replay is
 * append-only so D rows are degenerate), but [[CdcMerge]] needs the old
 * key to remove the live row, so we model it.
 */
object WalModel {
  final case class PgColumn(name: String, `type`: String, value: String)
  final case class PrimaryKey(name: String, `type`: String)
  final case class Record(
      action: String,
      xid: Long,
      lsn: String,
      nextlsn: String,
      timestamp: String,
      schema: String,
      table: String,
      columns: Seq[PgColumn],
      identity: Seq[PgColumn],
      pk: Seq[PrimaryKey])
  final case class Tx(commit_lsn: Long, records: Seq[Record])

  val columnSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("type", StringType),
    StructField("value", StringType) // raw JSON token preserved as text
  ))

  val pkSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("type", StringType)
  ))

  val recordSchema: StructType = StructType(Seq(
    StructField("action", StringType),
    StructField("xid", LongType),
    StructField("lsn", StringType),
    StructField("nextlsn", StringType),
    StructField("timestamp", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("columns", ArrayType(columnSchema)),
    StructField("identity", ArrayType(columnSchema)),
    StructField("pk", ArrayType(pkSchema))
  ))

  /** One JSON line = one transaction (`internal/app/testdata/wal.input`). */
  val txSchema: StructType = StructType(Seq(
    StructField("commit_lsn", LongType),
    StructField("records", ArrayType(recordSchema))
  ))

  /** Projected tx schema: only the named record fields are materialized
    * by the JSON parser (cheaper decode on the hot path — Jackson still
    * tokenizes skipped fields but never allocates them). */
  def txSchemaProjected(recordFields: Seq[String]): StructType = {
    val fields = recordSchema.fields.filter(f => recordFields.contains(f.name))
    StructType(Seq(
      StructField("commit_lsn", LongType),
      StructField("records", ArrayType(StructType(fields)))))
  }
}

/**
 * Per-table schema captured once at stream start
 * (reference `internal/app/db.go:48-52`, `cmd/vaults/commands.go:851-921`).
 * Primary-key membership is recorded in field metadata — Spark does not
 * enforce PKs, and none is needed for an append-only stream.
 */
final case class TableColumn(name: String, pgType: String, nullable: Boolean, isPrimary: Boolean)

/** How strictly [[PgValueDecoder.schemaDriftGuard]] compares a record's
  * column list to the stream-start schema. `Exact` (streaming default)
  * requires full (name, type) equality — catches every DDL including a
  * trailing-column DROP. `Prefix` (the explicit recovery flag, and the
  * batch-replay default) additionally passes records that are proper
  * schema prefixes, which is what pre-`ADD COLUMN` spool history looks
  * like when replayed under a refreshed (widened) schema. */
sealed trait DriftMode
object DriftMode {
  case object Exact extends DriftMode
  case object Prefix extends DriftMode
}

object TableSchema {
  /**
   * Compact CLI schema spec: tables separated by `;`, each
   * `name|col:pgtype[:pk],col:pgtype...` — e.g.
   * `t|id:integer:pk,name:text;u|k:bigint:pk`. PK columns are non-null
   * (mirrors the reference's information_schema capture).
   */
  def parseSpec(spec: String): Seq[TableSchema] =
    spec.split(';').toSeq.filter(_.nonEmpty).map { tspec =>
      tspec.split('|') match {
        case Array(name, colSpec) =>
          val cols = colSpec.split(',').toSeq.map { c =>
            c.split(':') match {
              case Array(cn, ct) => TableColumn(cn, ct, nullable = true, isPrimary = false)
              case Array(cn, ct, "pk") => TableColumn(cn, ct, nullable = false, isPrimary = true)
              case _ => throw new IllegalArgumentException(s"bad column spec: $c")
            }
          }
          TableSchema(name, cols)
        case _ => throw new IllegalArgumentException(s"bad table spec: $tspec")
      }
    }
}

final case class TableSchema(table: String, columns: Seq[TableColumn]) {
  import graft.core.PgTypes

  def toStructType: StructType = toStructType(numericAsDecimal = false)

  /** `numericAsDecimal` (pgNumericAsDecimal): map `numeric(p,s)` columns
    * to exact `DecimalType(p,s)` instead of the reference's lossy double
    * (SURVEY §1.3 divergence #3 opt-in; [[graft.core.PgTypes.of]]). */
  def toStructType(numericAsDecimal: Boolean): StructType = StructType(columns.map { c =>
    val md = new MetadataBuilder()
      .putString("pgType", PgTypes.normalize(c.pgType))
      .putBoolean("isPrimary", c.isPrimary)
      .build()
    StructField(c.name, PgTypes.of(c.pgType, numericAsDecimal).sparkType, c.nullable, md)
  })

  /** Fails fast on unsupported types, like the reference's DDL generation. */
  def validate(): Unit = columns.foreach(c => PgTypes.of(c.pgType))
}
