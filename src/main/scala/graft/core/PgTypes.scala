package graft.core

import org.apache.spark.sql.types._

/**
 * Postgres → Spark type mapping for the CDC decode path.
 *
 * Mirrors the supported-type universe of the reference's
 * `internal/app/type_converter.go:221-286` (PG type → DuckDB type), mapped
 * to Spark `DataType`s per SURVEY.md §1.3. Parametrized types are
 * normalized by stripping `(N[,M])` (reference: `internal/app/db.go:341-359`).
 * Unsupported types (enums, composites, multi-dim arrays) raise
 * `UnsupportedPgTypeException` (reference: `internal/app/db.go:353-357`).
 */
sealed trait PgType {
  def pgName: String
  def sparkType: DataType
}

final case class PgScalar(pgName: String, sparkType: DataType) extends PgType
final case class PgArray(element: PgScalar) extends PgType {
  def pgName: String = element.pgName + "[]"
  def sparkType: DataType = ArrayType(element.sparkType, containsNull = true)
}

final class UnsupportedPgTypeException(typ: String)
    extends IllegalArgumentException(s"unsupported type: $typ")

object PgTypes {
  // Scalar universe — one entry per row of the SURVEY §1.3 table.
  // `numeric` is deliberately lossy (double, not decimal) to match the
  // reference (`type_converter.go:232`); `oid` widens to long (no unsigned).
  private val scalars: Map[String, DataType] = Map(
    "boolean" -> BooleanType,
    "smallint" -> ShortType,
    "integer" -> IntegerType,
    "bigint" -> LongType,
    "real" -> FloatType,
    "double precision" -> DoubleType,
    "numeric" -> DoubleType,
    "oid" -> LongType,
    "macaddr" -> StringType,
    "bytea" -> BinaryType,
    "\"char\"" -> StringType,
    "character" -> StringType,
    "character varying" -> StringType,
    "bpchar" -> StringType,
    "text" -> StringType,
    "json" -> StringType,
    "jsonb" -> StringType,
    "uuid" -> StringType,
    "date" -> DateType,
    "time without time zone" -> StringType,
    "time with time zone" -> StringType,
    "timestamp without time zone" -> TimestampNTZType,
    "timestamp with time zone" -> TimestampType,
    "interval" -> StringType
  )

  /** `character varying(5)` → `character varying`; `numeric(4,7)` → `numeric`. */
  def normalize(pgType: String): String =
    pgType.trim.replaceAll("\\(\\s*\\d+\\s*(,\\s*\\d+\\s*)?\\)", "").trim

  /**
   * Resolve a (normalized or raw) PG type name to a PgType.
   * Array types arrive either as `T[]` (wal2json) or `ARRAY`-element style.
   */
  def of(pgType: String): PgType = {
    val n = normalize(pgType)
    if (n.endsWith("[]")) {
      val elemName = n.dropRight(2).trim
      scalars.get(elemName) match {
        case Some(dt) => PgArray(PgScalar(elemName, dt))
        case None     => throw new UnsupportedPgTypeException(pgType)
      }
    } else {
      scalars.get(n) match {
        case Some(dt) => PgScalar(n, dt)
        case None     => throw new UnsupportedPgTypeException(pgType)
      }
    }
  }

  def isSupported(pgType: String): Boolean =
    try { of(pgType); true }
    catch { case _: UnsupportedPgTypeException => false }
}
