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

  private val numericParams = """(?i)numeric\s*\(\s*(\d+)\s*(?:,\s*(-?\d+)\s*)?\)""".r.unanchored

  /**
   * `numericAsDecimal` mode: the exact Spark type for a raw `numeric`
   * declaration. `numeric(p,s)` → `DecimalType(p,s)` (`numeric(p)` has
   * scale 0, per PG); an UNCONSTRAINED `numeric` → `DecimalType(38,18)`,
   * the same convention Spark's own JDBC source applies to dimensionless
   * decimals. Declarations Spark cannot hold exactly — precision > 38 or
   * a negative scale (PG ≥ 12 allows both) — FAIL LOUDLY here rather
   * than silently truncate; those columns need the default lossy-double
   * mode or an upstream cast.
   *
   * DECODE-TIME limitation of the unconstrained-`numeric` convention:
   * the (38,18) mapping is enforced only here, at type-resolution time.
   * A column declared plain `numeric` may legally carry values the
   * resolved type cannot hold — more than 20 integer digits casts to
   * NULL silently in non-ANSI mode, and more than 18 fractional digits
   * silently rounds (Spark CAST semantics). The fail-loud promise is
   * therefore complete only for CONSTRAINED `numeric(p,s)` declarations,
   * where PG itself guarantees every value fits the declared type;
   * unconstrained money-class columns should be declared with explicit
   * precision upstream (or use the default lossy-double mode knowingly).
   */
  private def decimalOf(rawType: String): DecimalType = rawType match {
    case numericParams(p, s) =>
      val pi = p.toInt
      val si = Option(s).map(_.toInt).getOrElse(0)
      if (pi > DecimalType.MAX_PRECISION || si < 0 || si > pi)
        throw new UnsupportedPgTypeException(
          s"$rawType (pgNumericAsDecimal: Spark DecimalType holds at most " +
            s"precision ${DecimalType.MAX_PRECISION} and no negative scale)")
      DecimalType(pi, si)
    case _ => DecimalType(38, 18)
  }

  /**
   * Resolve a (normalized or raw) PG type name to a PgType.
   * Array types arrive either as `T[]` (wal2json) or `ARRAY`-element style.
   *
   * `numericAsDecimal = false` (default) maps `numeric` to DOUBLE — the
   * reference's deliberate lossiness (`type_converter.go:232`, SURVEY
   * §1.3 divergence #3). `true` is the exactness opt-in for money-class
   * columns: `numeric(p,s)` resolves to `DecimalType(p,s)` (precision
   * read from the RAW type text, so pass the unnormalized declaration —
   * [[graft.cdc.PgIntrospection]] preserves it).
   */
  def of(pgType: String): PgType = of(pgType, numericAsDecimal = false)

  def of(pgType: String, numericAsDecimal: Boolean): PgType = {
    val n = normalize(pgType)
    def scalar(normName: String, rawName: String): Option[PgScalar] =
      if (numericAsDecimal && normName == "numeric")
        Some(PgScalar(normName, decimalOf(rawName)))
      else scalars.get(normName).map(PgScalar(normName, _))
    if (n.endsWith("[]")) {
      val elemName = n.dropRight(2).trim
      val rawElem = pgType.trim.stripSuffix("[]").trim
      scalar(elemName, rawElem) match {
        case Some(ps) => PgArray(ps)
        case None     => throw new UnsupportedPgTypeException(pgType)
      }
    } else {
      scalar(n, pgType) match {
        case Some(ps) => ps
        case None     => throw new UnsupportedPgTypeException(pgType)
      }
    }
  }

  def isSupported(pgType: String): Boolean =
    try { of(pgType); true }
    catch { case _: UnsupportedPgTypeException => false }
}
