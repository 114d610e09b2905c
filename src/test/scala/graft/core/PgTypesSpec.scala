package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Type-universe spec mirroring the reference's supported map
  * (`internal/app/type_converter.go:221-286`) and negative fixtures
  * (`internal/app/db_test.go:128-154`). */
class PgTypesSpec extends AnyFunSuite {

  test("scalar mappings (SURVEY §1.3)") {
    assert(PgTypes.of("boolean").sparkType == BooleanType)
    assert(PgTypes.of("smallint").sparkType == ShortType)
    assert(PgTypes.of("integer").sparkType == IntegerType)
    assert(PgTypes.of("bigint").sparkType == LongType)
    assert(PgTypes.of("real").sparkType == FloatType)
    assert(PgTypes.of("double precision").sparkType == DoubleType)
    assert(PgTypes.of("numeric").sparkType == DoubleType)   // deliberately lossy, like ref
    assert(PgTypes.of("oid").sparkType == LongType)         // unsigned → widened
    assert(PgTypes.of("macaddr").sparkType == StringType)
    assert(PgTypes.of("bytea").sparkType == BinaryType)
    assert(PgTypes.of("\"char\"").sparkType == StringType)
    assert(PgTypes.of("character").sparkType == StringType)
    assert(PgTypes.of("character varying").sparkType == StringType)
    assert(PgTypes.of("bpchar").sparkType == StringType)
    assert(PgTypes.of("text").sparkType == StringType)
    assert(PgTypes.of("json").sparkType == StringType)
    assert(PgTypes.of("jsonb").sparkType == StringType)
    assert(PgTypes.of("uuid").sparkType == StringType)
    assert(PgTypes.of("date").sparkType == DateType)
    assert(PgTypes.of("time without time zone").sparkType == StringType)
    assert(PgTypes.of("time with time zone").sparkType == StringType)
    assert(PgTypes.of("timestamp without time zone").sparkType == TimestampNTZType)
    assert(PgTypes.of("timestamp with time zone").sparkType == TimestampType)
    assert(PgTypes.of("interval").sparkType == StringType)
  }

  test("parametrized normalization: character varying(5) → character varying") {
    assert(PgTypes.normalize("character varying(5)") == "character varying")
    assert(PgTypes.normalize("numeric(4,7)") == "numeric")
    assert(PgTypes.of("numeric(4,7)").sparkType == DoubleType)
  }

  test("array mappings") {
    assert(PgTypes.of("integer[]").sparkType == ArrayType(IntegerType))
    assert(PgTypes.of("boolean[]").sparkType == ArrayType(BooleanType))
    assert(PgTypes.of("bytea[]").sparkType == ArrayType(BinaryType))
    assert(PgTypes.of("text[]").sparkType == ArrayType(StringType))
    assert(PgTypes.of("timestamp with time zone[]").sparkType == ArrayType(TimestampType))
  }

  test("unsupported types error like the reference (db.go:353-357)") {
    val e1 = intercept[UnsupportedPgTypeException](PgTypes.of("USER-DEFINED"))
    assert(e1.getMessage.contains("unsupported type"))
    intercept[UnsupportedPgTypeException](PgTypes.of("enum_type_foo[]"))
    assert(!PgTypes.isSupported("point"))
  }
}
