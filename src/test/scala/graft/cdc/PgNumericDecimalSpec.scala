package graft.cdc

import graft.SparkSpec
import graft.core.{PgArray, PgScalar, PgTypes, UnsupportedPgTypeException}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types._

/**
 * The `pgNumericAsDecimal` opt-in (SURVEY §1.3 divergence #3): by default
 * `numeric` maps to double to match the reference
 * (`internal/app/type_converter.go:232` — deliberately lossy); with the
 * option on, `numeric(p,s)` resolves to exact `DecimalType(p,s)`. A user
 * with money columns hits the double-rounding silently, so both modes are
 * pinned here and oracle-checked end-to-end (`q_cdc_numeric_decimal` /
 * `q_cdc_numeric_double`); the live walsender row is in
 * `LivePostgresSpec`'s type matrix.
 */
class PgNumericDecimalSpec extends SparkSpec {

  test("type resolution: numeric(p,s) -> DecimalType(p,s); unconstrained -> (38,18)") {
    assert(PgTypes.of("numeric(10,2)", numericAsDecimal = true) ==
      PgScalar("numeric", DecimalType(10, 2)))
    assert(PgTypes.of("numeric(7)", numericAsDecimal = true) ==
      PgScalar("numeric", DecimalType(7, 0))) // PG: omitted scale = 0
    assert(PgTypes.of("numeric", numericAsDecimal = true) ==
      PgScalar("numeric", DecimalType(38, 18))) // Spark JDBC convention
    assert(PgTypes.of("numeric(12,4)[]", numericAsDecimal = true) ==
      PgArray(PgScalar("numeric", DecimalType(12, 4))))
    // default mode unchanged: the reference's lossy double
    assert(PgTypes.of("numeric(10,2)") == PgScalar("numeric", DoubleType))
    // other types are unaffected by the flag
    assert(PgTypes.of("bigint", numericAsDecimal = true) ==
      PgScalar("bigint", LongType))
  }

  test("declarations Spark cannot hold exactly fail loudly, never truncate") {
    intercept[UnsupportedPgTypeException](
      PgTypes.of("numeric(40,2)", numericAsDecimal = true))
    intercept[UnsupportedPgTypeException](
      PgTypes.of("numeric(10,-2)", numericAsDecimal = true)) // PG>=12 negative scale
  }

  test("TableSchema.toStructType(numericAsDecimal = true) carries the decimal type") {
    val ts = TableSchema("t", Seq(
      TableColumn("id", "bigint", nullable = false, isPrimary = true),
      TableColumn("amount", "numeric(10,2)", nullable = true, isPrimary = false)))
    assert(ts.toStructType("amount").dataType == DoubleType)
    assert(ts.toStructType(numericAsDecimal = true)("amount").dataType ==
      DecimalType(10, 2))
  }

  test("decimal decode is exact where the default double decode measurably is not") {
    // 2^53 + 1 cents-bearing value: no double holds it
    val v = "9007199254740993.12"
    val line =
      s"""{"commit_lsn": 1, "records": [{"action": "I", "xid": 1, "lsn": "0/1",
         |"nextlsn": "", "timestamp": "2026-01-01 00:00:00.000000",
         |"schema": "public", "table": "t",
         |"columns": [{"name": "c", "type": "numeric(38,2)", "value": "$v"}],
         |"pk": [{"name": "c", "type": "numeric(38,2)"}]}]}"""
        .stripMargin.replace("\n", " ")
    val lines = spark.createDataset(Seq(line))(Encoders.STRING).toDF("value")
    val schema = TableSchema("t",
      Seq(TableColumn("c", "numeric(38,2)", nullable = true, isPrimary = false)))

    val dec = WalDecoder.decodeTables(spark, lines, Seq(schema),
      numericAsDecimal = true)("t")
    assert(dec.schema("c").dataType == DecimalType(38, 2))
    assert(dec.collect()(0).getDecimal(0) == new java.math.BigDecimal(v))

    val dbl = WalDecoder.decodeTables(spark, lines, Seq(schema))("t")
    assert(dbl.schema("c").dataType == DoubleType)
    val got = java.math.BigDecimal.valueOf(dbl.collect()(0).getDouble(0))
    assert(got.compareTo(new java.math.BigDecimal(v)) != 0,
      "double mode was expected to be lossy for a 17-sig-digit value")
  }

  test("streaming merge: numericAsDecimal reaches the materialized state exactly") {
    // the opt-in threaded through streamingLatestState (round 12): a
    // money column survives an I -> U change history with full precision
    val base = java.nio.file.Files.createTempDirectory("dec-stream").toString
    val wal = s"$base/wal"; val state = s"$base/state"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wal))
    val schema = TableSchema("m", Seq(
      TableColumn("id", "integer", nullable = false, isPrimary = true),
      TableColumn("amount", "numeric(38,2)", nullable = true, isPrimary = false)))
    def tx(lsn: Long, action: String, id: Int, amount: String): String =
      s"""{"commit_lsn": $lsn, "records": [{"action": "$action", "xid": $lsn,
         |"lsn": "0/$lsn", "nextlsn": "", "timestamp": "2026-01-01 00:00:00.000000",
         |"schema": "public", "table": "m",
         |"columns": [{"name": "id", "type": "integer", "value": $id},
         |{"name": "amount", "type": "numeric(38,2)", "value": "$amount"}],
         |"pk": [{"name": "id", "type": "integer"}]}]}"""
        .stripMargin.replace("\n", " ")
    val v1 = "9007199254740993.12" // > 2^53: no double holds it
    val v2 = "9007199254740993.57"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(wal, "a.json"),
      Seq(tx(1, "I", 1, v1), tx(2, "U", 1, v2)).mkString("\n"))
    CdcMerge.streamingLatestState(spark, wal, schema, state, ckpt,
      numericAsDecimal = true).awaitTermination(120000)
    val st = CdcMerge.readState(spark, state).get
    assert(st.schema("amount").dataType == DecimalType(38, 2))
    val rows = st.collect()
    assert(rows.length == 1 && rows(0).getAs[java.math.BigDecimal]("amount") ==
      new java.math.BigDecimal(v2))
  }
}
