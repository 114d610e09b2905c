package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema drift on the CDC feed: the source database adds or reorders
  * columns mid-stream (ALTER TABLE during replication). The decode path
  * must keep working on the declared schema — unknown feed columns are
  * ignored until the schema is updated, records predating an added
  * column decode it as NULL, and column ORDER in the wal2json payload
  * never matters (values are matched by name, not position). */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  private val schemaV1 = TableSchema("t", Seq(
    TableColumn("id", "integer", nullable = false, isPrimary = true),
    TableColumn("name", "text", nullable = true, isPrimary = false)))
  private val schemaV2 = TableSchema("t", Seq(
    TableColumn("id", "integer", nullable = false, isPrimary = true),
    TableColumn("name", "text", nullable = true, isPrimary = false),
    TableColumn("score", "double precision", nullable = true, isPrimary = false)))

  private def rec(lsn: Long, cols: String): String =
    s"""{"commit_lsn": $lsn, "records": [{"action": "I", "xid": 1,
       |"lsn": "0/$lsn", "nextlsn": "", "timestamp": "t", "schema": "public",
       |"table": "t", "columns": [$cols], "pk": []}]}"""
      .stripMargin.replace("\n", " ")

  private def c(name: String, typ: String, v: String) =
    s"""{"name": "$name", "type": "$typ", "value": $v}"""

  test("feed gains a column the declared schema doesn't know: ignored") {
    val lines = Seq(
      rec(1, Seq(c("id", "integer", "1"), c("name", "text", "\"a\"")).mkString(",")),
      // upstream ALTER TABLE added 'score'; we still decode on schema v1
      rec(2, Seq(c("id", "integer", "2"), c("name", "text", "\"b\""),
        c("score", "double precision", "9.5")).mkString(","))
    ).toDF("value")
    val out = WalDecoder.decodeTables(spark, lines, Seq(schemaV1))("t")
      .orderBy("id").collect()
    assert(out.map(_.getAs[Int]("id")).toSeq == Seq(1, 2))
    assert(out.map(_.getAs[String]("name")).toSeq == Seq("a", "b"))
    assert(!out.head.schema.fieldNames.contains("score"))
  }

  test("schema gains a column older records don't carry: NULL backfill") {
    val lines = Seq(
      rec(1, Seq(c("id", "integer", "1"), c("name", "text", "\"a\"")).mkString(",")),
      rec(2, Seq(c("id", "integer", "2"), c("name", "text", "\"b\""),
        c("score", "double precision", "9.5")).mkString(","))
    ).toDF("value")
    val out = WalDecoder.decodeTables(spark, lines, Seq(schemaV2))("t")
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(out(0).fieldIndex("score")), "pre-ALTER record → NULL")
    assert(out(1).getAs[Double]("score") == 9.5)
  }

  test("wal2json column order is irrelevant: values matched by name") {
    val lines = Seq(
      rec(1, Seq(c("name", "text", "\"a\""), c("id", "integer", "1")).mkString(",")),
      rec(2, Seq(c("id", "integer", "2"), c("name", "text", "\"b\"")).mkString(","))
    ).toDF("value")
    val out = WalDecoder.decodeTables(spark, lines, Seq(schemaV1))("t")
      .orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("name")))
    assert(out.toSeq == Seq(1 -> "a", 2 -> "b"))
  }

  test("CDC merge stays correct across a schema-widening boundary") {
    // insert under v1, update under v2 (new column appears) — the merge
    // on the v2 schema yields the latest image with the new value, and
    // keys never touched after the ALTER carry NULL
    def mrec(lsn: Long, action: String, cols: String): String =
      s"""{"commit_lsn": $lsn, "records": [{"action": "$action", "xid": 1,
         |"lsn": "0/$lsn", "nextlsn": "", "timestamp": "t", "schema": "public",
         |"table": "t", "columns": [$cols], "pk": []}]}"""
        .stripMargin.replace("\n", " ")
    val lines = Seq(
      mrec(1, "I", Seq(c("id", "integer", "1"), c("name", "text", "\"a\"")).mkString(",")),
      mrec(2, "I", Seq(c("id", "integer", "2"), c("name", "text", "\"b\"")).mkString(",")),
      mrec(3, "U", Seq(c("id", "integer", "1"), c("name", "text", "\"a2\""),
        c("score", "double precision", "7.0")).mkString(","))
    ).toDF("value")
    val state = CdcMerge.latestState(lines, schemaV2).orderBy("id").collect()
    assert(state.length == 2)
    assert(state(0).getAs[String]("name") == "a2")
    assert(state(0).getAs[Double]("score") == 7.0)
    assert(state(1).isNullAt(state(1).fieldIndex("score")))
  }
}
