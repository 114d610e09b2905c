package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.Encoders

/**
 * The mid-stream DDL contract (SURVEY §2 S7 seam): the source captures
 * schema once at stream start — reference `cmd/vaults/commands.go:214-217`
 * — and this engine's documented v1 behavior on live schema drift is FAIL
 * LOUD, never silent misdecode and never silent loss of a newly added
 * column. These specs pin the guard ([[PgValueDecoder.schemaDriftGuard]])
 * at the batch-decode and merge layers; the streaming end of the contract
 * is pinned in `StreamPipelineSpec` (drifted batch fails the query) and
 * LIVE in `LivePostgresSpec` (a real ALTER TABLE mid-stream).
 */
class SchemaDriftSpec extends SparkSpec {

  private val schemaT = TableSchema("t", Seq(
    TableColumn("id", "integer", nullable = false, isPrimary = true),
    TableColumn("name", "character varying", nullable = true, isPrimary = false)))

  private def line(columnsJson: String, action: String = "I",
                   identityJson: Option[String] = None): String = {
    val idf = identityJson.fold("")(j => s""", "identity": $j""")
    s"""{"commit_lsn": 1, "records": [{"action": "$action", "xid": 1,
       |"lsn": "0/1", "nextlsn": "", "timestamp": "2023-08-22 14:44:02.043586-03",
       |"schema": "public", "table": "t", "columns": $columnsJson$idf,
       |"pk": [{"name": "id", "type": "integer"}]}]}""".stripMargin.replace("\n", " ")
  }

  private def df(lines: String*) =
    spark.createDataset(lines)(Encoders.STRING).toDF("value")

  private val conforming =
    """[{"name": "id", "type": "integer", "value": 1},
      |{"name": "name", "type": "character varying(30)", "value": "a"}]"""
      .stripMargin.replace("\n", " ")
  private val added =
    """[{"name": "id", "type": "integer", "value": 2},
      |{"name": "name", "type": "character varying(30)", "value": "b"},
      |{"name": "extra", "type": "double precision", "value": 2.5}]"""
      .stripMargin.replace("\n", " ")

  private def driftError(body: => Unit): Throwable = {
    val e = intercept[Exception](body)
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("schema drift detected on table 't'"), msgs)
    assert(msgs.contains("extra double precision"), msgs) // names the new column
    assert(msgs.contains("restart the stream with a refreshed schema"), msgs)
    e
  }

  test("strict decode fails loudly on an added column; lenient projects silently") {
    val lines = df(line(conforming), line(added))
    driftError {
      WalDecoder.decodeTables(spark, lines, Seq(schemaT), strict = true)("t").collect()
    }
    // lenient (batch replay) behavior unchanged: both rows, no extra col
    val lenient = WalDecoder.decodeTables(spark, lines, Seq(schemaT))("t")
    assert(lenient.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("strict decode fails on renamed, retyped and non-prefix-dropped columns") {
    val renamed =
      """[{"name": "id", "type": "integer", "value": 4},
        |{"name": "label", "type": "character varying", "value": "x"}]"""
        .stripMargin.replace("\n", " ")
    val retyped =
      """[{"name": "id", "type": "integer", "value": 5},
        |{"name": "name", "type": "jsonb", "value": "{}"}]"""
        .stripMargin.replace("\n", " ")
    // a MIDDLE column missing (names no longer align positionally)
    val middleDropped = """[{"name": "name", "type": "character varying", "value": "x"}]"""
    for (cols <- Seq(renamed, retyped, middleDropped)) {
      val e = intercept[Exception](
        WalDecoder.decodeTables(spark, df(line(cols)), Seq(schemaT), strict = true)("t").collect())
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("schema drift detected on table 't'"), msgs)
    }
  }

  test("a schema-PREFIX record passes strict and decodes NULL tails (refresh-restart replay)") {
    // the shape pre-ALTER-ADD history has under the REFRESHED schema:
    // fewer columns, matching the schema's leading columns — must replay
    // losslessly or drift recovery would be impossible
    val prefix = """[{"name": "id", "type": "integer", "value": 7}]"""
    val out = WalDecoder.decodeTables(spark, df(line(prefix)),
      Seq(schemaT), strict = true)("t").collect()
    assert(out.length == 1 && out(0).getInt(0) == 7 && out(0).isNullAt(1))
  }

  test("EXACT mode closes the trailing-drop blind spot; Prefix documents it") {
    // post-`ALTER TABLE t DROP COLUMN name` records: a valid schema
    // PREFIX — the one DDL shape Prefix mode cannot distinguish from
    // recovery replay. Exact (the steady-state streaming default,
    // VaultSink/StreamPipeline) must abort on it.
    val trailingDropped = """[{"name": "id", "type": "integer", "value": 8}]"""
    val e = intercept[Exception](
      WalDecoder.decodeTables(spark, df(line(trailingDropped)), Seq(schemaT),
        strict = true, driftMode = DriftMode.Exact)("t").collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("schema drift detected on table 't'"), msgs)
    assert(msgs.contains("drift mode: Exact"), msgs)
    // the documented blind spot, pinned: the same record PASSES Prefix
    // (recovery-replay carve-out) and decodes a NULL tail
    val out = WalDecoder.decodeTables(spark, df(line(trailingDropped)),
      Seq(schemaT), strict = true, driftMode = DriftMode.Prefix)("t").collect()
    assert(out.length == 1 && out(0).getInt(0) == 8 && out(0).isNullAt(1))
    // Exact still accepts conforming records (with cosmetic typmods) and
    // real-shape DELETEs (identity only, no columns payload)
    val ok = WalDecoder.decodeTables(spark, df(line(conforming)),
      Seq(schemaT), strict = true, driftMode = DriftMode.Exact)("t").collect()
    assert(ok.length == 1 && ok(0).getInt(0) == 1)
    val del = line("null", action = "D",
      identityJson = Some("""[{"name": "id", "type": "integer", "value": 1}]"""))
    val state = CdcMerge.latestState(df(line(conforming), del), schemaT,
      strict = true, driftMode = DriftMode.Exact)
    assert(state.collect().isEmpty)
  }

  test("typmod differences are not drift; conforming records pass strict") {
    // record carries `character varying(30)`, schema `character varying`
    val out = WalDecoder.decodeTables(spark, df(line(conforming)),
      Seq(schemaT), strict = true)("t").collect()
    assert(out.length == 1 && out(0).getInt(0) == 1 && out(0).getString(1) == "a")
  }

  test("strict merge: real-shape DELETE (identity only, no columns) is not drift") {
    val ins = line(conforming)
    val del = line("null", action = "D",
      identityJson = Some("""[{"name": "id", "type": "integer", "value": 1}]"""))
    val state = CdcMerge.latestState(df(ins, del), schemaT, strict = true)
    assert(state.collect().isEmpty) // insert then delete -> no live rows
    // and a drifted INSERT in the same feed still raises through the merge
    driftError {
      CdcMerge.latestState(df(ins, del, line(added)), schemaT, strict = true).collect()
    }
  }

  test("strict decode is per-table: another table's drift does not fire t's guard") {
    val other =
      s"""{"commit_lsn": 2, "records": [{"action": "I", "xid": 1, "lsn": "0/2",
         |"nextlsn": "", "timestamp": "2023-08-22 14:44:02.043586-03",
         |"schema": "public", "table": "u", "columns":
         |[{"name": "k", "type": "integer", "value": 9},
         |{"name": "surprise", "type": "text", "value": "v"}],
         |"pk": [{"name": "k", "type": "integer"}]}]}""".stripMargin.replace("\n", " ")
    val out = WalDecoder.decodeTables(spark, df(line(conforming), other),
      Seq(schemaT), strict = true)("t").collect()
    assert(out.length == 1 && out(0).getInt(0) == 1)
  }
}
