package graft.cli

import graft.SparkSpec
import java.nio.file.Files

/** CLI entrypoint dispatch + full pipeline integration: stream → store →
  * events → retrieve → analyze. */
class MainSpec extends SparkSpec {

  test("arg dispatch and exit codes") {
    spark.sparkContext.setLogLevel("WARN") // activate shared session
    val root = Files.createTempDirectory("cli-main").toString
    assert(Main.run(Array.empty) == 2)                       // usage
    assert(Main.run(Array(root, "frobnicate")) == 2)         // unknown cmd
    assert(Main.run(Array(root, "retrieve", "nope")) == 1)   // not found
    val kf = s"$root/key.hex"
    assert(Main.run(Array(root, "account-create", kf)) == 0)
    assert(Main.run(Array(root, "account-address", kf)) == 0)
    assert(Main.run(Array(root, "create", "bad name", "0x0")) == 1) // invalid
    assert(Main.run(Array(root, "compact", "ns.empty")) == 1)       // nothing to compact
  }

  test("schema spec parser: valid forms and malformed specs rejected") {
    import graft.cdc.{TableColumn, TableSchema}
    val ts = TableSchema.parseSpec("t|id:integer:pk,name:text;u|k:bigint:pk")
    assert(ts.map(_.table) == Seq("t", "u"))
    assert(ts.head.columns == Seq(
      TableColumn("id", "integer", nullable = false, isPrimary = true),
      TableColumn("name", "text", nullable = true, isPrimary = false)))
    assert(ts(1).columns == Seq(TableColumn("k", "bigint", nullable = false, isPrimary = true)))
    // pg types with spaces survive
    assert(TableSchema.parseSpec("t|ts:timestamp with time zone")
      .head.columns.head.pgType == "timestamp with time zone")
    intercept[IllegalArgumentException](TableSchema.parseSpec("t|id")) // no type
    intercept[IllegalArgumentException](TableSchema.parseSpec("justtable"))
    intercept[IllegalArgumentException](TableSchema.parseSpec("t|id:integer:primary"))
  }

  test("stream verb: schema spec parsed, wal replayed, event recorded") {
    spark.sparkContext.setLogLevel("WARN") // activate shared session
    val root = Files.createTempDirectory("cli-stream").toString
    val wal = s"$root/wal"; Files.createDirectories(java.nio.file.Paths.get(wal))
    Files.writeString(java.nio.file.Paths.get(wal, "a.json"),
      """{"commit_lsn": 1, "records": [{"action": "I", "xid": 1,
        |"lsn": "0/1", "nextlsn": "", "timestamp": "t", "schema": "public",
        |"table": "m", "columns": [
        |  {"name": "id", "type": "integer", "value": 7},
        |  {"name": "name", "type": "text", "value": "x"}],
        |"pk": []}]}""".stripMargin.replace("\n", " "))
    // Main's stream verb blocks on awaitTermination (service form); the
    // test drives the same path through Vaults with AvailableNow, using
    // the SAME schema-spec string the CLI would parse
    val v = new Vaults(spark, root, OutputFormat.Json)
    val q = v.stream("ns.m", graft.cdc.TableSchema.parseSpec("m|id:integer:pk,name:text"),
      wal, s"$root/work", availableNow = true)
    q.awaitTermination(120000)
    assert(v.events("ns.m").contains("cid"))
  }

  test("curate verb: quality gate + keep-best dedup over a parquet corpus") {
    import spark.implicits._
    val root = Files.createTempDirectory("cli-curate").toString
    val in = s"$root/in.parquet"; val out = s"$root/out.parquet"
    val good = "the quick brown fox jumps over the lazy dog again and again today"
    Seq(
      (0L, good),                      // passes, survives
      (1L, good + " extended"),        // near-dup of 0 (jaccard 11/12), LONGER → keeps 1
      (2L, "short text"),              // < 10 tokens → gated out
      (3L, ("spam " * 40).trim)        // dup_ratio ≈ 1 → gated out
    ).toDF("doc_id", "text").write.parquet(in)
    assert(Main.run(Array(root, "curate", in, out)) == 0)
    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L)) // cluster {0,1} keeps the longer member
  }

  test("integration: CDC stream → signed store → events → retrieve → analyze") {
    import graft.cdc.{TableColumn, TableSchema}
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("integration").toString
    val v = new Vaults(spark, root, OutputFormat.Json)
    val acct = "0x396F15b0A2be942193BBBdC11BE3bF6F6EB1a08a"
    v.create("ns.metrics", acct, 10)

    // feed two txs through the streaming pipeline with signing
    val wal = s"$root/wal"; Files.createDirectories(java.nio.file.Paths.get(wal))
    def tx(lsn: Long, id: Int, value: Double) =
      s"""{"commit_lsn": $lsn, "records": [{"action": "I", "xid": $lsn,
         |"lsn": "0/$lsn", "nextlsn": "", "timestamp": "t", "schema": "public",
         |"table": "metrics", "columns": [
         |  {"name": "id", "type": "integer", "value": $id},
         |  {"name": "value", "type": "double precision", "value": $value}],
         |"pk": []}]}""".stripMargin.replace("\n", " ")
    Files.writeString(java.nio.file.Paths.get(wal, "a.json"),
      Seq(tx(1, 1, 1.5), tx(2, 2, 2.5)).mkString("\n"))
    val schema = TableSchema("metrics", Seq(
      TableColumn("id", "integer", false, true),
      TableColumn("value", "double precision", true, false)))
    val key = "59c6995e998f97a5a0044966f0945389dc9e86dae88c7a8412f4603b6b78690d"
    val q = v.stream("ns.metrics", Seq(schema), wal, s"$root/work",
      keyHex = Some(key), availableNow = true)
    q.awaitTermination(120000)

    // event recorded → retrieve by cid → analyze the retrieved snapshot
    val ev = v.events("ns.metrics")
    val cid = """"cid":"([0-9a-z]+)"""".r.findFirstMatchIn(ev).get.group(1)
    val out = s"$root/retrieved.parquet"
    assert(v.retrieve(cid, out))
    val df = spark.read.parquet(out)
    val agg = df.agg(count(lit(1)), sum("value")).collect()(0)
    assert(agg.getLong(0) == 2 && agg.getDouble(1) == 4.0)
  }
}
