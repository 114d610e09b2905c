package graft.cdc

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger

/** S3 stateful tx assembly: B/I/C grouping per xid, non-empty emit,
  * LSN parse — mirrors replicator.go:159-207 semantics. */
class TxAssemblerSpec extends SparkSpec {

  test("LSN parse/format round trip (pg text form)") {
    assert(Lsn.parse("0/3910B898") == 0x3910B898L)
    assert(Lsn.parse("A/1") == (0xAL << 32 | 1))
    assert(Lsn.format(Lsn.parse("A/3910B898")) == "A/3910B898")
    intercept[IllegalArgumentException](Lsn.parse("oops"))
  }

  private def rec(action: String, xid: Long, lsn: String,
                  id: Int = 0, table: String = "t"): String =
    s"""{"action": "$action", "xid": $xid, "lsn": "$lsn", "nextlsn": "",
       |"timestamp": "t", "schema": "public", "table": "$table",
       |"columns": [{"name": "id", "type": "integer", "value": $id}],
       |"pk": []}""".stripMargin.replace("\n", " ")

  test("streaming assembly: B..C emits complete tx; interleaved xids; empty tx dropped") {
    val base = Files.createTempDirectory("txasm").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    // two interleaved txs + one empty tx (B immediately followed by C)
    Files.writeString(Paths.get(in, "a.json"), Seq(
      rec("B", 10, "0/10"),
      rec("B", 20, "0/20"),
      rec("I", 10, "0/11", id = 1),
      rec("I", 20, "0/21", id = 2),
      rec("I", 10, "0/12", id = 3),
      rec("C", 10, "0/1F"),
      rec("B", 30, "0/30"),
      rec("C", 30, "0/3F"), // empty tx → dropped
      rec("C", 20, "0/2F")
    ).mkString("\n"))

    val lines = spark.readStream.text(in)
    val txs = TxAssembler.assembleLines(lines)
    val q = txs.writeStream.outputMode("append").format("memory")
      .queryName("txasm_out").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination(120000)

    val out = spark.table("txasm_out").collect()
      .map(r => (r.getAs[Long]("commit_lsn"), r.getAs[Long]("xid"),
        r.getAs[Seq[org.apache.spark.sql.Row]]("records").map(_.getAs[String]("lsn"))))
      .sortBy(_._2)
    assert(out.length == 2) // xid 30 empty → not emitted
    assert(out(0) == ((0x1FL, 10L, Seq("0/11", "0/12")))) // order preserved
    assert(out(1) == ((0x2FL, 20L, Seq("0/21"))))
  }

  test("shuffle-scrambled group order is restored by lsn before folding") {
    val base = Files.createTempDirectory("txasm3").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    // one tx whose records arrive in REVERSED order (C first, B last) —
    // the shape a multi-partition shuffle can produce for a single xid
    Files.writeString(Paths.get(in, "a.json"), Seq(
      rec("C", 40, "0/4F"),
      rec("I", 40, "0/43", id = 3),
      rec("I", 40, "0/41", id = 1),
      rec("I", 40, "0/42", id = 2),
      rec("B", 40, "0/40")
    ).mkString("\n"))

    val lines = spark.readStream.text(in).repartition(5) // scatter records
    val txs = TxAssembler.assembleLines(lines)
    val q = txs.writeStream.outputMode("append").format("memory")
      .queryName("txasm_scrambled").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination(120000)

    val out = spark.table("txasm_scrambled").collect()
      .map(r => (r.getAs[Long]("commit_lsn"),
        r.getAs[Seq[org.apache.spark.sql.Row]]("records").map(_.getAs[String]("lsn"))))
    assert(out.length == 1)
    assert(out(0) == ((0x4FL, Seq("0/41", "0/42", "0/43")))) // WAL order restored
  }

  test("data records without parseable lsn are preserved in arrival order") {
    // a feed where B/C carry lsn but I records don't: sorting by parsed
    // lsn would send the unparseable records (MinValue key) BEFORE B,
    // whose buffer reset silently dropped them — such groups must keep
    // arrival order instead
    val base = Files.createTempDirectory("txasm4").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    Files.writeString(Paths.get(in, "a.json"), Seq(
      rec("B", 50, "0/50"),
      rec("I", 50, "", id = 1),
      rec("I", 50, "", id = 2),
      rec("C", 50, "0/5F")
    ).mkString("\n"))

    val lines = spark.readStream.text(in) // single partition: arrival order kept
    val txs = TxAssembler.assembleLines(lines)
    val q = txs.writeStream.outputMode("append").format("memory")
      .queryName("txasm_nolsn").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination(120000)

    val out = spark.table("txasm_nolsn").collect()
      .map(r => (r.getAs[Long]("commit_lsn"),
        r.getAs[Seq[org.apache.spark.sql.Row]]("records")
          .map(_.getAs[Seq[org.apache.spark.sql.Row]]("columns").head.getAs[String]("value"))))
    assert(out.length == 1)
    assert(out(0) == ((0x5FL, Seq("1", "2")))) // both records survived, in order
  }

  test("tx left open (no C) stays in state, emits when C arrives later") {
    val base = Files.createTempDirectory("txasm2").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    Files.writeString(Paths.get(in, "a.json"),
      Seq(rec("B", 7, "0/70"), rec("I", 7, "0/71", id = 9)).mkString("\n"))

    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): Unit = {
      // memory sink can't recover from checkpoints; foreachBatch can
      val q = TxAssembler.assembleLines(spark.readStream.text(in))
        .writeStream.outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[TxAssembler.AssembledTx], _: Long) =>
          b.collect().foreach(t => emitted.add(t.commit_lsn)): Unit
        }
        .start()
      q.awaitTermination(120000)
      ()
    }
    run()
    assert(emitted.isEmpty) // no commit yet
    Files.writeString(Paths.get(in, "b.json"), rec("C", 7, "0/7F"))
    run()
    assert(emitted.size == 1 && emitted.peek() == 0x7FL)
  }
}
