package graft.cdc.pgwire

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import graft.cdc.{TableColumn, TableSchema, WalDecoder}
import graft.cdc.pgwire.PgWire.XLogData
import org.apache.spark.sql.functions._

/**
 * pgoutput decoder tests. Every message below is hand-assembled with raw
 * ByteBuffer writes from the public protocol documentation ("Logical
 * Streaming Replication Protocol" message formats) — NOT with any shared
 * encoder — so a PgOutput parsing bug cannot be masked by a matching
 * assembly bug. The builder tests then check the produced spool envelope
 * is consumable by the unchanged wal2json downstream (WalDecoder → typed
 * pivot), which is the whole point of the adapter.
 */
class PgOutputSpec extends SparkSpec {
  import PgOutput._

  // ------------------------------------------------- binary assembly

  private def buf(n: Int) = ByteBuffer.allocate(n)
  private def bytes(b: ByteBuffer): Array[Byte] = { val a = new Array[Byte](b.position()); b.flip(); b.get(a); a }
  private def cstr(b: ByteBuffer, s: String): Unit = { b.put(s.getBytes(StandardCharsets.UTF_8)); b.put(0.toByte); () }
  private def tval(b: ByteBuffer, v: String): Unit = {
    b.put('t'.toByte); b.putInt(v.getBytes(StandardCharsets.UTF_8).length)
    b.put(v.getBytes(StandardCharsets.UTF_8)); ()
  }

  /** Relation 'R': oid=55001 public.t(id integer key, name text, ok boolean). */
  private val relationMsg: Array[Byte] = {
    val b = buf(256)
    b.put('R'.toByte); b.putInt(55001)
    cstr(b, "public"); cstr(b, "t")
    b.put('d'.toByte) // replica identity: default
    b.putShort(3.toShort)
    b.put(1.toByte); cstr(b, "id"); b.putInt(23); b.putInt(-1)   // key, int4
    b.put(0.toByte); cstr(b, "name"); b.putInt(25); b.putInt(-1) // text
    b.put(0.toByte); cstr(b, "ok"); b.putInt(16); b.putInt(-1)   // bool
    bytes(b)
  }

  /** Begin 'B': finalLsn 0x15E8000, ts 700000000000000 µs, xid 777. */
  private val beginMsg: Array[Byte] = {
    val b = buf(32)
    b.put('B'.toByte); b.putLong(0x15E8000L); b.putLong(700000000000000L); b.putInt(777)
    bytes(b)
  }

  /** Insert 'I': rel 55001, new tuple (7, 'row7', t). */
  private val insertMsg: Array[Byte] = {
    val b = buf(128)
    b.put('I'.toByte); b.putInt(55001); b.put('N'.toByte)
    b.putShort(3.toShort); tval(b, "7"); tval(b, "row7"); tval(b, "t")
    bytes(b)
  }

  /** Update 'U' WITHOUT old tuple (key unchanged): new (7, 'seven', f). */
  private val updateMsg: Array[Byte] = {
    val b = buf(128)
    b.put('U'.toByte); b.putInt(55001); b.put('N'.toByte)
    b.putShort(3.toShort); tval(b, "7"); tval(b, "seven"); tval(b, "f")
    bytes(b)
  }

  /** Update 'U' WITH a 'K' old tuple (key changed 7→8): nulls for non-key. */
  private val updateKeyMsg: Array[Byte] = {
    val b = buf(128)
    b.put('U'.toByte); b.putInt(55001)
    b.put('K'.toByte); b.putShort(3.toShort); tval(b, "7"); b.put('n'.toByte); b.put('n'.toByte)
    b.put('N'.toByte); b.putShort(3.toShort); tval(b, "8"); tval(b, "eight"); tval(b, "t")
    bytes(b)
  }

  /** Delete 'D': rel 55001, 'K' old tuple (8, null, null). */
  private val deleteMsg: Array[Byte] = {
    val b = buf(64)
    b.put('D'.toByte); b.putInt(55001)
    b.put('K'.toByte); b.putShort(3.toShort); tval(b, "8"); b.put('n'.toByte); b.put('n'.toByte)
    bytes(b)
  }

  /** Commit 'C': flags 0, commitLsn 0x15E8000, endLsn 0x15E8100, ts. */
  private val commitMsg: Array[Byte] = {
    val b = buf(32)
    b.put('C'.toByte); b.put(0.toByte); b.putLong(0x15E8000L); b.putLong(0x15E8100L)
    b.putLong(700000000000000L)
    bytes(b)
  }

  private def xlog(payload: Array[Byte], at: Long = 0x15E7F40L): XLogData =
    XLogData(at, at + 0x40, 700000000000000L, payload)

  // ---------------------------------------------------------- parsing

  test("parse: Relation message (names, type oids, key flags, identity)") {
    val RelationMsg(r) = PgOutput.parse(relationMsg): @unchecked
    assert(r.id == 55001 && r.namespace == "public" && r.name == "t")
    assert(r.replicaIdentity == 'd'.toByte)
    assert(r.cols == Seq(RelCol("id", 23, isKey = true), RelCol("name", 25, isKey = false),
      RelCol("ok", 16, isKey = false)))
  }

  test("parse: Begin / Commit carry the documented LSN and timestamp fields") {
    val Begin(finalLsn, ts, xid) = PgOutput.parse(beginMsg): @unchecked
    assert(finalLsn == 0x15E8000L && ts == 700000000000000L && xid == 777L)
    val Commit(cl, el, cts) = PgOutput.parse(commitMsg): @unchecked
    assert(cl == 0x15E8000L && el == 0x15E8100L && cts == 700000000000000L)
  }

  test("parse: Insert/Update/Delete tuples (text, null, key-only old images)") {
    val Insert(rid, tup) = PgOutput.parse(insertMsg): @unchecked
    assert(rid == 55001 && tup == IndexedSeq(TextVal("7"), TextVal("row7"), TextVal("t")))
    val Update(_, oldKind, oldTup, newTup) = PgOutput.parse(updateKeyMsg): @unchecked
    assert(oldKind.contains('K'))
    assert(oldTup.contains(IndexedSeq(TextVal("7"), NullVal, NullVal)))
    assert(newTup == IndexedSeq(TextVal("8"), TextVal("eight"), TextVal("t")))
    val Delete(_, kind, dTup) = PgOutput.parse(deleteMsg): @unchecked
    assert(kind == 'K' && dTup == IndexedSeq(TextVal("8"), NullVal, NullVal))
  }

  test("parse: unchanged-TOAST marker and unknown message types") {
    val b = buf(64)
    b.put('I'.toByte); b.putInt(55001); b.put('N'.toByte)
    b.putShort(2.toShort); tval(b, "1"); b.put('u'.toByte)
    val Insert(_, tup) = PgOutput.parse(bytes(b)): @unchecked
    assert(tup == IndexedSeq(TextVal("1"), ToastVal))
    intercept[IllegalStateException](PgOutput.parse(Array('z'.toByte, 0, 0)))
  }

  test("type oids map to the wal2json name vocabulary; unknown oids are loud") {
    assert(typeName(23) == "integer" && typeName(1043) == "character varying")
    assert(typeName(1184) == "timestamp with time zone")
    assert(typeName(1007) == "integer[]" && typeName(1009) == "text[]")
    assert(typeName(424242) == "oid:424242")
    // an unknown oid's name must fail the typed pivot, not silently decode
    assert(!graft.core.PgTypes.isSupported(typeName(424242)))
  }

  test("pg-epoch timestamps render in wal2json's text form") {
    // 700000000000000 µs after 2000-01-01 = 2022-03-07 20:26:40 UTC
    assert(formatTs(700000000000000L) == "2022-03-07 20:26:40.000000+00")
    assert(formatTs(1L) == "2000-01-01 00:00:00.000001+00")
  }

  // ---------------------------------------------------------- builder

  private def feedSession(msgs: Seq[Array[Byte]]): Seq[(Long, String)] = {
    val builder = new PgOutputTxBuilder
    var at = 0x15E7F40L
    msgs.flatMap { m =>
      val r = builder.feed(xlog(m, at))
      at += 0x40
      r
    }
  }

  test("builder: one tx envelope per commit, wal2json-shaped records") {
    val out = feedSession(Seq(relationMsg, beginMsg, insertMsg, updateMsg, deleteMsg, commitMsg))
    assert(out.size == 1)
    val (lsn, line) = out.head
    assert(lsn == 0x15E8100L) // commit END lsn: the standby resume point
    val tx = new ObjectMapper().readTree(line)
    assert(tx.get("commit_lsn").asLong == 0x15E8100L)
    val recs = tx.get("records")
    assert(recs.size == 3)
    assert((0 until 3).map(i => recs.get(i).get("action").asText) == Seq("I", "U", "D"))

    val ins = recs.get(0)
    assert(ins.get("schema").asText == "public" && ins.get("table").asText == "t")
    assert(ins.get("xid").asLong == 777L)
    assert(ins.get("timestamp").asText == "2022-03-07 20:26:40.000000+00")
    val cols = ins.get("columns")
    assert(cols.get(0).get("name").asText == "id" && cols.get(0).get("type").asText == "integer"
      && cols.get(0).get("value").asText == "7")
    assert(cols.get(2).get("type").asText == "boolean" && cols.get(2).get("value").asText == "t")
    assert(ins.get("pk").size == 1 && ins.get("pk").get(0).get("name").asText == "id")

    // U without an old tuple: identity = key columns from the NEW tuple
    val upd = recs.get(1)
    assert(upd.get("identity").size == 1)
    assert(upd.get("identity").get(0).get("name").asText == "id"
      && upd.get("identity").get(0).get("value").asText == "7")

    // D: identity from the 'K' old tuple, no columns field
    val del = recs.get(2)
    assert(del.get("columns") == null)
    assert(del.get("identity").size == 1
      && del.get("identity").get(0).get("value").asText == "8")
  }

  test("builder: key-changing update carries the OLD key in identity") {
    val out = feedSession(Seq(relationMsg, beginMsg, updateKeyMsg, commitMsg))
    val recs = new ObjectMapper().readTree(out.head._2).get("records")
    assert(recs.get(0).get("identity").get(0).get("value").asText == "7")
    assert(recs.get(0).get("columns").get(0).get("value").asText == "8")
  }

  test("builder: Begin/Commit LSN mismatch drops the tx; empty tx emits nothing") {
    val badCommit = {
      val b = buf(32)
      b.put('C'.toByte); b.put(0.toByte); b.putLong(0xBAD000L); b.putLong(0xBAD100L)
      b.putLong(700000000000000L)
      bytes(b)
    }
    assert(feedSession(Seq(relationMsg, beginMsg, insertMsg, badCommit)).isEmpty)
    assert(feedSession(Seq(relationMsg, beginMsg, commitMsg)).isEmpty)
  }

  test("builder: change before its Relation message fails loudly") {
    val builder = new PgOutputTxBuilder
    builder.feed(xlog(beginMsg))
    intercept[IllegalStateException](builder.feed(xlog(insertMsg)))
  }

  test("envelope round-trips through the unchanged wal2json downstream (WalDecoder → typed pivot)") {
    val out = feedSession(Seq(relationMsg, beginMsg, insertMsg, updateMsg, deleteMsg, commitMsg))
    val lines = spark.createDataset(out.map(_._2))(org.apache.spark.sql.Encoders.STRING).toDF("value")
    val schema = TableSchema("t", Seq(
      TableColumn("id", "integer", nullable = false, isPrimary = true),
      TableColumn("name", "text", nullable = true, isPrimary = false),
      TableColumn("ok", "boolean", nullable = true, isPrimary = false)))
    val byTable = WalDecoder.decodeTables(spark, lines, Seq(schema), replayActions = Set("I", "U"))
    val rows = byTable("t").orderBy(col("name")).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSeq
      == Seq((7, "row7", true), (7, "seven", false)))
  }
}
