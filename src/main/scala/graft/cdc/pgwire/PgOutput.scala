package graft.cdc.pgwire

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import PgWire.{Lsn, XLogData}

/**
 * `pgoutput` logical-decoding support: a binary message parser for the
 * public "Logical Streaming Replication Protocol" message formats plus a
 * transaction builder that emits the SAME one-transaction-per-line spool
 * envelope as [[Wal2JsonTxBuilder]] (`{"commit_lsn":N,"records":[...]}`
 * with wal2json-format-2-shaped records), so every downstream stage —
 * [[graft.cdc.WalDecoder]], [[graft.cdc.TxAssembler]],
 * [[graft.cdc.CdcMerge]], the Spark source — runs unchanged.
 *
 * Why this exists: the reference replicates through the wal2json output
 * plugin (`pkg/pgrepl/replicator.go:140-150`), which is a third-party
 * extension a DBA must install. `pgoutput` is compiled into every stock
 * PostgreSQL ≥ 10 (it is what native logical replication subscriptions
 * speak), so a [[PgWalFeed]] configured with `plugin = "pgoutput"` can
 * ingest from ANY reachable Postgres with `wal_level=logical` — no
 * server-side extension required.
 *
 * Protocol notes (all from the public docs, "protocol version 1"):
 *  - values arrive in the type output function's text format (we never
 *    request binary), identical to the literals wal2json emits, so
 *    [[graft.cdc.PgValueDecoder]]'s casts apply as-is (`t`/`f` booleans
 *    and `\x`-prefixed bytea included);
 *  - Relation ('R') messages describe a table before its first change in
 *    the stream (and again after DDL); the builder caches them;
 *  - an UPDATE carries an old tuple only when the replica identity
 *    changed (submessage 'K') or the table has REPLICA IDENTITY FULL
 *    ('O'); otherwise the key is unchanged and the identity is read from
 *    the new tuple's key columns;
 *  - an unchanged TOASTed column arrives as marker 'u' with no value; it
 *    is emitted as SQL NULL (same information loss as wal2json without
 *    `include-unchanged-toast`) — documented, not silent.
 */
object PgOutput {

  final case class RelCol(name: String, typeOid: Int, isKey: Boolean)
  final case class Relation(id: Int, namespace: String, name: String,
                            replicaIdentity: Byte, cols: Seq[RelCol])

  /** One decoded column value: NULL, unchanged TOAST, or text. */
  sealed trait TupleVal
  case object NullVal extends TupleVal
  case object ToastVal extends TupleVal
  final case class TextVal(s: String) extends TupleVal

  sealed trait Msg
  final case class Begin(finalLsn: Long, commitTsMicros: Long, xid: Long) extends Msg
  final case class Commit(commitLsn: Long, endLsn: Long, tsMicros: Long) extends Msg
  final case class RelationMsg(rel: Relation) extends Msg
  final case class Insert(relId: Int, newTuple: IndexedSeq[TupleVal]) extends Msg
  final case class Update(relId: Int, oldKind: Option[Char],
                          oldTuple: Option[IndexedSeq[TupleVal]],
                          newTuple: IndexedSeq[TupleVal]) extends Msg
  final case class Delete(relId: Int, oldKind: Char, oldTuple: IndexedSeq[TupleVal]) extends Msg
  final case class Truncate(relIds: Seq[Int]) extends Msg
  /** Origin / Type / logical Message frames: parsed enough to skip. */
  case object Ignored extends Msg

  // ------------------------------------------------------------ parsing

  private def cstr(b: ByteBuffer): String = {
    val bytes = new java.io.ByteArrayOutputStream()
    var c = b.get()
    while (c != 0) { bytes.write(c.toInt); c = b.get() }
    new String(bytes.toByteArray, StandardCharsets.UTF_8)
  }

  private def tupleData(b: ByteBuffer): IndexedSeq[TupleVal] = {
    val n = b.getShort.toInt
    (0 until n).map { _ =>
      b.get().toChar match {
        case 'n' => NullVal
        case 'u' => ToastVal
        case 't' =>
          val len = b.getInt
          val bytes = new Array[Byte](len)
          b.get(bytes)
          TextVal(new String(bytes, StandardCharsets.UTF_8))
        case 'b' =>
          // binary format is only sent when requested; we never request it
          throw new IllegalStateException("unexpected binary tuple value (binary format not requested)")
        case other =>
          throw new IllegalStateException(s"unknown tuple value kind '$other'")
      }
    }
  }

  /** Parse one pgoutput message (an XLogData payload). Unknown message
    * types fail loudly — silently skipping could drop WAL changes. */
  def parse(payload: Array[Byte]): Msg = {
    val b = ByteBuffer.wrap(payload)
    b.get().toChar match {
      case 'B' =>
        Begin(b.getLong, b.getLong, b.getInt.toLong & 0xffffffffL)
      case 'C' =>
        b.get() // flags, currently unused (0)
        Commit(b.getLong, b.getLong, b.getLong)
      case 'R' =>
        val id = b.getInt
        val ns = cstr(b)
        val name = cstr(b)
        val replIdent = b.get()
        val ncols = b.getShort.toInt
        val cols = (0 until ncols).map { _ =>
          val flags = b.get()
          val cname = cstr(b)
          val typeOid = b.getInt
          b.getInt // atttypmod, not needed (PgTypes.normalize strips it anyway)
          RelCol(cname, typeOid, (flags & 1) == 1)
        }
        // the docs: empty namespace string means pg_catalog
        RelationMsg(Relation(id, if (ns.isEmpty) "pg_catalog" else ns, name, replIdent, cols))
      case 'I' =>
        val relId = b.getInt
        val kind = b.get().toChar
        require(kind == 'N', s"INSERT tuple kind '$kind' (expected 'N')")
        Insert(relId, tupleData(b))
      case 'U' =>
        val relId = b.getInt
        var oldKind: Option[Char] = None
        var oldTuple: Option[IndexedSeq[TupleVal]] = None
        var k = b.get().toChar
        if (k == 'K' || k == 'O') {
          oldKind = Some(k)
          oldTuple = Some(tupleData(b))
          k = b.get().toChar
        }
        require(k == 'N', s"UPDATE new-tuple kind '$k' (expected 'N')")
        Update(relId, oldKind, oldTuple, tupleData(b))
      case 'D' =>
        val relId = b.getInt
        val kind = b.get().toChar
        require(kind == 'K' || kind == 'O', s"DELETE tuple kind '$kind' (expected 'K' or 'O')")
        Delete(relId, kind, tupleData(b))
      case 'T' =>
        val n = b.getInt
        b.get() // option bits (CASCADE/RESTART IDENTITY) — not replayed
        Truncate((0 until n).map(_ => b.getInt))
      case 'O' | 'Y' | 'M' =>
        Ignored
      case other =>
        throw new IllegalStateException(f"unknown pgoutput message type '$other' (0x${other.toInt}%02x)")
    }
  }

  // ------------------------------------------------- OID → wal2json name

  /** Built-in type OIDs → the type-name vocabulary wal2json emits and
    * [[graft.core.PgTypes]] resolves. OIDs of built-in types are part of
    * the public catalog ABI (pg_type.dat) and stable across versions.
    * Unknown OIDs render as `oid:N`, which the typed pivot rejects loudly
    * (UnsupportedPgTypeException) — same behavior as an unsupported name
    * arriving from wal2json. */
  val typeNames: Map[Int, String] = {
    val scalar = Map(
      16 -> "boolean", 21 -> "smallint", 23 -> "integer", 20 -> "bigint",
      700 -> "real", 701 -> "double precision", 1700 -> "numeric",
      26 -> "oid", 829 -> "macaddr", 17 -> "bytea", 18 -> "\"char\"",
      1042 -> "character", 1043 -> "character varying", 25 -> "text",
      114 -> "json", 3802 -> "jsonb", 2950 -> "uuid", 1082 -> "date",
      1083 -> "time without time zone", 1266 -> "time with time zone",
      1114 -> "timestamp without time zone", 1184 -> "timestamp with time zone",
      1186 -> "interval")
    val array = Map(
      1000 -> 16, 1005 -> 21, 1007 -> 23, 1016 -> 20, 1021 -> 700,
      1022 -> 701, 1231 -> 1700, 1028 -> 26, 1040 -> 829, 1001 -> 17,
      1002 -> 18, 1014 -> 1042, 1015 -> 1043, 1009 -> 25, 199 -> 114,
      3807 -> 3802, 2951 -> 2950, 1182 -> 1082, 1183 -> 1083,
      1270 -> 1266, 1115 -> 1114, 1185 -> 1184, 1187 -> 1186)
    scalar ++ array.view.mapValues(e => scalar(e) + "[]").toMap
  }

  def typeName(oid: Int): String = typeNames.getOrElse(oid, s"oid:$oid")

  /** Postgres-epoch microseconds → the wal2json-style timestamp text
    * (`2021-03-18 13:00:00.123456+00`). */
  def formatTs(pgMicros: Long): String = {
    val unixMicros = pgMicros + PgWire.PgEpochUnixMillis * 1000L
    val secs = Math.floorDiv(unixMicros, 1000000L)
    val micros = Math.floorMod(unixMicros, 1000000L)
    val t = java.time.LocalDateTime.ofEpochSecond(secs, micros.toInt * 1000, java.time.ZoneOffset.UTC)
    f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d " +
      f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d.$micros%06d+00"
  }
}

/** Assembles pgoutput messages into the spool's tx envelope — the
  * pgoutput counterpart of [[Wal2JsonTxBuilder]], same contract: feed one
  * XLogData frame, get the completed `(commitLsn, jsonLine)` when the
  * frame is the commit. Not thread-safe: owned by the receive loop.
  *
  * The envelope's `commit_lsn` is the commit's END LSN (the first byte
  * after the commit record) — the resume point a standby acks, matching
  * wal2json's `nextlsn` on its B/C markers. The Begin/Commit consistency
  * check mirrors [[Wal2JsonTxBuilder]]: Begin.finalLsn must equal
  * Commit.commitLsn (the documented invariant), else the tx is dropped.
  */
final class PgOutputTxBuilder {
  import PgOutput._

  private val mapper = new ObjectMapper()
  private val relations = scala.collection.mutable.Map[Int, Relation]()
  private var records: ArrayNode = mapper.createArrayNode()
  private var inTx = false
  private var txFinalLsn = 0L
  private var txTsText = ""
  private var txXid = 0L

  /** One `{name,type[,value]}` column object; `value = None` omits the
    * field (pk entries), `Some(null)` emits JSON null. */
  private def colNode(c: RelCol, value: Option[String]): ObjectNode = {
    val o: ObjectNode = mapper.createObjectNode()
    o.put("name", c.name)
    o.put("type", typeName(c.typeOid))
    value.foreach(v => if (v == null) o.putNull("value") else o.put("value", v): Unit)
    o
  }

  private def columnsNode(rel: Relation, tuple: IndexedSeq[TupleVal]): ArrayNode = {
    val arr = mapper.createArrayNode()
    rel.cols.zipWithIndex.foreach { case (c, i) =>
      arr.add(colNode(c, Some(tuple(i) match {
        case TextVal(s) => s
        case NullVal | ToastVal => null
      }))): Unit
    }
    arr
  }

  /** Identity (old-key) node for U/D: the provided old tuple's non-null
    * columns, or — when the update carried no old tuple because the key
    * did not change — the key columns out of the new tuple. */
  private def identityNode(rel: Relation, oldTuple: Option[IndexedSeq[TupleVal]],
                           newTuple: Option[IndexedSeq[TupleVal]]): ArrayNode = {
    val arr = mapper.createArrayNode()
    oldTuple match {
      case Some(t) =>
        rel.cols.zipWithIndex.foreach { case (c, i) =>
          t(i) match {
            case TextVal(s) => arr.add(colNode(c, Some(s))): Unit
            case _ => () // 'K' old tuples carry nulls for non-key columns
          }
        }
      case None =>
        newTuple.foreach { t =>
          rel.cols.zipWithIndex.foreach { case (c, i) =>
            if (c.isKey) t(i) match {
              case TextVal(s) => arr.add(colNode(c, Some(s))): Unit
              case _ => ()
            }
          }
        }
    }
    arr
  }

  private def pkNode(rel: Relation): ArrayNode = {
    val arr = mapper.createArrayNode()
    rel.cols.filter(_.isKey).foreach(c => arr.add(colNode(c, None)): Unit)
    arr
  }

  private def record(action: String, rel: Relation, lsn: Long,
                     columns: Option[ArrayNode], identity: Option[ArrayNode]): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("action", action)
    o.put("xid", txXid)
    o.put("lsn", Lsn.format(lsn))
    o.put("timestamp", txTsText)
    o.put("schema", rel.namespace)
    o.put("table", rel.name)
    columns.foreach(o.set[ObjectNode]("columns", _))
    identity.foreach(o.set[ObjectNode]("identity", _))
    o.set[ObjectNode]("pk", pkNode(rel))
    o
  }

  private def rel(relId: Int): Relation =
    relations.getOrElse(relId,
      throw new IllegalStateException(s"change for relation $relId before its Relation message"))

  /** Feed one XLogData frame; emits the tx envelope on commit. */
  def feed(x: XLogData): Option[(Long, String)] = PgOutput.parse(x.payload) match {
    case RelationMsg(r) =>
      relations(r.id) = r
      None
    case Begin(finalLsn, ts, xid) =>
      inTx = true; txFinalLsn = finalLsn; txTsText = formatTs(ts); txXid = xid
      records = mapper.createArrayNode()
      None
    case Insert(relId, tup) =>
      val r = rel(relId)
      records.add(record("I", r, x.walStart, Some(columnsNode(r, tup)), None))
      None
    case Update(relId, _, oldTup, newTup) =>
      val r = rel(relId)
      records.add(record("U", r, x.walStart, Some(columnsNode(r, newTup)),
        Some(identityNode(r, oldTup, Some(newTup)))))
      None
    case Delete(relId, _, oldTup) =>
      val r = rel(relId)
      records.add(record("D", r, x.walStart, None, Some(identityNode(r, Some(oldTup), None))))
      None
    case Truncate(relIds) =>
      // same fail-loud contract as I/U/D: a truncate for an unknown
      // relation means the cache is out of sync with the stream
      relIds.foreach { id =>
        records.add(record("T", rel(id), x.walStart, None, None)): Unit
      }
      None
    case Commit(commitLsn, endLsn, _) =>
      val out =
        if (!inTx || commitLsn != txFinalLsn) {
          // Begin/Commit mismatch: drop, like Wal2JsonTxBuilder's guard
          None
        } else if (records.size() == 0) None
        else {
          val env = mapper.createObjectNode()
          env.put("commit_lsn", endLsn)
          env.set[ObjectNode]("records", records)
          Some((endLsn, mapper.writeValueAsString(env)))
        }
      inTx = false; records = mapper.createArrayNode()
      out
    case Ignored => None
  }
}
