package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Postgres LSN helpers: `"0/3910B898"` ⇄ 64-bit (hi<<32 | lo). */
object Lsn {
  def parse(s: String): Long = s.split('/') match {
    case Array(hi, lo) => (java.lang.Long.parseLong(hi, 16) << 32) | java.lang.Long.parseLong(lo, 16)
    case _ => throw new IllegalArgumentException(s"bad LSN: $s")
  }
  def format(lsn: Long): String =
    f"${lsn >>> 32}%X/${lsn & 0xFFFFFFFFL}%X"

  /** Parse if well-formed; None on null/malformed. */
  def tryParseOpt(s: String): Option[Long] =
    if (s == null) None
    else try Some(parse(s)) catch { case _: Exception => None }

  /** Total-order sort key that tolerates missing/malformed LSNs (sorts
    * them first, preserving their relative input order via stable sort). */
  def tryParse(s: String): Long = tryParseOpt(s).getOrElse(Long.MinValue)
}

/**
 * Tx assembly from a *bare record* stream (S3, stateful form).
 *
 * [[graft.cdc.source.WalSource]] delivers one tx per line, so assembly is
 * free. Feeds that emit individual wal2json records with B(EGIN)/C(OMMIT)
 * markers — the wire shape the reference's replicator consumes
 * (`pkg/pgrepl/replicator.go:159-207`) — are assembled here with
 * `groupByKey(xid)` + `flatMapGroupsWithState`: accumulate I/U/D between
 * B and C, emit the complete `Tx` on C (only if non-empty, matching the
 * reference), drop state. A state timeout evicts abandoned transactions
 * (crashed upstream without C) instead of leaking state forever — the
 * knob the reference lacks.
 *
 * Per-xid record order is NOT assumed from the shuffle: after
 * `groupByKey`'s hash exchange Spark sorts only by key, so a group's
 * values iterator can interleave input partitions arbitrarily. Each
 * invocation therefore re-sorts its records by parsed `lsn` (the WAL
 * position is monotonic within a transaction — single-writer WAL order)
 * before folding B/I/C, restoring wire order deterministically.
 */
object TxAssembler {

  final case class AssembledTx(commit_lsn: Long, xid: Long,
                               records: Seq[WalModel.Record])
  final case class Buf(records: Seq[WalModel.Record])

  /** records dataset (schema = [[WalModel.recordSchema]] rows) → txs. */
  def assemble(records: DataFrame,
               staleTxTimeoutMs: Long = 0L): Dataset[AssembledTx] = {
    implicit val recEnc = Encoders.product[WalModel.Record]
    implicit val txEnc = Encoders.product[AssembledTx]
    implicit val bufEnc = Encoders.product[Buf]
    implicit val longEnc = Encoders.scalaLong

    val identityCol =
      if (records.columns.contains("identity")) col("identity")
      else lit(null).cast(org.apache.spark.sql.types.ArrayType(WalModel.columnSchema)).as("identity")
    val typed = records.select(
      col("action"), col("xid"), col("lsn"), col("nextlsn"), col("timestamp"),
      col("schema"), col("table"), col("columns"), identityCol, col("pk")).as[WalModel.Record]

    val timeoutConf =
      if (staleTxTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    typed.groupByKey(_.xid)
      .flatMapGroupsWithState[Buf, AssembledTx](OutputMode.Append(), timeoutConf) {
        (xid: Long, it: Iterator[WalModel.Record], state: GroupState[Buf]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var buf: List[WalModel.Record] = state.getOption.map(_.records.toList).getOrElse(Nil)
            val out = Seq.newBuilder[AssembledTx]
            // Restore WAL order: the group iterator is shuffle-ordered, not
            // wire-ordered; lsn is monotonic within a tx (B lowest, C highest).
            // Sort ONLY when every record's lsn parses — a feed where B/C
            // carry lsn but data records don't would otherwise sort the data
            // records first (MinValue key) and B's buffer reset would drop
            // them. Unsortable groups keep arrival order (the pre-shuffle
            // contract a single-partition feed provides). Equal-lsn ties
            // rank B before data before C so a marker never resets past its
            // own transaction's rows.
            val recs = it.toVector
            def rank(a: String): Int = a match { case "B" => 0; case "C" => 2; case _ => 1 }
            val ordered =
              if (recs.forall(r => Lsn.tryParseOpt(r.lsn).isDefined))
                recs.sortBy(r => (Lsn.parse(r.lsn), rank(r.action)))
              else recs
            ordered.foreach { r =>
              r.action match {
                case "B" => buf = Nil // begin: reset (idempotent on dup B)
                case "C" =>
                  // emit only non-empty txs (replicator.go:196-202)
                  if (buf.nonEmpty)
                    out += AssembledTx(Lsn.parse(r.lsn), xid, buf.reverse)
                  buf = Nil
                case _ => buf = r :: buf // I/U/D accumulate
              }
            }
            if (buf.isEmpty) state.remove()
            else {
              state.update(Buf(buf))
              if (staleTxTimeoutMs > 0) state.setTimeoutDuration(staleTxTimeoutMs)
            }
            out.result().iterator
          }
      }
  }

  /** Raw record-per-line JSON text → assembled txs (decode + assemble). */
  def assembleLines(lines: DataFrame, staleTxTimeoutMs: Long = 0L): Dataset[AssembledTx] = {
    val valueCol = lines.columns.headOption.getOrElse("value")
    val recs = lines.select(
      from_json(col(valueCol), WalModel.recordSchema).as("r"))
      .where(col("r").isNotNull)
      .select(col("r.*"))
    assemble(recs, staleTxTimeoutMs)
  }
}
