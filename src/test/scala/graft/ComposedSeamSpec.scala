package graft

import graft.engine.{EventTimeWindows, LocalContentStore, StreamPipeline}
import graft.ops.Dedup
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-time ingest × dup-span COMPOSITION seam (r15 verdict task 6):
 * the two families are individually hardened at the third decade — this
 * pins that their contracts hold THROUGH the pipeline seam, on one
 * composed run:
 *
 *   hostile-late spool → StreamPipeline (event-time windows, drops) →
 *   published vault artifacts → documents derived per stored row →
 *   duplicateSpans / stripDuplicateSpans
 *
 * Gates:
 *  1. ID-granular conservation (STRONGER than IngestBench's count gate):
 *     stored ∪ pending ids == fed ids minus the generator's dropped-late
 *     set, with stored and pending disjoint.
 *  2. Span exactness on the artifact, CONTENT-BEARING (r16 verdict):
 *     each stored ROW becomes a document whose tokens derive from the
 *     PAYLOAD columns — the 12 consecutive w-tokens from the tx/i
 *     parsed out of `name`, plus a 13th token encoding `v` — not from
 *     the id column alone. The spans and strips computed from the
 *     pipeline's artifacts must equal those computed from an
 *     independently constructed corpus over the same id set (generator
 *     predicate minus observed pending), so the gate detects VALUE
 *     corruption through the artifact seam (schema, types, encoding,
 *     window partitioning of the store), not just id-set/duplication
 *     drift gate 1 mostly covers. A negative arm perturbs one stored
 *     row's `v` (and one `name`) and asserts the gate flips.
 */
class ComposedSeamSpec extends SparkSpec {

  private def listParquetDirs(root: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!Files.exists(root)) Seq.empty
    else graft.core.FsUtil.listDir(root)

  /** doc per stored ROW, payload-derived: k is parsed from `name`
    * ("row-<tx>-<i>-payload-…" → tx*RecordsPerTx+i, == id only when the
    * payload survived the seam intact), the 12 consecutive w(k)..w(k+11)
    * tokens give 5 shared windows per doc at L=8, and a 13th token
    * encodes `v` (v = (id%1000)+0.25 ⇒ v*100 exact in double). The
    * v-window is a singleton (its w-tokens are id-unique) so the v token
    * always survives the strip — any v corruption shows in
    * `text_stripped` even when span extents are unchanged. */
  private def docsOfRows(rows: DataFrame): DataFrame = {
    val tx = regexp_extract(col("name"), "^row-(\\d+)-(\\d+)-", 1).cast("long")
    val i = regexp_extract(col("name"), "^row-(\\d+)-(\\d+)-", 2).cast("long")
    val k = tx * lit(IngestBench.RecordsPerTx.toLong) + i
    val toks = (0 to 11).map(j => concat(lit("w"), (k + lit(j)).cast("long"))) :+
      concat(lit("v"), (col("v") * 100).cast("long"))
    rows.select(col("id").cast("long").as("doc_id"),
      concat_ws(" ", toks: _*).as("text"))
  }

  /** The independent construction of the same documents from the id set
    * alone (the generator's payload is a pure function of id). */
  private def docsOfIds(ids: DataFrame): DataFrame = {
    val toks = (0 to 11).map(j => concat(lit("w"), (col("id") + lit(j)).cast("long"))) :+
      concat(lit("v"), (col("id") % 1000) * 100 + 25)
    ids.select(col("id").cast("long").as("doc_id"),
      concat_ws(" ", toks: _*).as("text"))
  }

  test("hostile event-time ingest composes exactly with dup-span strip") {
    val nTx = 2000L
    val base = Files.createTempDirectory("graft_composed_").toString
    val wal = s"$base/wal"; val store = s"$base/store"
    IngestBench.genSpool(wal, nTx, files = 4, eventTimed = true, hostile = true)
    val q = StreamPipeline.start(spark, "composed", IngestBench.schemas, wal,
      s"$base/staging", s"$base/ckpt", new LocalContentStore(store),
      availableNow = true, maxTxPerTrigger = Some((nTx / 10).toInt),
      singleFile = false,
      // windowSeconds = half a batch's timestamp span: the opening
      // window is closed before the first hostile-late record arrives
      eventTime = Some(EventTimeWindows(windowSeconds = (nTx / 20) max 1,
        latenessSeconds = 0L)))
    q.awaitTermination(600000L)

    val storedRows = listParquetDirs(Paths.get(store))
      .map(p => spark.read.parquet(p.toString)
        .select(col("id").cast("long"), col("name"), col("v")))
      .reduce(_.unionByName(_))
    val storedIds = storedRows.select("id")
    val pendingRoot = Paths.get(s"$base/staging", "pending")
    val pendingDirs = listParquetDirs(pendingRoot).filter(Files.isDirectory(_))
      .flatMap(t => graft.core.FsUtil.listDir(t)).filter(Files.isDirectory(_))
      .flatMap(b => graft.core.FsUtil.listDir(b))
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("__wstart="))
    val pendingIds = pendingDirs
      .map(ws => spark.read.parquet(ws.toString).select(col("id").cast("long")))
      .reduceOption(_.unionByName(_))
      .getOrElse(spark.range(0).select(col("id")))

    val stored = storedIds.collect().map(_.getLong(0)).toSet
    val pending = pendingIds.collect().map(_.getLong(0)).toSet
    val rpt = IngestBench.RecordsPerTx
    val expected = (0L until nTx).filterNot(IngestBench.hostileLateTx(_, nTx))
      .flatMap(tx => (0 until rpt).map(tx * rpt + _.toLong)).toSet

    // gate 1: ID-granular conservation through the seam
    assert((stored & pending).isEmpty, "stored and pending must be disjoint")
    assert(stored ++ pending == expected,
      s"stored(${stored.size}) + pending(${pending.size}) != " +
        s"expected(${expected.size}); " +
        s"missing=${(expected -- stored -- pending).take(5)} " +
        s"extra=${((stored ++ pending) -- expected).take(5)}")
    assert(stored.nonEmpty && pending.nonEmpty,
      "composition needs both published windows and a pending tail")

    // gate 2: span exactness on the pipeline's artifacts vs the
    // independently constructed corpus over the same ids
    import spark.implicits._
    val cleanIds = (expected -- pending).toSeq.sorted.toDF("id")
    def spans(docs: DataFrame): Seq[(Long, Long, Long, Long)] =
      Dedup.duplicateSpans(docs, windowTokens = 8)
        .orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    def strips(docs: DataFrame): Seq[(Long, String, Long)] =
      Dedup.stripDuplicateSpans(docs, windowTokens = 8)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    val artifactSpans = spans(docsOfRows(storedRows))
    assert(artifactSpans == spans(docsOfIds(cleanIds)),
      "spans diverge through the seam")
    assert(artifactSpans.nonEmpty,
      "consecutive surviving ids must produce duplicate spans")
    val artifactStrips = strips(docsOfRows(storedRows))
    assert(artifactStrips == strips(docsOfIds(cleanIds)),
      "strips diverge through the seam")
    // the strip must actually remove tokens (neighboring docs overlap)
    assert(artifactStrips.map(_._3).sum > 0)

    // negative arm: the gate must be CONTENT-bearing — perturbing one
    // stored row's payload (same id set!) has to flip the equality
    val victim = stored.head
    val badV = storedRows.withColumn("v",
      when(col("id") === victim, col("v") + 1).otherwise(col("v")))
    assert(strips(docsOfRows(badV)) != artifactStrips,
      "gate 2 failed to detect a perturbed v payload value")
    val badName = storedRows.withColumn("name",
      when(col("id") === victim,
        concat(lit("row-999999-0-payload-x"))).otherwise(col("name")))
    assert(strips(docsOfRows(badName)) != artifactStrips,
      "gate 2 failed to detect a perturbed name payload value")

    graft.core.FsUtil.deleteRecursive(Paths.get(base))
  }
}
