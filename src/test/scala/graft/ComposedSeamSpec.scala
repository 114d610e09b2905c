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
 *  2. Span exactness on the artifact: each stored id becomes a document
 *     of 12 consecutive tokens w(id)..w(id+11), so window multiplicity
 *     is a sharp function of WHICH ids survived — a single wrongly
 *     dropped/kept/duplicated record changes span extents. The spans and
 *     strips computed from the pipeline's artifacts must equal those
 *     computed from an independently constructed corpus over the same
 *     id set (generator predicate minus observed pending) — covering
 *     artifact round-trip quirks (schema, types, window partitioning of
 *     the store) that the count gates cannot see.
 */
class ComposedSeamSpec extends SparkSpec {

  private def listParquetDirs(root: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!Files.exists(root)) Seq.empty
    else graft.core.FsUtil.listDir(root)

  /** doc per id: 12 consecutive synthetic tokens — L=8 gives 5 windows
    * per doc and every window is shared with up to 4 id-neighbors. */
  private def docsOf(ids: DataFrame): DataFrame = {
    val toks = (0 to 11).map(j => concat(lit("w"), (col("id") + lit(j)).cast("long")))
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

    val storedIds = listParquetDirs(Paths.get(store))
      .map(p => spark.read.parquet(p.toString).select(col("id").cast("long")))
      .reduce(_.unionByName(_))
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
    def spans(ids: DataFrame): Seq[(Long, Long, Long, Long)] =
      Dedup.duplicateSpans(docsOf(ids), windowTokens = 8)
        .orderBy("doc_id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    def strips(ids: DataFrame): Seq[(Long, String, Long)] =
      Dedup.stripDuplicateSpans(docsOf(ids), windowTokens = 8)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    val artifactSpans = spans(storedIds.toDF("id"))
    assert(artifactSpans == spans(cleanIds), "spans diverge through the seam")
    assert(artifactSpans.nonEmpty,
      "consecutive surviving ids must produce duplicate spans")
    val artifactStrips = strips(storedIds.toDF("id"))
    assert(artifactStrips == strips(cleanIds), "strips diverge through the seam")
    // the strip must actually remove tokens (neighboring docs overlap)
    assert(artifactStrips.map(_._3).sum > 0)

    graft.core.FsUtil.deleteRecursive(Paths.get(base))
  }
}
