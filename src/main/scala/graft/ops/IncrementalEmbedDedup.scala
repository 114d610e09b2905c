package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental embedding near-dup detection — the vector-space sibling of
 * [[IncrementalDedup]]: each micro-batch is checked against every
 * previously-seen vector through a persistent sign-LSH bucket index,
 * with candidates verified by EXACT cosine (precision 1.0, like
 * [[Similarity.cosineNearDupPairs]]), then appended to the index.
 *
 * Scale shape: the index holds (tbl, bucket, vec_id, embedding, nrm) —
 * the batch-vs-index probe is an equi-join on (tbl, bucket) with the
 * (small) batch side carrying its own vectors, so the index never
 * shuffles; bucketing the index files on `bucket` makes the probe
 * co-located. The index stores the vector once per hash table — at
 * extreme scale, store a vec_id → embedding table once and keep the
 * index rows to (tbl, bucket, vec_id), paying one extra id-keyed join
 * per batch (or store int8-quantized vectors and re-rank borderline
 * candidates against the full-precision table).
 *
 * Exactly-once caveat mirrors [[IncrementalDedup]]: a retried batch can
 * append its buckets twice. Both candidate joins keep only
 * strictly-lower `prior_id`s ("lower id = earlier"), so `dup_of` is a
 * pure function of the set of vectors seen — a replayed batch returns
 * byte-identical annotations; [[compactIndex]] dedupes the
 * double-appended index rows offline.
 */
final class IncrementalEmbedDedup(indexDir: String, threshold: Double,
                                  nBits: Int = 6, nTables: Int = 16, dims: Int = 64,
                                  idCol: String = "vec_id", vecCol: String = "embedding") {
  import Similarity.{dot, norm}

  /** None only when the index has never been written (missing path).
    * A present-but-unreadable index must FAIL the batch — silently
    * treating it as empty would report zero duplicates forever. */
  private def readIndex(spark: SparkSession): Option[DataFrame] = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None else Some(spark.read.parquet(indexDir))
  }

  private def bucketsOf(vecs: DataFrame): DataFrame =
    vecs.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"),
      posexplode(graft.functions.SignLshBuckets(col(vecCol), nTables, nBits, dims))
        .as(Seq("tbl", "bucket")))

  /** 1-bit multiprobe on the PROBE side only (the index keeps exact
    * buckets): catches pairs within Hamming distance 1 per table. */
  private def probesOf(buckets: DataFrame): DataFrame = {
    val flips = (0 until nBits).map(b => col("bucket").bitwiseXOR(lit(1L << b)))
    buckets.withColumn("bucket", explode(array(col("bucket") +: flips: _*)))
  }

  /**
   * Process one batch: returns the batch annotated with `dup_of`
   * (lowest-id earlier near-dup at cosine ≥ threshold, or NULL),
   * considering the persisted index and earlier rows of the same batch;
   * then appends the batch's buckets to the index.
   */
  def processBatch(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    val buckets = bucketsOf(vecs).cache()
    val probes = probesOf(buckets)
      .select(col(idCol), col(vecCol).as("__v"), col("nrm").as("__n"),
        col("tbl"), col("bucket"))

    def verified(cands: DataFrame): DataFrame = cands
      .where(dot(col("__v"), col("prior_v")) / (col("__n") * col("prior_n")) >= threshold)
      .select(col(idCol), col("prior_id"))

    // vs earlier batches (persisted index carries its vectors); a
    // retried batch re-reads its own appended buckets, so keep only
    // strictly-lower ids — same "lower id = earlier" precedence as the
    // within-batch pass — which makes a replayed batch idempotent
    // (without it every replayed row "dups" itself at cosine 1.0)
    val vsIndex = readIndex(spark) match {
      case Some(idx) =>
        val prior = idx.select(col("tbl"), col("bucket"),
          col(idCol).as("prior_id"), col(vecCol).as("prior_v"), col("nrm").as("prior_n"))
        verified(probes.join(prior, Seq("tbl", "bucket"))
          .where(col("prior_id") < col(idCol)))
      case None => spark.emptyDataFrame
          .withColumn(idCol, lit(null).cast("long"))
          .withColumn("prior_id", lit(null).cast("long"))
    }
    // vs earlier rows of this batch (lower id = earlier)
    val base = buckets.select(col("tbl"), col("bucket"),
      col(idCol).as("prior_id"), col(vecCol).as("prior_v"), col("nrm").as("prior_n"))
    val within = verified(
      probes.join(base, Seq("tbl", "bucket"))
        .where(col("prior_id") < col(idCol)))

    val dupOf = vsIndex.unionByName(within)
      .groupBy(idCol).agg(min("prior_id").as("dup_of"))

    val annotated = vecs.join(dupOf, Seq(idCol), "left")
    buckets.write.mode("append").parquet(indexDir)
    buckets.unpersist()
    annotated
  }

  /** Dedupe index rows double-appended by retried batches: keep one row
    * per (tbl, bucket, id). Rewrites via a sibling dir + rename so a
    * crash mid-compaction leaves either the old or the new index whole. */
  def compactIndex(spark: SparkSession): Unit = readIndex(spark).foreach { idx =>
    val tmp = new Path(indexDir + ".compact")
    val dst = new Path(indexDir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true)
    idx.dropDuplicates("tbl", "bucket", idCol).write.parquet(tmp.toString)
    val old = new Path(indexDir + ".old")
    fs.delete(old, true)
    if (!fs.rename(dst, old) || !fs.rename(tmp, dst))
      sys.error(s"compactIndex: rename failed for $indexDir")
    fs.delete(old, true)
  }

  /** Streaming entry: annotate each micro-batch, write results out.
    * With `compactEvery` > 0, the index is compacted after every Nth
    * batch (cheap: the index is re-read next batch anyway, and
    * compaction keeps retried-batch double-appends from accumulating
    * over a long-lived stream). */
  def start(vecsStream: DataFrame, outDir: String, checkpointDir: String,
            availableNow: Boolean = true,
            compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val trigger =
      if (availableNow) org.apache.spark.sql.streaming.Trigger.AvailableNow()
      else org.apache.spark.sql.streaming.Trigger.ProcessingTime(10000L)
    vecsStream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch).write.mode("append").parquet(outDir)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          compactIndex(batch.sparkSession)
      }
      .start()
  }
}
