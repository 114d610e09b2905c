package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for training-data pipelines: the GPT-style
 * concat-and-chunk layout. Documents are concatenated in `idCol` order
 * into one global token stream, which is cut into fixed-length training
 * sequences of `seqLen` tokens; each document's placement is described by
 * its global token offset and the sequence ids it spans.
 *
 * Scale design (100 TB): the naive formulation is a running sum over a
 * single global ORDER BY — a one-partition window that serializes the
 * whole corpus through one task. This implementation is the standard
 * two-phase distributed prefix sum instead:
 *
 *   1. block-local running sums — window partitioned by a block key
 *      (`idCol div blockSize`), so every partition works independently;
 *   2. block offsets — per-block totals (one row per block) prefix-summed
 *      with a window over the tiny block table (#blocks rows, i.e.
 *      corpus/blockSize — driver-scale, not data-scale), broadcast-joined
 *      back onto the block-local sums.
 *
 * The only data-scale shuffle is the block-key repartition; the global
 * ordering never sits in one task. Results are identical to the
 * one-partition window (prefix sums are associative), which is what the
 * SQL oracle computes.
 */
object Packing {

  /**
   * Per-document packing spans: (doc_id, n_tokens, start_off, end_off,
   * first_seq, last_seq, n_seqs) for sequences of `seqLen` tokens.
   * Zero-token documents occupy no span: their end_off = start_off - 1
   * and n_seqs = 0 (first_seq/last_seq still index the cut point).
   */
  def packedSpans(docs: DataFrame, seqLen: Int, idCol: String = "doc_id",
                  textCol: String = "text", blockSize: Long = 1024L): DataFrame = {
    require(seqLen > 0 && blockSize > 0, "seqLen and blockSize must be positive")
    val base = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
      // integer div, not double division: ids beyond 2^53 would round
      expr(s"CAST($idCol AS BIGINT) div $blockSize").as("blk"))

    // phase 1: block-local exclusive prefix sums (scales with executors)
    val wIntra = Window.partitionBy("blk").orderBy("doc_id")
    val intra = base.withColumn("intra_off",
      coalesce(sum("n_tokens").over(wIntra), lit(0L)) - col("n_tokens"))

    // phase 2: exclusive prefix over per-block totals — #blocks rows, so
    // the unpartitioned window is O(corpus / blockSize), not O(corpus)
    val wBlk = Window.orderBy("blk")
    val blkOff = base.groupBy("blk").agg(sum("n_tokens").as("blk_tokens"))
      .withColumn("blk_off", coalesce(sum("blk_tokens").over(wBlk), lit(0L)) - col("blk_tokens"))
      .select("blk", "blk_off")

    intra.join(broadcast(blkOff), "blk")
      .withColumn("start_off", col("intra_off") + col("blk_off"))
      .withColumn("end_off", col("start_off") + col("n_tokens") - 1)
      .withColumn("first_seq", expr(s"start_off div $seqLen"))
      .withColumn("last_seq", expr(s"end_off div $seqLen"))
      .withColumn("n_seqs",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(col("last_seq") - col("first_seq") + 1))
      .select("doc_id", "n_tokens", "start_off", "end_off",
              "first_seq", "last_seq", "n_seqs")
  }
}
