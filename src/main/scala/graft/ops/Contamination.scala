package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark-contamination detection: flag training documents whose
 * word n-grams collide with an evaluation/benchmark corpus (the standard
 * pretraining decontamination pass — e.g. the 13-gram overlap check of
 * GPT-3's appendix, here with a configurable n).
 *
 * Scale design (100 TB):
 *  - shingles are hashed to a 61-bit value (NgramHashes' rolling
 *    polynomial hash mod the Mersenne prime 2^61-1) before the join, so
 *    the shuffle carries 8-byte keys, never the n-gram text (the report
 *    emits COUNTS, not hashes, so the key only has to discriminate:
 *    P(any train↔eval collision) at 10^9 distinct shingles per side is
 *    ~4e-1 on the 2^61 space — switch `hashCol` to md5 well before the
 *    corpus approaches that);
 *  - per-document shingles are DISTINCT'd before joining (bounds the join
 *    input at one row per (doc, distinct shingle));
 *  - the eval side is tiny relative to the corpus — broadcast it when it
 *    fits (`broadcastEval = true`); at eval sets beyond executor memory,
 *    flip to the shuffled join: both sides are already reduced to hashed
 *    keys, so it's a 32-bytes-per-row hash join either way.
 *
 * Shingle semantics match [[TextAnalysis.shingles]]: a document with
 * fewer than `n` tokens contributes its whole text as one shingle, so
 * short eval items still contaminate exact copies.
 */
object Contamination {

  /**
   * Per-training-document contamination report:
   * (doc_id, n_shingles, n_contaminated, contaminated) where n_shingles
   * counts distinct n-grams, n_contaminated those also present anywhere
   * in `evalDocs`, and contaminated is the 0/1 drop flag.
   */
  def flagOverlap(trainDocs: DataFrame, evalDocs: DataFrame, n: Int = 8,
                  idCol: String = "doc_id", textCol: String = "text",
                  broadcastEval: Boolean = true): DataFrame = {
    // ngram_hashes ≡ xxhash-of-shingles semantically (same grams, 64-bit
    // keys) but runs as ONE codegen'd O(chars) loop per document — the
    // shingle strings are never materialized (spec-proven gram-equal to
    // TextAnalysis.shingles)
    def hashedShingles(docs: DataFrame, cols: Seq[String]) =
      docs.select((cols.map(col) :+
          explode(graft.functions.NgramHashes(col(textCol), n)).as("h")): _*)
        .distinct()

    val train = hashedShingles(trainDocs, Seq(idCol))
    val eval0 = hashedShingles(evalDocs, Seq.empty).withColumn("hit", lit(1L))
    val evalSide = if (broadcastEval) broadcast(eval0) else eval0

    train.join(evalSide, Seq("h"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
           sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contaminated", (col("n_contaminated") > 0).cast("int"))
  }

  /**
   * Embedding-space decontamination: for each EVAL vector, count the
   * training vectors whose cosine similarity clears `threshold` and
   * report the closest one — the semantic twin of [[flagOverlap]] for
   * paraphrased leakage the n-gram check can't see (public recipe, e.g.
   * the GPT-4 / phi series technical reports).
   *
   * Scale shape: the eval set is the SMALL side by construction
   * (benchmarks are thousands of rows, the corpus is the 100 TB side),
   * so it is broadcast and the similarity test runs as a single narrow
   * pass over the training corpus — no shuffle of corpus rows at all;
   * the only exchange is the per-(eval, match) pairs feeding a tiny
   * aggregation keyed by eval id. Cosine reuses the codegen'd
   * [[graft.ops.Similarity.cosine]] dot/norm expressions.
   *
   * Returns one row per CONTAMINATED eval vector:
   * (eval_id, n_near, max_sim) — eval vectors with no match above the
   * threshold are absent (their nearest-neighbor distance is the ANN
   * queries' job, not the decontamination gate's).
   */
  def embedOverlap(train: DataFrame, evalVecs: DataFrame, threshold: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val t = train.select(col(idCol).as("train_id"), col(vecCol).as("__tv"))
    val e = evalVecs.select(col(idCol).as("eval_id"), col(vecCol).as("__ev"))
    val sim = graft.ops.Similarity.cosine(col("__tv"), col("__ev"))
    t.join(broadcast(e), sim >= threshold)
      .select(col("eval_id"), sim.as("sim"))
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_near"), round(max(col("sim")), 6).as("max_sim"))
  }
}
