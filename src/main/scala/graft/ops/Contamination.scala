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
 *  - shingles are hashed to a 128-bit md5 before the join, so the shuffle
 *    carries 32-byte keys, never the n-gram text;
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
    def hashedShingles(docs: DataFrame, cols: Seq[String]) =
      docs.select((cols.map(col) :+
          explode(TextAnalysis.shingles(col(textCol), n)).as("sh")): _*)
        .select((cols.map(col) :+ md5(col("sh")).as("h")): _*)
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
}
