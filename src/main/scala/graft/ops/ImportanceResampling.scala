package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection (Data Selection via Importance Resampling,
 * Xie et al. 2023, public literature): score every raw document by how
 * much it looks like a small high-quality target corpus, using hashed
 * unigram features — the standard way to tilt a 100 TB crawl toward a
 * curated distribution without training a classifier.
 *
 * Features are hashed token buckets (`md5(term)` prefix mod `nBuckets`),
 * so the feature space is fixed-size regardless of vocabulary. Each
 * corpus yields a smoothed bucket distribution; a document's weight is
 * the average token log-likelihood ratio
 * `ln p_target(bucket) − ln p_raw(bucket)` with add-one smoothing.
 * Positive weight = looks more like the target than the raw average.
 *
 * Scale shape: both corpora reduce to ≤`nBuckets` count rows (a
 * broadcastable ratio table and two scalar totals); scoring is one
 * explode + broadcast join + hash-agg over the raw corpus — no shuffle
 * wider than the per-doc aggregation, nothing quadratic, no model
 * state. The target corpus is typically tiny (a curated sample) but
 * nothing requires it to fit in memory: only its bucket counts do.
 */
object ImportanceResampling {

  /** Stable cross-engine bucket id: first 6 hex digits of md5, mod
    * `nBuckets` (same trick the multimodal metadata oracle uses). */
  private def bucket(term: Column, nBuckets: Int): Column =
    conv(substring(md5(term), 1, 6), 16, 10).cast("long") % nBuckets

  private def words(df: DataFrame, idCol: String, textCol: String, nBuckets: Int): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .where(length(col("term")) > 0)
      .withColumn("bucket", bucket(col("term"), nBuckets))

  /**
   * Per-document importance weights of `raw` against `target`:
   * (idCol, n_tokens, weight), weight = avg over the doc's tokens of
   * the smoothed bucket log-ratio, rounded to 6 places.
   */
  def importanceWeights(raw: DataFrame, target: DataFrame, nBuckets: Int = 1024,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rawW = words(raw, idCol, textCol, nBuckets)
    val tgtW = words(target, idCol, textCol, nBuckets)
    // the ≤nBuckets count tables are each built in ONE corpus pass and
    // materialized (they are feature-space-sized); the scalar totals
    // derive from them exactly (nr = Σcr, nt = Σct) instead of
    // re-exploding their corpus (r19, guide §2.3) — that drops the
    // corpus-scale passes from 3×raw + 2×target to 2×raw + 1×target
    val cR = rawW.groupBy("bucket").agg(count(lit(1)).as("cr")).localCheckpoint()
    // raw tokens only ever probe buckets present in cR, so a left join
    // from cR covers every scored bucket; absent target buckets smooth
    // to ct=0
    val cT = tgtW.groupBy("bucket").agg(count(lit(1)).as("ct")).localCheckpoint()
    val ratio = cR.join(cT, Seq("bucket"), "left")
      .select(col("bucket"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val totals = cR.agg(sum("cr").as("nr"))
      .crossJoin(cT.agg(sum("ct").as("nt")))
    val b = lit(nBuckets.toLong)
    rawW
      .join(broadcast(ratio), "bucket")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(
          log((col("ct") + 1).cast("double") / (col("nt") + b).cast("double")) -
          log((col("cr") + 1).cast("double") / (col("nr") + b).cast("double"))), 6)
          .as("weight"))
  }

  /**
   * Keep approximately the top `fraction` of documents by weight, via a
   * weight threshold (exact percentile over the ≤1-row-per-doc weight
   * table) rather than a global sort — the scalable form: one agg for
   * the cut, one filter. Ties at the threshold are kept.
   */
  def resample(weights: DataFrame, fraction: Double,
               weightCol: String = "weight"): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction must be in (0,1], got $fraction")
    val cut = weights.agg(
      expr(s"percentile($weightCol, ${1.0 - fraction})").as("cut"))
    weights.crossJoin(broadcast(cut))
      .where(col(weightCol) >= col("cut"))
      .drop("cut")
  }

  /**
   * The faithful DSIR sampler: draw WITHOUT replacement with probability
   * ∝ exp(weight / temperature) via the Gumbel-top-k trick — rank by
   * `weight/temperature + Gumbel(doc)` and keep the top `fraction`.
   * The Gumbel noise is hash-derived (`u = md5(id) prefix / 16^6`,
   * `g = −ln(−ln u)`), so the "random" sample is reproducible across
   * runs, engines and partitionings — the same no-RNG-state discipline
   * as [[TextAnalysis.hashSample]]. Low temperature → approaches the
   * deterministic top-fraction of [[resample]]; high temperature →
   * approaches uniform sampling.
   */
  def resampleGumbel(weights: DataFrame, fraction: Double, temperature: Double = 1.0,
                     idCol: String = "doc_id", weightCol: String = "weight"): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction must be in (0,1], got $fraction")
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10)
      .cast("double") + lit(0.5)) / lit(16777216.0) // (0,1), never 0 or 1
    val score = col(weightCol) / lit(temperature) - log(-log(u))
    val cut = weights.select(score.as("s")).agg(
      expr(s"percentile(s, ${1.0 - fraction})").as("cut"))
    weights.withColumn("__s", score)
      .crossJoin(broadcast(cut))
      .where(col("__s") >= col("cut"))
      .drop("__s", "cut")
  }
}
