package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Streaming corpus-quality monitor: event-time windowed quality
 * aggregates over a document feed, plus a drift report that flags
 * sources whose quality-gate pass rate moves away from its own trailing
 * history — the ingest alarm a production pretraining pipeline runs on
 * every crawl/source feed (an upstream scraper change shows up here
 * hours before it shows up as a loss spike).
 *
 * Scale shape: the windowed aggregate is a hash aggregate keyed on
 * (window, source) with map-side partials — per-doc quality columns are
 * narrow codegen'd expressions ([[TextAnalysis.gopherKeep]],
 * [[TextAnalysis.tokenCount]]), so state per open window is a handful
 * of longs per source, bounded by the watermark. The drift pass runs
 * over the FINALIZED window aggregates (thousands of rows per day, not
 * corpus-scale), as a per-source ordered window — batch over the
 * monitor's sink, or incrementally in `foreachBatch`.
 */
object QualityMonitor {

  /**
   * Per (event-time window, source) quality aggregates; batch and
   * streaming alike (append mode with a watermark in streaming). Exact
   * integer sums; the pass rate is the one double division.
   */
  def windowedQuality(docs: DataFrame, tsCol: String = "ts",
                      sourceCol: String = "source", textCol: String = "text",
                      windowLength: String = "1 hour",
                      watermarkDelay: Option[String] = None): DataFrame = {
    val in = watermarkDelay.fold(docs)(d => docs.withWatermark(tsCol, d))
    val text = col(textCol)
    in.groupBy(window(col(tsCol), windowLength).as("w"), col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.gopherKeep(text).cast("long")).as("n_keep"),
        sum(TextAnalysis.tokenCount(text)).as("n_tokens"))
      .select(col("w.start").as("window_start"), col(sourceCol),
        col("n_docs"), col("n_keep"), col("n_tokens"),
        (col("n_keep").cast("double") / col("n_docs")).as("keep_rate"))
  }

  /**
   * Drift report over finalized windows: each window's keep rate vs the
   * mean of that source's `trail` PRECEDING windows; `drift` is the
   * signed deviation and `alert` fires beyond `delta`. Windows without
   * enough history (the first `trail` per source) report no alert.
   */
  def driftReport(windowed: DataFrame, trail: Int = 3, delta: Double = 0.2,
                  sourceCol: String = "source"): DataFrame = {
    val w = Window.partitionBy(sourceCol).orderBy("window_start")
      .rowsBetween(-trail, -1)
    val baseline = avg(col("keep_rate")).over(w)
    val nPrior = count(lit(1)).over(w)
    windowed
      .withColumn("baseline_rate", when(nPrior >= trail, baseline))
      .withColumn("drift", col("keep_rate") - col("baseline_rate"))
      .withColumn("alert",
        (coalesce(abs(col("drift")) > lit(delta), lit(false))).cast("int"))
  }
}
