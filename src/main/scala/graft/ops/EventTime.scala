package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-time windowed aggregation over the event stream.
 *
 * The reference only has processing-time buffer rotation (SURVEY §2.12:
 * "no watermarks, no event-time"); a wal2json record's `timestamp` is
 * carried but never used. This module is the Spark-first upgrade: the
 * same `window()` aggregation works in batch (oracle-checked) and in
 * Structured Streaming with a watermark bounding state.
 *
 * Scale shape: tumbling-window aggregation is a hash aggregate keyed on
 * (window, keys) with map-side partials; streaming state per open window
 * is bounded by the watermark delay.
 */
object EventTime {

  /** Tumbling event-time windows with per-window aggregates. Works on a
    * batch or streaming DataFrame alike. */
  def tumblingStats(events: DataFrame, tsCol: String = "ts",
                    windowLength: String = "1 day",
                    watermarkDelay: Option[String] = None): DataFrame = {
    val in = watermarkDelay.fold(events)(d => events.withWatermark(tsCol, d))
    in.groupBy(window(col(tsCol), windowLength).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("w.start").as("window_start"), col("n_events"),
              col("sum_value"), col("approx_users"))
  }

  /**
   * Sessionization: per-user session windows with an inactivity gap.
   * Batch and streaming alike (`session_window` merges in streaming state
   * under a watermark). Boundary semantics: an event extends a session
   * iff it arrives strictly within `gap` of the previous event —
   * identical to the gaps-and-islands SQL formulation with `diff >= gap`
   * starting a new session.
   */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   tsCol: String = "ts", keyCol: String = "user_id",
                   watermarkDelay: Option[String] = None): DataFrame = {
    val in = watermarkDelay.fold(events)(d => events.withWatermark(tsCol, d))
    in.groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("w.start").as("session_start"), col("n_events"))
  }

  /**
   * Stream-stream interval join: each purchase matched to the same
   * user's clicks within `maxLag` BEFORE it. Works identically on batch
   * DataFrames and on two watermarked streams — the time bound plus the
   * watermarks let Structured Streaming expire join state (a click can
   * stop waiting for purchases once the purchase watermark passes
   * click.ts + maxLag), so state is bounded at any scale.
   */
  def clickAttribution(purchases: DataFrame, clicks: DataFrame,
                       maxLag: String = "1 hour",
                       watermarkDelay: Option[String] = None): DataFrame = {
    val p0 = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id"))
    val c0 = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("event_id").as("click_id"))
    val p = watermarkDelay.fold(p0)(d => p0.withWatermark("p_ts", d))
    val c = watermarkDelay.fold(c0)(d => c0.withWatermark("c_ts", d))
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $maxLag"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("p_ts"), col("click_id"), col("c_ts"))
  }

  /** Per-key top-k within event-time windows (windowed ranking). */
  def windowedTopUsers(events: DataFrame, k: Int,
                       windowLength: String = "1 day"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = events
      .groupBy(window(col("ts"), windowLength).as("w"), col("user_id"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("user_value"))
    val rk = Window.partitionBy("w").orderBy(col("user_value").desc, col("user_id"))
    per.withColumn("rank", row_number().over(rk).cast("long"))
      .where(col("rank") <= k)
      .select(col("w.start").as("window_start"), col("rank"), col("user_id"),
              col("user_value"))
  }
}
