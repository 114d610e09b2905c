package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ordered-step conversion funnel over an event stream: stage k is reached
 * at the user's earliest `steps(k)` event strictly after their stage-k−1
 * time (optionally within `withinSeconds` of it).
 *
 * Shape chosen for scale: ONE shuffle. Events are hash-partitioned by
 * user once, then every stage time is a conditional `min` over the user's
 * window partition — stage k's predicate references the stage-k−1 column
 * computed by the previous window pass, so the whole cascade runs in a
 * single exchange with k window aggregates over the same partitioning
 * (Catalyst reuses the sort/exchange; `.explain` shows one Exchange).
 * The naive formulation — one filtered aggregation per stage, each
 * joined back to the previous stage's frame — scans the event table k
 * times and shuffles k times; this form scans and shuffles once. Window
 * state is bounded per user and Tungsten sorts spill, so a hot user
 * degrades to disk, not OOM.
 */
object Funnel {

  /** Event-level frame carrying per-user stage times t0..t(n-1) (every
    * event row of a user sees the same stage times). */
  private def withStageTimes(events: DataFrame, steps: Seq[String],
                             userCol: String, typeCol: String, tsCol: String,
                             withinSeconds: Option[Long]): DataFrame = {
    val w = Window.partitionBy(userCol)
    steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else {
          val within = withinSeconds.fold(lit(true))(s =>
            col(tsCol) <= col(s"t${i - 1}") + expr(s"INTERVAL $s SECOND"))
          col(typeCol) === step && col(s"t${i - 1}").isNotNull &&
            col(tsCol) > col(s"t${i - 1}") && within
        }
      df.withColumn(s"t$i", min(when(cond, col(tsCol))).over(w))
    }
  }

  /** Per-user stage times: one row per user that completed ALL stages,
    * columns t0..t(n-1); intermediate completion via [[stageFrames]]. */
  def stageFrames(events: DataFrame, steps: Seq[String],
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts",
                  withinSeconds: Option[Long] = None): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val staged = withStageTimes(events, steps, userCol, typeCol, tsCol, withinSeconds)
    val tCols = steps.indices.map(i => col(s"t$i"))
    val perUser = staged
      .groupBy(col(userCol))
      .agg(tCols.zipWithIndex.map { case (c, i) => max(c).as(s"t$i") }.head,
           tCols.zipWithIndex.map { case (c, i) => max(c).as(s"t$i") }.tail: _*)
    steps.indices.map { i =>
      perUser.where(col(s"t$i").isNotNull)
        .select(col(userCol) +: (0 to i).map(j => col(s"t$j")): _*)
    }
  }

  /** Funnel summary: (step, stage, n_users) per stage, stage-ordered —
    * one scan, one shuffle, one aggregation. */
  def counts(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts",
             withinSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val staged = withStageTimes(events, steps, userCol, typeCol, tsCol, withinSeconds)
    // one row per user (stage times are constant over the partition),
    // then count non-null stage times
    val perUser = staged.groupBy(col(userCol))
      .agg(max(col("t0")).as("t0"),
        steps.indices.drop(1).map(i => max(col(s"t$i")).as(s"t$i")): _*)
    val stageCounts = perUser.agg(
      count(col("t0")).as("n0"),
      steps.indices.drop(1).map(i => count(col(s"t$i")).as(s"n$i")): _*)
    // pivot the single stats row into one row per stage with stack() —
    // a per-stage select + union would recompute the whole pipeline
    // once per branch (no cross-branch subtree sharing in Catalyst)
    val stackArgs = steps.zipWithIndex.map { case (step, i) =>
      s"'${step.replace("'", "''")}', ${i}L, n$i"
    }.mkString(", ")
    stageCounts
      .select(expr(s"stack(${steps.length}, $stackArgs) AS (step, stage, n_users)"))
      .orderBy("stage")
  }
}
