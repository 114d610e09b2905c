package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered-step conversion funnel over an event stream: stage k is reached
 * at the user's earliest `steps(k)` event strictly after their stage-k−1
 * time (optionally within `withinSeconds` of it).
 *
 * Shape chosen for scale: one hash aggregation per stage keyed on the
 * user, each joined against the (already aggregated, one-row-per-user)
 * previous stage — so every shuffle moves at most one row per user, never
 * the raw event volume, and each stage's filter (`event_type = step`)
 * pushes down to the scan. The alternative — collect_list of each user's
 * full event history and a driver-side fold — moves the whole stream and
 * caps out at the biggest user's history; this form doesn't.
 */
object Funnel {

  /** Per-user stage times: one row per user that completed ALL stages,
    * columns t0..t(n-1). Intermediate stage frames via [[stageFrames]]. */
  def stageFrames(events: DataFrame, steps: Seq[String],
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts",
                  withinSeconds: Option[Long] = None): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    steps.zipWithIndex.foldLeft(Vector.empty[DataFrame]) { case (acc, (step, i)) =>
      val e = events.where(col(typeCol) === step)
      val frame =
        if (i == 0) e.groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
        else {
          val within = withinSeconds.fold(lit(true))(w =>
            col(tsCol) <= col(s"t${i - 1}") + expr(s"INTERVAL $w SECOND"))
          val carried = (0 until i).map(j => max(col(s"t$j")).as(s"t$j"))
          e.join(acc.last, userCol)
            .where(col(tsCol) > col(s"t${i - 1}") && within)
            .groupBy(col(userCol))
            .agg(min(col(tsCol)).as(s"t$i"), carried: _*)
        }
      acc :+ frame
    }
  }

  /** Funnel summary: (step, stage, n_users) per stage, stage-ordered. */
  def counts(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts",
             withinSeconds: Option[Long] = None): DataFrame =
    stageFrames(events, steps, userCol, typeCol, tsCol, withinSeconds)
      .zipWithIndex.map { case (df, i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(steps(i)).as("step"), lit(i.toLong).as("stage"), col("n_users"))
      }
      .reduce(_ unionAll _)
      .orderBy("stage")
}
