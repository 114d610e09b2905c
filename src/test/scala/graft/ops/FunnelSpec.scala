package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ordered-step funnel: strict ordering, per-stage windows, monotone
  * stage counts. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))

  test("stage reached only by events strictly after the previous stage") {
    val events = ev(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "buy", 300L), // full funnel
      (2L, "view", 100L), (2L, "click", 100L),                    // click NOT after view
      (3L, "click", 50L), (3L, "view", 100L),                     // click before view only
      (4L, "view", 100L)                                          // stalls at stage 0
    )
    val counts = Funnel.counts(events, Seq("view", "click", "buy"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(counts.toSeq == Seq(("view", 0L, 4L), ("click", 1L, 1L), ("buy", 2L, 1L)))
  }

  test("withinSeconds bounds each stage transition") {
    val events = ev(
      (1L, "view", 0L), (1L, "click", 50L),   // within 60 s → converts
      (2L, "view", 0L), (2L, "click", 500L))  // too late
    val counts = Funnel.counts(events, Seq("view", "click"), withinSeconds = Some(60L))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(counts.toSeq == Seq((0L, 2L), (1L, 1L)))
  }

  test("earliest qualifying event is the stage time (not any later one)") {
    // user re-views later; funnel must anchor at the FIRST view, so the
    // only click (between the two views) converts
    val events = ev(
      (1L, "view", 100L), (1L, "click", 150L), (1L, "view", 200L))
    val frames = Funnel.stageFrames(events, Seq("view", "click"))
    val t = frames.last.collect()(0)
    assert(t.getAs[java.sql.Timestamp]("t0").getTime == 100000L)
    assert(t.getAs[java.sql.Timestamp]("t1").getTime == 150000L)
  }
}
