package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Windowed quality monitor: batch ≡ streaming (watermarked), and the
  * drift report flags a degraded source against its own history. */
class QualityMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away in a bright morning of calm wind and soft light"
  private val bad = "spam spam spam spam spam spam spam spam spam spam " +
    "spam spam spam spam spam spam spam spam spam spam"

  /** hours of data: source A stays good; source B degrades at hour 3. */
  private def feed = (0 until 6).flatMap { h =>
    val ts = java.sql.Timestamp.valueOf(f"2024-01-01 0$h%d:30:00")
    (0 until 10).flatMap { i =>
      Seq(("A", ts, good)) ++
        Seq(("B", ts, if (h >= 3) bad else good))
    }
  }.toDF("source", "ts", "text")

  test("windowed aggregates: batch equals watermarked streaming (append)") {
    val batch = QualityMonitor.windowedQuality(feed)
      .orderBy("window_start", "source").collect().map(_.toSeq).toSeq

    val dir = Files.createTempDirectory("qm-stream")
    feed.write.mode("overwrite").parquet(dir.toString)
    val sdf = spark.readStream.schema(feed.schema).parquet(dir.toString)
    val q = QualityMonitor.windowedQuality(sdf, watermarkDelay = Some("30 minutes"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("qm_agg").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("qm_agg")
      .orderBy("window_start", "source").collect().map(_.toSeq).toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("keep rates: good source 1.0 throughout; degraded source drops to 0") {
    val rows = QualityMonitor.windowedQuality(feed)
      .orderBy("window_start", "source").collect()
    val a = rows.filter(_.getString(1) == "A").map(_.getAs[Double]("keep_rate"))
    val b = rows.filter(_.getString(1) == "B").map(_.getAs[Double]("keep_rate"))
    assert(a.forall(_ == 1.0))
    assert(b.take(3).forall(_ == 1.0) && b.drop(3).forall(_ == 0.0), b.toSeq.toString)
  }

  test("drift report: alert fires only on the degraded source, only after history") {
    val windowed = QualityMonitor.windowedQuality(feed)
    val drift = QualityMonitor.driftReport(windowed, trail = 3, delta = 0.2)
      .orderBy("window_start", "source").collect()
    val alerts = drift.filter(_.getAs[Int]("alert") == 1)
      .map(r => (r.getString(1), r.getTimestamp(0).toString))
    // B degrades at hour 3 with exactly 3 windows of history -> alert at
    // hours 3,4 (at hour 5 the trailing 3 windows are 1.0,0.0,0.0 ->
    // baseline 1/3, |0 - 1/3| = 0.33 > 0.2 -> still alerting)
    assert(alerts.forall(_._1 == "B"), alerts.mkString(","))
    assert(alerts.length == 3, drift.map(_.toSeq).mkString("\n"))
    // no alerts in the warm-up windows (insufficient history)
    val early = drift.filter(r => r.getTimestamp(0).toString < "2024-01-01 03:00:00.0")
    assert(early.forall(_.getAs[Int]("alert") == 0))
  }
}
