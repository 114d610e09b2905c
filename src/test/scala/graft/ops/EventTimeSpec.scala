package graft.ops

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-time windows: batch/streaming equivalence with a watermark —
  * the streaming-semantics upgrade over the reference's processing-time
  * rotation (SURVEY §2.12). */
class EventTimeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Normalize a `ts` column to TIMESTAMP_LTZ whatever the parquet reader
    * surfaced it as: legacy nanos-as-LongType → µs timestamps (Tables.scala's
    * conversion), TIMESTAMP_NTZ (what Spark 4.1.2 gives for TIMESTAMP(NANOS)
    * even under nanosAsLong) → LTZ cast, which is wall-clock-preserving
    * because the spec session pins timeZone=UTC. Watermarks accept only LTZ,
    * so an unconditional — or missing — cast breaks analysis on one Spark
    * build or the other. Both the batch and streaming side of every parity
    * test must go through here so the collected values compare equal and a
    * Spark upgrade can't silently disable the suite again. */
  private def normalizeTs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  private def streamEvents(dir: String): org.apache.spark.sql.DataFrame = {
    val schema = spark.read.parquet(dir).schema
    normalizeTs(spark.readStream.schema(schema).parquet(dir))
  }

  test("tumbling daily stats: streaming (watermarked) equals batch") {
    val batch = EventTime.tumblingStats(normalizeTs(graft.Tables(spark, sf, "events")))
      .orderBy("window_start").collect().map(_.toSeq).toSeq

    // stream the same parquet through a file source
    val dir = Files.createTempDirectory("events-stream")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"))
    val agg = EventTime.tumblingStats(streamEvents(dir.toString),
      watermarkDelay = Some("1 hour"))

    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("et_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("et_stream")
      .orderBy("window_start").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("session windows: streaming (watermarked state merge) equals batch") {
    val batch = EventTime.sessionStats(normalizeTs(graft.Tables(spark, sf, "events")))
      .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq

    val dir = Files.createTempDirectory("sessions-stream")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"))
    val agg = EventTime.sessionStats(streamEvents(dir.toString),
      watermarkDelay = Some("1 hour"))

    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("sess_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("sess_stream")
      .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("watermark drops late data in append-mode streaming windows") {
    import spark.implicits._
    val base = Files.createTempDirectory("late-data")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def write(rows: Seq[(String, Long, Double)]): Unit =
      rows.map { case (ts, uid, v) => (java.sql.Timestamp.valueOf(ts), uid, v) }
        .toDF("ts", "user_id", "value")
        .write.mode("append").parquet(in)

    def run(): Unit = {
      val q = EventTime.tumblingStats(streamEvents(in), windowLength = "10 minutes",
          watermarkDelay = Some("10 minutes"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      ()
    }

    // batch 1: two rows in window [00:00,00:10), one at 00:25 →
    // watermark advances to 00:15, finalizing the first window
    write(Seq(("2024-01-01 00:01:00", 1L, 1.0), ("2024-01-01 00:05:00", 2L, 1.0),
              ("2024-01-01 00:25:00", 3L, 1.0)))
    run()
    // batch 2: a LATE row for the finalized window (00:02 < watermark)
    // plus fresh data pushing the watermark past every earlier window
    write(Seq(("2024-01-01 00:02:00", 9L, 100.0), ("2024-01-01 01:00:00", 4L, 1.0)))
    run()
    write(Seq(("2024-01-01 02:00:00", 5L, 1.0))) // flush remaining windows
    run()

    val res = spark.read.parquet(out)
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the late 00:02 row was dropped: first window emitted exactly 2 events
    assert(res("00:00") == 2L, s"late row not dropped: $res")
    assert(res("00:20") == 1L)
  }

  test("stream-stream interval join equals batch; state bounded by watermark") {
    import spark.implicits._
    val base = Files.createTempDirectory("ss-join")
    val pDir = base.resolve("p").toString
    val cDir = base.resolve("c").toString
    def rows(rs: Seq[(Long, String, Long)]) =
      rs.map { case (id, ts, uid) =>
        (id, java.sql.Timestamp.valueOf(ts), uid) }
        .toDF("event_id", "ts", "user_id")
    // purchases u1@10:00, u2@10:30; clicks u1@8:10(too old), u1@9:50(hit),
    // u2@10:20(hit), u3@10:00(no purchase)
    rows(Seq((100L, "2024-01-01 10:00:00", 1L), (101L, "2024-01-01 10:30:00", 2L)))
      .write.parquet(pDir)
    rows(Seq((1L, "2024-01-01 08:10:00", 1L), (2L, "2024-01-01 09:50:00", 1L),
             (3L, "2024-01-01 10:20:00", 2L), (4L, "2024-01-01 10:00:00", 3L)))
      .write.parquet(cDir)

    val expected = EventTime.clickAttribution(
        spark.read.parquet(pDir), spark.read.parquet(cDir))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected == Set((100L, 2L), (101L, 3L)))

    val q = EventTime.clickAttribution(streamEvents(pDir), streamEvents(cDir),
        watermarkDelay = Some("10 minutes"))
      .writeStream.outputMode("append").format("memory").queryName("ss_join")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("ss_join")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected)
  }

  test("windowed top users: deterministic ranking with ties on user_id") {
    val top = EventTime.windowedTopUsers(graft.Tables(spark, sf, "events"), k = 3)
    val rows = top.orderBy("window_start", "rank").collect()
    assert(rows.nonEmpty)
    val byWindow = rows.groupBy(_.getAs[Any]("window_start").toString)
    byWindow.values.foreach { ws =>
      assert(ws.map(_.getAs[Long]("rank")).toSeq == (1L to ws.length))
      // values are non-increasing within a window
      val vals = ws.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("user_value"))
      assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    }
  }
}
