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

  test("tumbling daily stats: streaming (watermarked) equals batch") {
    val batch = EventTime.tumblingStats(graft.Tables(spark, sf, "events"))
      .orderBy("window_start").collect().map(_.toSeq).toSeq

    // stream the same parquet through a file source
    val dir = Files.createTempDirectory("events-stream")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"))
    val raw = spark.read.parquet(dir.toString)
    val sdf = spark.readStream.schema(raw.schema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = EventTime.tumblingStats(sdf, watermarkDelay = Some("1 hour"))

    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("et_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("et_stream")
      .orderBy("window_start").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
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
