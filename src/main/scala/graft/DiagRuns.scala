package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Run-to-run variance diagnostic: times one query N times in a single
  * JVM and prints per-run wall seconds alongside the GC-time delta and
  * collection counts, so a bimodal query (q_cdc_roundtrip's judged
  * 0.9s-vs-8s spread, round 8) can be attributed to GC pressure vs plan
  * or I/O effects.
  *
  *   sbt "runMain graft.DiagRuns q_cdc_roundtrip 8"
  */
object DiagRuns {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // pseudo-queries for isolating q_cdc_roundtrip's pipeline stages
    val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame = name match {
      case "walread" => (s, dir) =>
        s.read.text(CdcQueries.walLinesDir(s, dir))
      case "waldecode" => (s, dir) =>
        graft.cdc.WalDecoder.decodeTables(s,
          s.read.text(CdcQueries.walLinesDir(s, dir)),
          Seq(CdcQueries.eventsSchema))("events")
      case _ => SparkEntry.queries(name)
    }

    def gcStats(): (Long, Long) = {
      val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionTime).sum, beans.map(_.getCollectionCount).sum)
    }

    // stage-level attribution: wall per stage (submission→completion) and
    // the slowest single task, so stragglers vs driver-side gaps separate
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Double, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val wall = (for {
          s <- info.submissionTime; c <- info.completionTime
        } yield (c - s) / 1e3).getOrElse(-1.0)
        stages.add((info.stageId, wall,
          info.taskMetrics.executorRunTime / 1e3, info.numTasks))
      }
    })
    // "warmall": reproduce Bench's JVM state — run EVERY registered
    // query once (codegen + JIT + profile pollution) before timing the
    // target, so an in-bench-only slowdown (r17: q_cdc_digest 3.4s
    // in-bench vs 1.3s isolated) can be attributed to JVM state vs host
    if (args.contains("warmall")) {
      println(s"[diag] warmall: running all ${SparkEntry.queries.size} queries once first")
      // NonFatal only: swallowing an OutOfMemoryError here would corrupt
      // the very JVM-state measurement warmall exists to diagnose
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (qn, f) =>
        try f(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(e) =>
          println(s"[diag] warmall: $qn failed: $e") }
      }
    }
    (1 to n).foreach { i =>
      stages.clear()
      val (gc0, n0) = gcStats()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val (gc1, n1) = gcStats()
      Thread.sleep(200) // let stage-completed events drain
      val st = stages.asScala.toVector.sortBy(_._1)
      val stageSum = st.map(_._2).sum
      println(f"[diag] run $i%2d  wall=$wall%7.3f s  gc=${(gc1 - gc0) / 1000.0}%6.3f s  collections=${n1 - n0}  stageWallSum=$stageSum%7.3f")
      st.foreach { case (id, w, run, nt) =>
        println(f"[diag]      stage $id%4d wall=$w%7.3f s  taskRunSum=$run%7.3f s  tasks=$nt%3d")
      }
    }
    spark.stop()
  }
}
