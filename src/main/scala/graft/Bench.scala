package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs every SparkEntry query on
 * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
 * Queries run in sorted order after a warmup pass over EVERY query; each
 * is then timed as the min of two runs. The full warmup matters: queries
 * over JIT-heavy custom code (EC point math, fused vector expressions)
 * run 5-6x slower on their first execution while C2 compiles the hot
 * loops — a partial warmup would charge that one-time cost to whichever
 * queries happen to run first.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.ts is TIMESTAMP(NANOS); see graft.Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    // warmup: run every query once (scan + shuffle + codegen + JIT)
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (count() would let
      // Catalyst prune projections and under-measure map-only queries)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val results = qs.map { case (name, fn) =>
      val a = timeOnce(fn)
      val b = timeOnce(fn)
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    def fmt(v: Double): String = "%.3f".format(v)
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum

    // The harness capturing this output keeps only a bounded tail of
    // stdout; a single line with all per-query timings at full precision
    // overflows it and the head (and thus JSON validity) is lost. So:
    //  1. persist the COMPLETE per-query map to a one-line JSON file,
    //  2. print the complete map anyway (most of it survives in a tail),
    //  3. end with a short, self-contained summary line — guaranteed to
    //     fit whole in any tail window — carrying the slowest queries
    //     inline plus a pointer to the full file.
    val qfile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_QUERIES.json")
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","queries":$qjson}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(qfile),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(full)
    val slowest = results.sortBy(-_._2).take(20)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"queries_file":"$qfile","queries":$slowest}""")
    spark.stop()
  }
}
