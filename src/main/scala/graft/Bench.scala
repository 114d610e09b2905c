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

    // Host-contention tripwire reference: sentinel timings from the
    // COMMITTED bench map, read before this run overwrites the file. If a
    // bench runs under sustained external load (it happened: a 322.8s map
    // vs a 69.2s quiet-host reference), warmup + min-of-2 can't defend —
    // but trivial queries ballooning 3x+ can't be explained by code
    // changes, so they flag the whole artifact as untrustworthy.
    val qfile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_QUERIES.json")
    val sentinels = Seq("q_distinct", "q_topk", "q_zorder")
    val refTimes: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(qfile)), "UTF-8")
        sentinels.flatMap { s =>
          ("\"" + s + "\":([0-9.eE+-]+)").r.findFirstMatchIn(txt)
            .map(m => s -> m.group(1).toDouble)
        }.toMap
      } catch { case _: Throwable => Map.empty }

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

    val raw = qs.map { case (name, fn) =>
      val a = timeOnce(fn)
      val b = timeOnce(fn)
      (name, a, b)
    }
    val results = raw.map { case (name, a, b) =>
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    def fmt(v: Double): String = "%.3f".format(v)
    // run-to-run spread per query (the two timed runs' max/min): queries
    // whose spread exceeds 1.5x get their min+max recorded so unstable
    // measurements are visible in the artifact instead of silently
    // flattened by min-of-2 (q_cdc_roundtrip's judged 0.9s-vs-8s round-8
    // bimodality is the motivating case)
    val unstable = raw.filter { case (_, a, b) =>
      a > 0 && b > 0 && math.max(a, b) / math.min(a, b) >= 1.5 &&
        math.max(a, b) - math.min(a, b) >= 0.25
    }
    val spreadJson = unstable.map { case (n, a, b) =>
      "\"" + n + "\":[" + fmt(math.min(a, b)) + "," + fmt(math.max(a, b)) + "]"
    }.mkString("{", ",", "}")

    // Tripwire: re-time the sentinels AFTER the whole timed pass (so they
    // sample the same host conditions the slowest queries saw) and compare
    // to the committed reference. >3x on any trivial sentinel => the run is
    // contaminated and must not become the new reference.
    val sentinelNow = sentinels.flatMap { s =>
      SparkEntry.queries.get(s).map(fn => s -> math.min(timeOnce(fn), timeOnce(fn)))
    }.toMap
    val contended = sentinelNow.exists { case (s, v) =>
      refTimes.get(s).exists(r => r > 0 && v > 3 * r)
    }
    val sentinelJson = sentinels.flatMap(s => sentinelNow.get(s).map(v =>
      "\"" + s + "\":" + fmt(v) + (refTimes.get(s) match {
        case Some(r) => ",\"" + s + "_ref\":" + fmt(r)
        case None => ""
      }))).mkString("{", ",", "}")
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
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","host_contended":$contended,"sentinels":$sentinelJson,"spread":$spreadJson,"queries":$qjson}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(qfile),
      (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(full)
    val slowest = results.sortBy(-_._2).take(20)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"host_contended":$contended,"queries_file":"$qfile","queries":$slowest}""")
    spark.stop()
  }
}
