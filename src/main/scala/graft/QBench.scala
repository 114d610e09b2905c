package graft

import org.apache.spark.sql.SparkSession

/**
 * Single-query bench harness for local iteration: times only the queries
 * named on the command line (default: all), printing per-run seconds so
 * warmup vs steady-state is visible. `Bench` stays the driver contract;
 * this is the developer loop.
 *
 *   sbt "runMain graft.QBench q_ecmh_digest q_cdc_upsert"
 */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ad-hoc conf A/Bs: SPARK_GRAFT_CONF="k=v,k=v" (developer loop only).
    // A malformed segment FAILS FAST: a typo'd conf that silently never
    // applied would masquerade as a neutral A/B result.
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty).map(_.split("=", 2))
      .foreach {
        case Array(k, v) => builder.config(k, v)
        case bad => sys.error(
          s"SPARK_GRAFT_CONF segment '${bad.mkString("=")}' is not k=v " +
            "(values may not contain commas); refusing to run an A/B with a dropped conf")
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wanted =
      if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    wanted.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")}"))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${times.map(t => f"$t%7.3f").mkString(" ")}  min=${times.min}%7.3f")
    }
    spark.stop()
  }
}
