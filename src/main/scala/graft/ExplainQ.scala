package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan inspector: prints the formatted physical plan of the named
 * queries (default: all) against SPARK_GRAFT_SF_DIR. The review
 * checklist per query: filters pushed to the scan (`PushedFilters`),
 * projections pruned (`ReadSchema`), small sides broadcast, no
 * unexpected exchanges, wide `WholeStageCodegen` spans.
 *
 *   sbt "runMain graft.ExplainQ q_bloom_semi q_gapfill"
 */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    wanted.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
