package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of a named query (or the walread /
  * waldecode pseudo-queries) for plan-shape audits. */
object DiagPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = name match {
      case "waldecode" =>
        graft.cdc.WalDecoder.decodeTables(spark,
          spark.read.text(CdcQueries.walLinesDir(spark, sfDir)),
          Seq(CdcQueries.eventsSchema))("events")
      case n => SparkEntry.queries(n)(spark, sfDir)
    }
    val plan = df.queryExecution.executedPlan.toString
    println("[plan] from_json occurrences: " +
      "from_json".r.findAllIn(plan).length)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
