package graft
import org.apache.spark.sql.functions._
/** Plan auditor: dumps formatted plans for scale-critical queries. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q_filter_project", "q_join_revenue", "q1_agg", "q_minhash", "q_events_window")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
  }
}
