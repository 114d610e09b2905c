package graft
object PlanAudit2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q_asof_attribution", "q_ecmh_digest", "q_sessions", "q_simhash_near", "q_ann_lsh")) {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val flags = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(p.contains)
      val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r.findAllIn(p).toSeq
        .groupBy(identity).map { case (k, v) => s"$k×${v.size}" }.mkString(",")
      val exch = "Exchange".r.findAllIn(p).size
      println(s"$name: joins=[$joins] exchanges=$exch flags=${flags.mkString(",")}")
    }
  }
}
