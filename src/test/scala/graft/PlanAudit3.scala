package graft

/** Plan audit for the round-2 queries: join strategies, exchange counts,
  * and deliberate nested-loop sites (non-equi range join and the exact
  * cosine near-dup baseline are intentionally BNLJ over a broadcast side).
  * Run: sbt "Test/runMain graft.PlanAudit3" — findings recorded in PLANS.md. */
object PlanAudit3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q_full_join", "q_union", "q_grouping_sets", "q_window_frames",
                     "q_pivot", "q_explode_words", "q_string_agg", "q_scalar_subquery",
                     "q_date_funcs", "q_range_join", "q_count_distinct", "q_dedup_embed")) {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val flags = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(p.contains)
      val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r.findAllIn(p).toSeq
        .groupBy(identity).map { case (k, v) => s"$k×${v.size}" }.mkString(",")
      val exch = "Exchange".r.findAllIn(p).size
      val wsc = "WholeStageCodegen".r.findAllIn(p).size
      println(s"$name: joins=[$joins] exchanges=$exch codegenSpans=$wsc flags=${flags.mkString(",")}")
    }
  }
}
