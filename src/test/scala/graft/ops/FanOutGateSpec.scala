package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r20 pin for the split-count-gated fan-out (the r19 verdict's
  * adjacentPairs finding): single-split local scans still fan out to
  * the session parallelism, but an input that already carries >=
  * parallelism partitions must NOT pay a corpus-wide round-robin
  * exchange. */
class FanOutGateSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("fanOut: single-split scan fans out, multi-split scan keeps its partitioning") {
    val dir = java.nio.file.Files.createTempDirectory("fanout").toString
    val rows = (1L to 64L).map(i => (i, s"tok$i text number $i"))
    rows.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/one.parquet")
    rows.toDF("doc_id", "text").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/many.parquet")

    // session is local[4]: a 1-file scan (< 4 partitions) must fan out...
    val narrow = spark.read.parquet(s"$dir/one.parquet")
    assert(planOf(TextAnalysis.adjacentPairs(narrow, "doc_id", "text"))
      .toLowerCase.contains("roundrobinpartitioning"),
      "single-split input lost its fan-out")

    // ...while an 8-file scan (>= 4 partitions) must NOT add an exchange
    val wide = spark.read.parquet(s"$dir/many.parquet")
    assume(wide.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
    val p = planOf(TextAnalysis.adjacentPairs(wide, "doc_id", "text"))
    assert(!p.contains("Exchange"),
      s"multi-split input still pays a fan-out exchange:\n$p")
  }

  test("fanOut gate changes no values") {
    val docs = Seq((1L, "a b c"), (2L, "x y"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.adjacentPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "a", "b"), (1L, "b", "c"), (2L, "x", "y")))
  }
}
