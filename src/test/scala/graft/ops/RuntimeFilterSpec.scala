package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom runtime filter: prefiltered semi join is exactly the plain semi
  * join (false positives removed by the exact join). */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin ≡ plain left_semi, any fpp") {
    val fact = (1L to 5000L).map(i => (i, i % 97)).toDF("k", "v")
      .repartition(7)
    val dim = Seq(3L, 97L, 4999L, 250L, 250L, 7777L).toDF("dk") // dup + missing keys
    val expected = fact.join(dim.select(col("dk")).distinct(),
        col("k") === col("dk"), "left_semi")
      .select("k").as[Long].collect().sorted

    for (fpp <- Seq(0.5, 0.01)) { // even a terrible filter stays exact
      val got = RuntimeFilter.bloomSemiJoin(fact, "k", dim, "dk", fpp)
        .select("k").as[Long].collect().sorted
      assert(got.toSeq == expected.toSeq, s"fpp=$fpp")
    }
  }

  test("pre-filter stage is codegen'd might_contain, not a Scala UDF") {
    // spark.range, not a local Seq: ConvertToLocalRelation would evaluate
    // a filter over a LocalRelation away at optimize time and hide the node
    val fact = spark.range(100).toDF("k")
    val dim = Seq(1L, 50L).toDF("dk")
    val plan = RuntimeFilter.bloomSemiJoin(fact, "k", dim, "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected native bloom probe in:\n$plan")
    assert(!plan.contains("UDF"), s"no interpreted UDF node allowed in:\n$plan")
  }

  test("null fact keys never match") {
    val fact = Seq(Some(1L), None, Some(2L)).toDF("k")
    val dim = Seq(1L, 2L).toDF("dk")
    val got = RuntimeFilter.bloomSemiJoin(fact, "k", dim, "dk")
      .select("k").as[Option[Long]].collect()
    assert(got.flatten.sorted.toSeq == Seq(1L, 2L))
  }
}
