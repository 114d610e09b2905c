package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic hash sampling: partitioning-independent membership,
  * rate accuracy, per-stratum rates. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("same rows selected at any partitioning (run/engine stable)") {
    val ids = (1L to 5000L).toDF("id")
    val a = Sampling.hashSample(ids, col("id"), 0.3)
      .as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(ids.repartition(17), col("id"), 0.3)
      .as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("sample fraction tracks the rate") {
    val n = 20000L
    val got = Sampling.hashSample((1L to n).toDF("id"), col("id"), 0.2).count()
    assert(math.abs(got.toDouble / n - 0.2) < 0.02, s"got $got of $n")
  }

  test("stratified rates per class; default for unknown strata") {
    val df = (1L to 30000L).map(i =>
      (i, Seq("a", "b", "c")((i % 3).toInt))).toDF("id", "cls")
    val sampled = Sampling.stratifiedHashSample(
      df, col("cls"), col("id"), Map("a" -> 0.6, "b" -> 0.1), defaultRate = 0.0)
    val byCls = sampled.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byCls("a") / 10000.0 - 0.6) < 0.03)
    assert(math.abs(byCls("b") / 10000.0 - 0.1) < 0.03)
    assert(!byCls.contains("c")) // default rate 0 drops the whole stratum
  }

  test("rate 1.0 keeps everything, rate 0.0 keeps nothing") {
    val ids = (1L to 1000L).toDF("id")
    assert(Sampling.hashSample(ids, col("id"), 1.0).count() == 1000L)
    assert(Sampling.hashSample(ids, col("id"), 0.0).count() == 0L)
  }
}
