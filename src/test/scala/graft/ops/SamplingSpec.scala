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

  test("splitByHash: stable assignment, growth-safe, weights respected") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.splitByHash(docs, col("id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // weights approximately respected (hash-uniform)
    val byLabel = assigned.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(byLabel("train") / 2000.0 - 0.8) < 0.05, s"$byLabel")
    assert(byLabel.keySet == Set("train", "val", "test"))
    // growth safety: adding rows never moves an existing row's split
    val grown = Sampling.splitByHash((0L until 4000L).toDF("id"), col("id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assigned.forall { case (id, s) => grown(id) == s },
      "existing rows must keep their split when the dataset grows")
    // partitioning invariance
    val reparted = Sampling.splitByHash(docs.repartition(17), col("id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reparted == assigned)
  }

  test("epochShuffle: deterministic per seed, reshuffles across seeds, shards balanced") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 4000L).toDF("id")
    def perm(seed: Long) = Sampling.epochShuffle(docs, col("id"), seed, nShards = 16)
      .collect().map(r => r.getLong(0) -> (r.getAs[Int]("shard"), r.getAs[String]("order_key")))
      .toMap
    val p7a = perm(7); val p7b = perm(7); val p8 = perm(8)
    assert(p7a == p7b) // same seed -> identical permutation
    assert(p7a != p8)  // different seed -> different permutation
    // permutation is total: order keys unique
    assert(p7a.values.map(_._2).toSet.size == 4000)
    // shards roughly balanced (hash-uniform over 16 shards)
    val sizes = p7a.values.groupBy(_._1).view.mapValues(_.size)
    assert(sizes.size == 16 && sizes.values.forall(s => s > 150 && s < 350), sizes.toMap.toString)
    // partition-count invariance
    val reparted = Sampling.epochShuffle(docs.repartition(13), col("id"), 7, 16)
      .collect().map(r => r.getLong(0) -> (r.getAs[Int]("shard"), r.getAs[String]("order_key")))
      .toMap
    assert(reparted == p7a)
  }

  test("topFractionByStratum: exact per-stratum cut, deterministic ties") {
    import org.apache.spark.sql.functions._
    // two strata of 10; scores with a tie band to exercise the tie-break
    val rows = (0 until 10).map(i => ("a", i.toLong, (i / 2).toDouble)) ++
      (0 until 10).map(i => ("b", i.toLong, i.toDouble))
    val df = rows.toDF("src", "id", "score")
    val kept = Sampling.topFractionByStratum(df, col("src"), col("score"), col("id"), pct = 30)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // each stratum keeps exactly 3 (rank*100 <= 30*10)
    assert(kept.count(_._1 == "a") == 3 && kept.count(_._1 == "b") == 3, kept.toString)
    // stratum b: plain top-3 by score
    assert(kept.filter(_._1 == "b").map(_._2) == Set(7L, 8L, 9L))
    // stratum a: scores tie in pairs (4,4,3,3,...) -> tie-break keeps the
    // LOWER id among equals: ranks 1..3 are ids 8,9 (score 4) then 6 (score 3)
    assert(kept.filter(_._1 == "a").map(_._2) == Set(8L, 9L, 6L))
    // pct 0 keeps nothing, pct 100 keeps everything
    assert(Sampling.topFractionByStratum(df, col("src"), col("score"), col("id"), 0).count() == 0)
    assert(Sampling.topFractionByStratum(df, col("src"), col("score"), col("id"), 100).count() == 20)
  }
}
