package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV bottom-k sketches: mergeability, determinism, estimator accuracy. */
class CorpusSketchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range) = ids.map(i => (i.toLong, s"doc-$i")).toDF("id", "key")

  test("merge of shard sketches equals the sketch of the whole corpus") {
    val whole = corpus(0 until 1000)
    val shards = Seq(corpus(0 until 300), corpus(300 until 650), corpus(650 until 1000))
    val k = 64
    val direct = CorpusSketch.bottomK(whole, col("key"), k).collect().map(_.getString(0)).toSeq
    val merged = CorpusSketch.merge(
      shards.map(s => CorpusSketch.bottomK(s, col("key"), k)), k)
      .collect().map(_.getString(0)).toSeq
    assert(merged == direct, "bottom-k must be algebraically mergeable")
  }

  test("sketch is deterministic across partitionings") {
    val c = corpus(0 until 500)
    val a = CorpusSketch.bottomK(c, col("key"), 32).collect().map(_.getString(0)).toSeq
    val b = CorpusSketch.bottomK(c.repartition(13), col("key"), 32).collect().map(_.getString(0)).toSeq
    assert(a == b)
  }

  test("jaccard estimate tracks the exact overlap") {
    // |A| = 1000, |B| = 1000, |A ∩ B| = 500 → J = 500 / 1500 = 1/3
    val a = corpus(0 until 1000)
    val b = corpus(500 until 1500)
    val est = CorpusSketch.jaccardEstimate(a, b, col("key"), k = 256)
      .collect().head.getDouble(2)
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"est $est vs exact ${1.0 / 3.0}")
    // disjoint and identical corpora hit the boundaries exactly
    val disj = CorpusSketch.jaccardEstimate(corpus(0 until 200), corpus(500 until 700),
      col("key"), k = 64).collect().head.getDouble(2)
    assert(disj == 0.0)
    val same = CorpusSketch.jaccardEstimate(corpus(0 until 200), corpus(0 until 200),
      col("key"), k = 64).collect().head.getDouble(2)
    assert(same == 1.0)
  }

  test("count-min sketch: never underestimates, heavy counts within the eps band, deterministic") {
    import spark.implicits._
    // skewed corpus: token t0 appears 1000x, t1..t9 100x, tail 1x each
    val rows = Seq.fill(1000)("t0") ++
      (1 to 9).flatMap(i => Seq.fill(100)(s"t$i")) ++
      (0 until 500).map(i => s"rare$i")
    val keys = rows.toDF("tok").repartition(8)
    val exact = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cms = CorpusSketch.cmsSketch(keys, col("tok"), eps = 0.01, confidence = 0.99)
    val n = rows.length
    exact.foreach { case (tok, cnt) =>
      val est = cms.estimateCount(tok)
      assert(est >= cnt, s"$tok: CMS must never underestimate ($est < $cnt)")
      assert(est <= cnt + math.ceil(0.01 * n).toLong + 1,
        s"$tok: $est outside the eps band of $cnt")
    }
    // same seed, different partitioning -> identical estimates (counters add)
    val cms2 = CorpusSketch.cmsSketch(keys.repartition(3), col("tok"), eps = 0.01, confidence = 0.99)
    assert(exact.keys.forall(t => cms.estimateCount(t) == cms2.estimateCount(t)))
  }

  test("CMS shard merge equals sketching the concatenated corpus") {
    import spark.implicits._
    val shard1 = (Seq.fill(300)("hot") ++ (0 until 200).map(i => s"a$i")).toDF("tok")
    val shard2 = (Seq.fill(150)("hot") ++ (0 until 200).map(i => s"b$i")).toDF("tok")
    val direct = CorpusSketch.cmsSketch(shard1.unionAll(shard2), col("tok"), eps = 0.01)
    val merged = CorpusSketch.cmsMerge(Seq(
      CorpusSketch.cmsSketch(shard1, col("tok"), eps = 0.01),
      CorpusSketch.cmsSketch(shard2, col("tok"), eps = 0.01)))
    val probes = Seq("hot") ++ (0 until 200).map(i => s"a$i") ++
      (0 until 200).map(i => s"b$i") ++ Seq("absent")
    probes.foreach { t =>
      assert(direct.estimateCount(t) == merged.estimateCount(t),
        s"$t: merge must equal the direct sketch")
    }
    assert(merged.estimateCount("hot") >= 450L)
  }
}
