package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Water-fill budget allocation: level optimality vs brute force,
  * budget conservation, and the no-cap fast path. */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def alloc(tokens: Seq[Long], budget: Long): Map[String, Long] = {
    val df = tokens.zipWithIndex.map { case (t, i) => (s"d$i", t) }
      .toDF("domain", "n_tokens")
    Mixing.waterfillBudget(df, lit(budget))
      .collect().map(r => r.getAs[String]("domain") -> r.getAs[Long]("alloc")).toMap
  }

  /** Brute-force water level: largest L with sum(min(t, L)) <= budget. */
  private def bruteLevel(tokens: Seq[Long], budget: Long): Long =
    (0L to tokens.max).foldLeft(0L) { (best, l) =>
      if (tokens.map(math.min(_, l)).sum <= budget) l else best
    }

  test("allocations equal min(tokens, brute-force water level)") {
    for (budget <- Seq(5L, 17L, 40L, 100L)) {
      val toks = Seq(3L, 9L, 27L, 14L, 50L)
      val got = alloc(toks, budget)
      val lvl = bruteLevel(toks, budget)
      toks.zipWithIndex.foreach { case (t, i) =>
        val expected = if (toks.sum <= budget) t else math.min(t, lvl)
        assert(got(s"d$i") == expected, s"budget=$budget domain=d$i level=$lvl")
      }
    }
  }

  test("total allocation within budget, and within #domains of it when capped") {
    val toks = Seq(100L, 200L, 300L, 400L)
    val budget = 500L
    val total = alloc(toks, budget).values.sum
    assert(total <= budget && total > budget - toks.length)
  }

  test("budget above total caps nothing") {
    val toks = Seq(10L, 20L, 30L)
    val df = toks.zipWithIndex.map { case (t, i) => (s"d$i", t) }
      .toDF("domain", "n_tokens")
    val rows = Mixing.waterfillBudget(df, lit(1000L)).collect()
    assert(rows.forall(r => r.getAs[Int]("capped") == 0))
    assert(rows.map(_.getAs[Long]("alloc")).sum == toks.sum)
  }

  test("ties split deterministically by domain name") {
    val df = Seq(("b", 10L), ("a", 10L), ("c", 10L)).toDF("domain", "n_tokens")
    val rows = Mixing.waterfillBudget(df, lit(25L))
      .orderBy("domain").collect()
    // level = 8: all capped at 8 (3*8=24 <= 25 but 3*9=27 > 25)
    assert(rows.forall(_.getAs[Long]("alloc") == 8L))
  }

  test("temperatureWeights: alpha=1 is proportional, low alpha lifts small domains") {
    import org.apache.spark.sql.functions._
    val counts = Seq(("big", 9000L), ("mid", 900L), ("small", 100L))
      .toDF("domain", "n_tokens")
    def weights(alpha: Double): Map[String, Double] =
      Mixing.temperatureWeights(counts, alpha, lit(10000L))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val w1 = weights(1.0)
    assert(math.abs(w1("big") - 0.9) < 1e-6 && math.abs(w1("small") - 0.01) < 1e-6,
      s"alpha=1 must be proportional: $w1")
    val w5 = weights(0.5)
    assert(w5("small") > w1("small") && w5("big") < w1("big"),
      s"alpha<1 must shift mass to small domains: $w5")
    // weights always sum to 1
    assert(math.abs(w5.values.sum - 1.0) < 1e-5)
    // oversampling shows up as epochs > 1 for the lifted domain
    val rows = Mixing.temperatureWeights(counts, 0.3, lit(10000L))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(rows("small") > 1.0, s"small domain must be repeated: $rows")
    assert(rows("big") < 1.0)
  }

  test("materializeMixture: integral rates are exact copy counts") {
    val docs = (0L until 20L).map(i => (i, "s1")).toDF("doc_id", "source")
    val r1 = Seq(("s1", 1.0)).toDF("source", "rate")
    val got = Mixing.materializeMixture(docs, r1).collect()
    assert(got.length == 20 && got.forall(_.getAs[Long]("n_copies") == 1L))
    val r3 = Seq(("s1", 3.0)).toDF("source", "rate")
    assert(Mixing.materializeMixture(docs, r3).collect()
      .forall(_.getAs[Long]("n_copies") == 3L))
  }

  test("materializeMixture: fractional rate lands in {floor, ceil}, deterministic across partitionings") {
    val docs = (0L until 200L).map(i => (i, "s1")).toDF("doc_id", "source")
    val r = Seq(("s1", 2.5)).toDF("source", "rate")
    val first = Mixing.materializeMixture(docs, r).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_copies")).toMap
    assert(first.values.forall(c => c == 2L || c == 3L))
    val frac = first.values.count(_ == 3L).toDouble / first.size
    assert(frac > 0.3 && frac < 0.7, s"~half should round up: $frac")
    val again = Mixing.materializeMixture(docs.repartition(7), r).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_copies")).toMap
    assert(first == again, "decision must not depend on partitioning")
  }

  test("materializeMixture: sub-1 rate subsamples near the rate; drops are absent rows") {
    val docs = (0L until 400L).map(i => (i, "s1")).toDF("doc_id", "source")
    val r = Seq(("s1", 0.25)).toDF("source", "rate")
    val kept = Mixing.materializeMixture(docs, r).collect()
    assert(kept.forall(_.getAs[Long]("n_copies") == 1L))
    val f = kept.length / 400.0
    assert(f > 0.15 && f < 0.35, s"~quarter kept: $f")
  }

  test("domainDivergence: KL is exactly 0 when every domain matches the pool") {
    val docs = Seq(("s1", "a b"), ("s2", "a a b b"))
      .toDF("source", "text")
    val got = Mixing.domainDivergence(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl_bits")).toMap
    // p = q = (0.5, 0.5) for both domains; the log argument is exactly 1.0
    assert(got == Map("s1" -> 0.0, "s2" -> 0.0), s"got $got")
  }

  test("domainDivergence: skewed domains score the hand-computed positive KL") {
    val docs = Seq(("s1", "a a a b"), ("s2", "b b b a"))
      .toDF("source", "text")
    // pooled q = (0.5, 0.5); each domain p = (0.75, 0.25) over its own order:
    // KL = 0.75*log2(1.5) + 0.25*log2(0.5) = 0.188722 (6dp), symmetric
    val rows = Mixing.domainDivergence(docs).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == 4L)
      assert(r.getAs[Double]("kl_bits") == 0.188722, s"got $r")
    }
  }
}
