package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting: target-like docs score above
  * raw-average docs; resampling keeps the requested fraction. */
class ImportanceResamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // "science" docs — the target register
    (1L, "the quantum field theory of matter and energy states"),
    (2L, "quantum energy levels of the hydrogen atom and field"),
    (3L, "field equations govern the energy of quantum systems"),
    // "spam" docs — off-target register
    (4L, "buy cheap pills now click here free offer deal"),
    (5L, "free offer click now buy deal cheap pills here"),
    (6L, "deal deal deal click buy free now cheap offer pills")
  ).toDF("doc_id", "text")

  test("target-register docs outweigh off-target docs") {
    val target = corpus.where(col("doc_id") <= 2) // curated sample
    val w = ImportanceResampling.importanceWeights(corpus, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val science = Seq(1L, 2L, 3L).map(w)
    val spam = Seq(4L, 5L, 6L).map(w)
    assert(science.min > spam.max,
      s"every science doc must outscore every spam doc: $w")
    // doc 3 was NOT in the target sample but shares its register —
    // generalization via shared buckets, not memorization of ids
    assert(w(3L) > spam.max)
  }

  test("resample keeps ~fraction of docs, highest weights first") {
    val target = corpus.where(col("doc_id") <= 2)
    val w = ImportanceResampling.importanceWeights(corpus, target)
    val kept = ImportanceResampling.resample(w, fraction = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.size == 3, s"half of 6 docs: $kept")
    assert(kept == Set(1L, 2L, 3L), s"the science register must survive: $kept")
  }

  test("gumbel resampling is reproducible and temperature-sensitive") {
    val target = corpus.where(col("doc_id") <= 2)
    val w = ImportanceResampling.importanceWeights(corpus, target).cache()
    def draw(temp: Double): Set[Long] =
      ImportanceResampling.resampleGumbel(w, fraction = 0.5, temperature = temp)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // deterministic: same inputs, same "random" sample
    assert(draw(1.0) == draw(1.0))
    assert(draw(1.0).size == 3)
    // near-zero temperature sharpens to the top-weight set
    assert(draw(1e-6) == Set(1L, 2L, 3L))
  }

  test("weights are deterministic across partitionings") {
    val target = corpus.where(col("doc_id") <= 2)
    val a = ImportanceResampling.importanceWeights(corpus, target)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    val b = ImportanceResampling.importanceWeights(corpus.repartition(7), target.repartition(3))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    assert(a == b)
  }
}
