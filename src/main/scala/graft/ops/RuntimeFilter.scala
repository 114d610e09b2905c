package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Runtime (Bloom) filter pre-join pruning — the "small dim restricts a
 * huge fact" pattern at 100 TB scale.
 *
 * A plain semi join shuffles every fact row that *might* match; with a
 * selective dimension that is almost all wasted network. Building a Bloom
 * filter over the dim keys (one small aggregation), broadcasting its bits
 * to every executor, and dropping non-matching fact rows AT THE SCAN
 * cuts the shuffled volume to matches + the false-positive margin; the
 * exact `left_semi` join afterwards removes false positives, so the
 * result is byte-identical to the plain semi join (oracle-checked by
 * `q_bloom_semi`). This is the manual form of Spark's AQE runtime filter
 * (`InjectRuntimeFilter`), exposed as an operator so pipelines can apply
 * it where the optimizer's heuristics don't fire (non-equi pre-filters,
 * multi-stage pipelines, checkpointed intermediates).
 *
 * The membership probe is a Scala UDF (Spark's `BloomFilter` sketch has
 * no public expression form); it costs a few hash ops per row and sits
 * behind the scan filter, so it does not break codegen of the surrounding
 * stages.
 */
object RuntimeFilter {

  /** Exact semi join of `fact` against `dim`'s keys, Bloom-prefiltered.
    * Keys must be integral (long-compatible). `fpp` trades filter size
    * for shuffle savings: 1% keeps the filter ~10 bits/key. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    fpp: Double = 0.01): DataFrame = {
    val dimKeys = dim.select(col(dimKey).as("__rf_key")).distinct()
    val expected = math.max(dimKeys.count(), 1L)
    val bloom = dimKeys.stat.bloomFilter("__rf_key", expected, fpp)
    val bcast = fact.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    fact.where(might(col(factKey)))
      .join(dimKeys, col(factKey) === col("__rf_key"), "left_semi")
  }
}
