package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, LongType}

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
 * The membership probe is Spark's own codegen'd
 * [[BloomFilterMightContain]] expression (what `InjectRuntimeFilter`
 * plants) over the serialized filter bits as a binary literal — the
 * pre-filter stage stays inside whole-stage codegen, no Scala UDF. The
 * literal rides the plan the same way the optimizer's subquery result
 * would; at ~10 bits/key it is kilobytes for any broadcastable dim.
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
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    // stat.bloomFilter inserts the RAW long keys (not xxhash64 of them,
    // which is what BloomFilterAggregate would store), so the probe value
    // is the key itself cast to long
    val might = Bridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      Bridge.expression(col(factKey).cast(LongType))))
    fact.where(might)
      .join(dimKeys, col(factKey) === col("__rf_key"), "left_semi")
  }
}
