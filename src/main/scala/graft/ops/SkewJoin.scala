package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resilient join via key salting.
 *
 * At 100 TB a handful of hot keys (a viral document id, a default user
 * id) can put one shuffle partition orders of magnitude above the rest.
 * AQE's skew-join split handles sort-merge cases; explicit salting is
 * the deterministic fallback and works for any join the optimizer picks:
 * the skewed (large) side gets a random-ish salt in [0, buckets); the
 * small side is replicated across all salt values via a generated array
 * — shuffle keys become (key, salt), spreading a hot key over `buckets`
 * partitions.
 *
 * Salt derivation is `pmod(hash(cols…), buckets)` on the large side's
 * full row hash — deterministic (reproducible runs, no RNG state).
 */
object SkewJoin {

  /** Join types safe under small-side replication: the large side keeps
    * exactly one salt per row, so inner/left variants never duplicate it;
    * right/full outer would return each unmatched small-side row once per
    * salt bucket and are rejected. */
  private val supportedJoinTypes = Set(
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")

  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
                     buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    require(supportedJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedEquiJoin: unsupported joinType '$joinType' — small-side-preserving " +
        "types (right/full outer) would emit each unmatched small row `buckets` times")
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(replicatedSmall,
        saltedLarge(key) === replicatedSmall(key) &&
          saltedLarge("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop(replicatedSmall(key)).drop(saltedLarge("__salt"))
      .drop(replicatedSmall("__salt"))
  }

  /** Skewed aggregation: two-phase — partial agg on (key, salt), then
    * final agg on key. Spreads a hot key's partial work over `buckets`
    * tasks; correct for any commutative+associative aggregate. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: Column,
                     buckets: Int = 16): DataFrame = {
    df.withColumn("__salt", pmod(hash(col(key), valueCol), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").cast("long").as("n"), sum("__s").as("s"))
  }
}
