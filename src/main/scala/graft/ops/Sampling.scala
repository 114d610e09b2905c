package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable sampling.
 *
 * `df.sample()` draws from a per-partition RNG: the sample changes with
 * partitioning, retries, and engine — useless for reproducible pipeline
 * runs or oracle checks. Hash sampling keys the decision on the ROW
 * (md5 of a key column vs a threshold), so the same row is in or out
 * everywhere, forever, at any parallelism.
 */
object Sampling {

  /** 32-bit uniform hash of `key` in [0, 2^32): md5-prefix, the portable
    * deterministic sampler (identical in DuckDB via '0x'||substr(md5)). */
  def hash32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Keep a `rate` fraction of rows, decided per row by `key`. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(hash32(key) < threshold(rate))

  /** Per-stratum rates: e.g. downsample dominant classes of a training
    * corpus while keeping rare ones — `rates` maps stratum value →
    * fraction; strata not in the map keep `defaultRate`. */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
                           rates: Map[String, Double],
                           defaultRate: Double = 0.0): DataFrame = {
    val thr = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (value, rate)) => when(stratum === value, lit(threshold(rate))).otherwise(acc)
    }
    df.where(hash32(key) < thr)
  }

  /** Exact integer threshold for a [0,1] rate over the 2^32 hash space. */
  def threshold(rate: Double): Long = math.floor(rate * 4294967296.0).toLong

  /**
   * Deterministic dataset split (train/val/test and friends): assigns
   * each row a split label by where its key hash falls among the
   * cumulative weight thresholds — the standard leakage-safe way to
   * carve corpus slices, because a row's split is a pure function of
   * its key: stable across runs, engines, partitionings AND dataset
   * growth (new rows never move old rows between splits, unlike
   * per-run `randomSplit`). Weights are normalized; thresholds are
   * exact integers over the 2^32 hash space; `splits` order defines the
   * ranges. A null key hashes to null, which fails every `<` test and
   * lands in the LAST split — deterministic (and identical in SQL CASE
   * semantics), but filter nulls first if that's not intended.
   */
  def splitByHash(df: DataFrame, key: Column,
                  splits: Seq[(String, Double)],
                  labelCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), s"positive weights required: $splits")
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val h = hash32(key)
    // last label is the otherwise-branch: covers the full remaining range
    val expr = splits.init.zip(cum.init).reverse.foldLeft(lit(splits.last._1)) {
      case (acc, ((label, _), cumFrac)) =>
        when(h < lit(threshold(cumFrac)), lit(label)).otherwise(acc)
    }
    df.withColumn(labelCol, expr)
  }

  /**
   * Reproducible epoch shuffle WITHOUT a global sort: every row gets a
   * deterministic `(shard, order_key)` from `md5(seed ‖ key)` — readers
   * consume shards in index order, each shard internally ordered by
   * `order_key`, which is a fixed pseudo-random permutation of the
   * corpus for that seed. Changing the seed reshuffles; re-running
   * doesn't. Materialization is shard-parallel (`repartition(shard)` +
   * `sortWithinPartitions(order_key)` — one hash exchange, per-shard
   * local sorts), never one corpus-wide total order: the standard way
   * to shuffle a 100 TB training corpus per epoch.
   */
  def epochShuffle(df: DataFrame, key: Column, seed: Long,
                   nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val okey = md5(concat(lit(seed.toString), lit(":"), key.cast("string")))
    df.withColumn("order_key", okey)
      .withColumn("shard",
        (conv(substring(col("order_key"), 1, 8), 16, 10).cast("long") % nShards).cast("int"))
  }

  /**
   * Quantile-calibrated per-stratum gate with EXACT integer-rank
   * semantics: keep each stratum's top `pct`% rows by `score`
   * (deterministic `tieBreak` total order). The keep test is
   * `rank · 100 ≤ pct · n` — exact integers, so the cut is
   * engine-portable with no float threshold anywhere.
   *
   * Scale note: exact ranks cost one per-stratum sort (fine for
   * thousands of strata × millions of rows each; the window never
   * crosses strata). At corpus scales where even that is unwanted, the
   * standard shortcut is an `approx_percentile(score, 1−pct/100)`
   * threshold per stratum broadcast back as a filter — same intent,
   * sketch-bounded error, no sort; this exact form is the calibration
   * oracle for it.
   */
  def topFractionByStratum(df: DataFrame, stratum: Column, score: Column,
                           tieBreak: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct in [0,100]: $pct")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratum).orderBy(score.desc, tieBreak)
    val cw = Window.partitionBy(stratum)
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      // rank cast to LONG before the multiply: row_number is an Int and
      // an int `rank * 100` overflows past ~21.4M rows per stratum
      // (ANSI kills the job; legacy silently keeps wrong rows)
      .where(col("__rk").cast("long") * 100L <= lit(pct.toLong) * col("__n"))
      .drop("__rk", "__n")
  }
}
