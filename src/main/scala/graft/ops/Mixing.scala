package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Domain-mixture budgeting for pretraining corpora: given per-domain
 * token counts and a total token budget, allocate each domain
 * min(tokens, L) where the water level L is the largest integer with
 * sum(min(tokens_i, L)) <= budget — the classic water-filling cap that
 * keeps small domains intact and trims dominant ones (the "no domain
 * above its fair share unless others leave room" mixing rule).
 *
 * Scale design: the input to the allocation is the per-domain aggregate —
 * domain cardinality (dozens-to-thousands), not corpus cardinality — so
 * the unpartitioned windows here are O(#domains) on purpose. The corpus-
 * scale work (the token-count aggregation) happens before this operator
 * as an ordinary map-side-combined groupBy.
 *
 * All arithmetic is exact BIGINT (floor divisions), so allocations are
 * deterministic and engine-portable; the only double is the final
 * `share` ratio (one division). The floor may leave < #domains tokens of
 * the budget unassigned — standard, and callers can hand the remainder
 * to any domain deterministically if they need exact exhaustion.
 */
object Mixing {

  /**
   * Water-fill allocation. `counts` must have one row per domain with
   * (`keyCol`, `tokensCol`); returns (key, n_tokens, alloc, capped,
   * share) with share = alloc / budget.
   *
   * Derivation of the closed form used below: sort domains by ascending
   * token count. If domain i (1-based rank, cum_{i-1} tokens before it,
   * k-i+1 domains at or after it) were the first CAPPED domain, every
   * later domain is also capped (they're larger), so the level would be
   * L_i = (budget - cum_{i-1}) div (k-i+1). Domain i actually IS capped
   * iff L_i < tokens_i; cappedness is monotone in i, so the first capped
   * rank fc determines L = L_fc, and alloc = min(tokens, L).
   */
  def waterfillBudget(counts: DataFrame, budget: Column,
                      keyCol: String = "domain",
                      tokensCol: String = "n_tokens"): DataFrame = {
    val wAll = Window.partitionBy()
    val wOrd = Window.orderBy(col(tokensCol), col(keyCol))
    val ranked = counts
      .withColumn("__budget", budget.cast("long"))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__cum_before",
        coalesce(sum(col(tokensCol)).over(wOrd), lit(0L)) - col(tokensCol))
      .withColumn("__cand",
        expr(s"(__budget - __cum_before) div (__k - __rn + 1)"))
      .withColumn("__capped_here", col("__cand") < col(tokensCol))
    val leveled = ranked
      .withColumn("__fc",
        min(when(col("__capped_here"), col("__rn"))).over(wAll))
      .withColumn("__level",
        max(when(col("__rn") === col("__fc"), col("__cand"))).over(wAll))
    leveled.select(
      col(keyCol),
      col(tokensCol),
      when(col("__fc").isNull, col(tokensCol))
        .otherwise(least(col(tokensCol), col("__level"))).as("alloc"),
      (col("__fc").isNotNull && col(tokensCol) > col("__level")).cast("int")
        .as("capped"),
      (when(col("__fc").isNull, col(tokensCol))
        .otherwise(least(col(tokensCol), col("__level"))).cast("double") /
        col("__budget").cast("double")).as("share"))
  }

  /**
   * Temperature-scaled mixture weights — the multilingual/multi-domain
   * α-sampling recipe (public literature: mBERT / XLM-R exponentiated
   * sampling): sampling weight `w_i ∝ (n_i / N)^α` with α ∈ (0, 1].
   * α = 1 recovers proportional-to-size sampling; α → 0 approaches
   * uniform, up-weighting low-resource domains at the cost of repeating
   * them. Returns (key, n_tokens, weight, eff_tokens, epochs):
   * `eff_tokens = ⌊weight · budget⌋` is the domain's token draw under
   * the budget and `epochs = weight · budget / n_tokens` its repeat
   * factor (> 1 ⇒ the domain is oversampled).
   *
   * Same scale shape as [[waterfillBudget]]: inputs are per-domain
   * aggregates, so the unpartitioned windows are O(#domains).
   */
  def temperatureWeights(counts: DataFrame, alpha: Double, budget: Column,
                         keyCol: String = "domain",
                         tokensCol: String = "n_tokens"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val wAll = Window.partitionBy()
    counts
      .withColumn("__budget", budget.cast("long"))
      .withColumn("__p",
        pow(col(tokensCol).cast("double") / sum(col(tokensCol)).over(wAll), alpha))
      .withColumn("__w", col("__p") / sum(col("__p")).over(wAll))
      .select(
        col(keyCol),
        col(tokensCol),
        round(col("__w"), 6).as("weight"),
        floor(col("__w") * col("__budget")).cast("long").as("eff_tokens"),
        round(col("__w") * col("__budget") / col(tokensCol).cast("double"), 6)
          .as("epochs"))
  }

  /**
   * Deterministic mixture materialization — executes a per-domain repeat
   * schedule (e.g. [[temperatureWeights]]' `epochs` column) over the
   * corpus without RNG state: every document gets ⌊rate⌋ guaranteed
   * copies plus one more iff a 32-bit md5-derived uniform of its id
   * falls under the fractional part — [[TextAnalysis.hashSample]]'s
   * trick lifted to rates > 1. Reproducible across engines, runs and
   * partitionings, so a train-set manifest is a stable, re-derivable
   * artifact rather than a frozen file.
   *
   * Float discipline: the per-doc decision is the integer compare
   * `h32 < ⌊frac(rate)·2^32⌋`; `rate` arrives pre-rounded (6dp) from
   * the weights step, so the threshold is the same double in any
   * engine and the boundary cannot drift cross-libm.
   *
   * Scale shape: `rates` is O(#domains) and broadcasts; the corpus pass
   * is a narrow codegen'd projection (hash + compare), no shuffle.
   * Returns (idCol, keyCol, n_copies > 0); explode a `sequence` over
   * n_copies to physically repeat rows when writing.
   */
  def materializeMixture(docs: DataFrame, rates: DataFrame,
                         keyCol: String = "source", idCol: String = "doc_id",
                         rateCol: String = "rate"): DataFrame = {
    val h32 = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
    docs.join(broadcast(rates.select(col(keyCol), col(rateCol))), Seq(keyCol))
      .withColumn("__floor", floor(col(rateCol)).cast("long"))
      .withColumn("__thresh",
        floor((col(rateCol) - col("__floor")) * lit(4294967296.0)).cast("long"))
      .withColumn("n_copies", col("__floor") + (h32 < col("__thresh")).cast("long"))
      .where(col("n_copies") > 0)
      .select(col(idCol), col(keyCol), col("n_copies"))
  }

  /**
   * Per-domain unigram KL divergence vs the whole corpus, in bits — the
   * domain-shift diagnostic behind mixture re-weighting: domains whose
   * token distribution diverges hardest from the pooled corpus are the
   * ones a temperature/importance schedule most re-weights, and a sudden
   * KL jump on re-ingest is the canonical drift alarm. Every domain
   * token appears in the pooled corpus, so q > 0 and the sum is finite;
   * KL ≥ 0 by Gibbs' inequality (spec-pinned).
   *
   * Scale shape: ONE corpus-scale aggregation — the map-side-combined
   * (domain, token) count, persisted because four aggregate-sized
   * derivations (per-domain totals, corpus token table, grand total,
   * ratio join) branch from it and would otherwise each re-scan the
   * corpus (exchange reuse does not dedup them: join-side nullability
   * filters split the canonical subtrees). The persisted table is
   * #domains × vocab rows — orders of magnitude below corpus size. The
   * log argument `c·T / (n·cc)` is a ratio of exact integer products,
   * so the only float steps are one divide, one log2, one multiply per
   * (domain, token) row — rounded at 6 after the sum, the cross-libm
   * discipline.
   */
  def domainDivergence(docs: DataFrame, keyCol: String = "source",
                       textCol: String = "text"): DataFrame = {
    val dt = docs
      .select(col(keyCol), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col(keyCol), col("tok")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dTot = dt.groupBy(col(keyCol)).agg(sum("c").as("n"))
    val corpus = dt.groupBy("tok").agg(sum("c").as("cc"))
    val total = corpus.agg(sum("cc").as("tt"))
    val out = dt.join(broadcast(dTot), Seq(keyCol))
      .join(broadcast(corpus), Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n_tokens"),
        round(sum((col("c").cast("double") / col("n").cast("double")) *
          log2((col("c").cast("double") * col("tt").cast("double")) /
               (col("n").cast("double") * col("cc").cast("double")))), 6)
          .as("kl_bits"))
    // the result is #domains rows: materialize it, then drop the cached
    // (domain, token) table so a long-lived session doesn't leak a
    // corpus-vocab-sized block per invocation
    val spark = docs.sparkSession
    val rows = out.collect()
    dt.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
  }
}
