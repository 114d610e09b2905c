package graft

import org.apache.spark.sql.DataFrame

/**
 * Physical-plan regression gate: the properties that make the flagship
 * queries scale — filter pushdown into the parquet scan, broadcast of
 * small sides, bounded exchange counts, codegen — asserted on the plan
 * string so a refactor can't silently trade them away. (Results are
 * covered by the oracle; THIS spec covers the plans.)
 */
class PlanQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    needle.r.findAllMatchIn(hay).length

  test("filter + projection push into the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      s"no pushed filter on l_shipdate:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double"),
      "projection not pruned to the 3 selected columns + filter column")
  }

  test("multi-way revenue join broadcasts the small dimensions") {
    val p = plan("q_join_revenue")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"nation/region should broadcast:\n$p")
  }

  test("funnel runs in one scan and one data exchange") {
    val p = plan("q_funnel")
    assert(count(p, "Scan parquet") == 1, s"funnel should scan once:\n$p")
    // one hash exchange for the user windows + the single-row final agg
    assert(count(p, "Exchange") <= 2, s"funnel should shuffle once:\n$p")
    assert(count(p, "Window") == 3, "three stage windows over one sort")
  }

  test("bloom semi join filters the fact scan before the join") {
    val p = plan("q_bloom_semi")
    assert(p.contains("LeftSemi"), "exact semi join must remain")
    // the probe is the NATIVE might_contain predicate (stays inside
    // whole-stage codegen — no UDF), sitting on the fact side
    assert(p.contains("might_contain") && p.indexOf("might_contain(") >= 0,
      s"native bloom probe not on the fact side:\n$p")
  }

  test("gap-fill joins broadcast the dimension grid") {
    val p = plan("q_gapfill")
    assert(count(p, "BroadcastExchange") >= 2,
      s"days grid and daily agg should broadcast:\n$p")
  }

  test("round-6 operators: no quadratic joins where hash joins suffice") {
    // bucketed near-dup candidates: hash join keyed (tbl, bucket);
    // all-pairs BNLJ is allowed ONLY in the exact baseline half of the
    // contract query, never in the bucketed candidate subtree
    val lsh = graft.ops.Similarity.cosineNearDupPairs(
      Tables(spark, sf, "embeddings"), threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!lsh.contains("BroadcastNestedLoopJoin") && !lsh.contains("CartesianProduct"),
      s"bucketed near-dup must not be quadratic:\n$lsh")
    assert(count(lsh, "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)") >= 1)
    // semantic dedup: within-cell pair join is keyed on cell, CC edges
    // never cross a cluster — no cartesian anywhere
    val sem = graft.ops.Similarity.semanticDedup(
      Tables(spark, sf, "embeddings"), threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!sem.contains("CartesianProduct"), s"semantic dedup cartesian:\n$sem")
  }

  test("vocab induction cuts with TakeOrdered and broadcasts the vocabulary") {
    val p = plan("q_vocab_oov")
    assert(p.contains("TakeOrderedAndProject(limit=16"),
      s"top-n vocab cut must be per-partition top-k + driver merge, not a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"n-row vocabulary must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("token entropy is a single scan and bounded exchanges, no joins") {
    val p = plan("q_token_entropy")
    assert(count(p, "Scan parquet") == 1, s"entropy should scan once:\n$p")
    // (doc,tok) agg + doc agg + the final orderBy range partitioning
    assert(count(p, "Exchange") <= 3, s"entropy should shuffle twice + sort:\n$p")
    assert(!p.contains("Join"), s"entropy needs no joins:\n$p")
  }

  test("domain KL serves off the pre-materialized aggregate, not a corpus re-scan") {
    // domainDivergence materializes its #domains-row result eagerly
    // (persisting the (domain,token) table for the four branches, then
    // releasing it) — the served plan must be the materialized rows,
    // with NO parquet re-scan and no join left to run per consumer
    val p = plan("q_domain_kl")
    assert(p.contains("Scan ExistingRDD"),
      s"expected the pre-materialized #domains-row result:\n$p")
    assert(!p.contains("Scan parquet") && !p.contains("Join"),
      s"serving the KL result must not re-scan or re-join the corpus:\n$p")
  }

  test("IVF+PQ: probe and lut joins are broadcast hash joins, nothing quadratic") {
    val p = plan("q_ann_ivfpq")
    assert(!p.contains("CartesianProduct"), s"IVFPQ must not be quadratic:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"(query,cell) probes and the ADC lut must broadcast:\n$p")
  }

  test("corpus diff shuffles fingerprints, scans only the three needed columns") {
    val p = plan("q_corpus_diff")
    assert(p.contains("FullOuter"), "diff is a full-outer id join")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
      s"diff must prune to id+text+source:\n$p")
  }

  test("q_dedup_embed_bucketed runs the production (tbl,bucket) hash-join plan") {
    // the hash-matched bucketed row must audit as the scale-path plan:
    // bucket-keyed hash join candidates + id-keyed verify, zero
    // quadratic operators anywhere
    val p = plan("q_dedup_embed_bucketed")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketed dedup query must not be quadratic:\n$p")
    assert(count(p, "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)") >= 3,
      s"expected candidate join + two verify joins as hash joins:\n$p")
  }

  test("exact near-dup baseline fails fast above its size guard") {
    val emb = Tables(spark, sf, "embeddings")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Similarity.cosineNearDupPairsExact(emb, threshold = 0.4, maxRows = 1)
    }
    assert(e.getMessage.contains("cosineNearDupPairs"),
      "guard message must point at the bucketed form")
  }

  test("round-7 corpus ops: broadcast-sized sides broadcast, nothing quadratic") {
    // DSIR scoring: the ratio table (≤nBuckets rows) and totals must
    // broadcast; the raw corpus shuffles only for its per-doc agg.
    // (BroadcastNestedLoopJoin is expected ONLY for the single-row
    // totals crossJoin — the same shape as q_unigram_logprob.)
    val dsir = plan("q_dsir_weights")
    assert(!dsir.contains("CartesianProduct"), s"dsir cartesian:\n$dsir")
    assert(count(dsir, "BroadcastHashJoin") >= 1,
      s"bucket-ratio join must be a broadcast hash join:\n$dsir")
    assert(count(dsir, "BroadcastExchange") >= 2,
      s"ratio table + totals should broadcast:\n$dsir")
    // KMV overlap: jaccardEstimate materializes its one-row result and
    // releases the sketch caches — the served plan is the materialized
    // row; the distributed-TakeOrdered property lives in the bottomK
    // building block, audited directly
    val kmv = plan("q_corpus_overlap")
    assert(kmv.contains("Scan ExistingRDD") && !kmv.contains("Scan parquet"),
      s"kmv overlap must serve the pre-materialized one-row result:\n$kmv")
    val bk = graft.ops.CorpusSketch.bottomK(
        Tables(spark, sf, "documents"), org.apache.spark.sql.functions.col("text"), 16)
      .queryExecution.executedPlan.toString
    assert(bk.contains("TakeOrderedAndProject"),
      s"bottom-k must run as distributed TakeOrdered, not a global sort:\n$bk")
    // corpus span dedup: chunk-keyed window + per-doc agg, nothing quadratic
    val chunk = plan("q_chunk_dedup")
    assert(!chunk.contains("CartesianProduct") && !chunk.contains("BroadcastNestedLoopJoin"),
      s"chunk dedup must not be quadratic:\n$chunk")
    // hash split / pii scan are narrow maps: a single scan, zero joins
    for (q <- Seq("q_split_hash", "q_pii_categories")) {
      val p = plan(q)
      assert(count(p, "Scan parquet") == 1 && !p.contains("Join"),
        s"$q must be a single-scan narrow map:\n$p")
    }
  }

  test("hot-path queries keep whole-stage codegen") {
    // an unexecuted AdaptiveSparkPlan reports 0 codegen subtrees; turn
    // AQE off for the inspection so the static plan shows its spans
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q1_agg", "q_minhash", "q_window_rank")) {
        val p = SparkEntry.queries(q)(spark, sf).queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
        val found = "Found (\\d+) WholeStageCodegen subtrees".r
          .findFirstMatchIn(p).map(_.group(1).toInt).getOrElse(0)
        assert(found > 0, s"$q lost codegen:\n${p.take(800)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
