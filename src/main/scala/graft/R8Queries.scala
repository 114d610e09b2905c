package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Bpe

/**
 * Round-8 additions: learned BPE merge-table training and application —
 * the tokenizer-prep pass of a pretraining pipeline, with a FULL
 * hash-match oracle: the DuckDB SQL replays the entire iterative
 * training loop (generated, materialized CTE per merge round) rather
 * than asserting contract flags, because one BPE merge is expressible
 * as one engine-portable string replace (see [[graft.ops.Bpe]]).
 */
object R8Queries {

  /** Fixed merge count: deterministic, matched by the generated oracle. */
  val BpeMerges = 20

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](

    // ── learned BPE merge table (training replayed by the oracle) ──────
    "q_bpe_train" -> ((s, dir) => {
      val merges = Bpe.train(Tables(s, dir, "documents"), nMerges = BpeMerges)
      import s.implicits._
      merges.map(m => (m.rank.toLong, m.l, m.r, m.l + m.r, m.count))
        .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
        .orderBy("merge_rank")
    }),

    // ── BPE application: per-doc token counts under the learned table ──
    // (narrow nested-replace expression over the corpus — no shuffle
    // beyond training's vocab reduction; at 100 TB this runs at
    // parquet-scan speed with only doc_id+text read)
    "q_bpe_tokens" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val merges = Bpe.train(docs, nMerges = BpeMerges)
      docs.select(col("doc_id"),
          Bpe.tokenCountAfter(col("text"), merges).as("n_bpe"))
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_bpe_train"  -> Bpe.trainOracleSql(BpeMerges),
    "q_bpe_tokens" -> Bpe.tokensOracleSql(BpeMerges)
  )
}
