package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot diff between two corpus versions — the ingest audit that
 * gates promotion of a refreshed corpus: per source, how many documents
 * were added, removed, changed (same id, different content fingerprint)
 * or unchanged. A sudden spike in `changed`/`removed` on a source is
 * the canonical upstream-regression alarm; `added` drives incremental
 * downstream work (dedup admission, re-embedding) instead of full
 * recomputation.
 *
 * Scale shape: fingerprints are computed in a narrow projection, so the
 * full-outer join shuffles only (id, source, 32-B md5) rows — never
 * document payloads; the report is one aggregation over the joined ids.
 * At 100 TB this is two fingerprint scans + one id-keyed shuffle.
 */
object CorpusDiff {

  /** Per-source diff report: (keyCol, n_added, n_removed, n_changed,
    * n_unchanged), derived from a full-outer id join of content
    * fingerprints. */
  def report(cur: DataFrame, prev: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             keyCol: String = "source"): DataFrame = {
    def fp(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol), col(keyCol).as(s"${side}_key"),
        md5(col(textCol)).as(s"${side}_fp"))
    val joined = fp(cur, "cur").join(fp(prev, "prev"), Seq(idCol), "full_outer")
    val status = when(col("prev_fp").isNull, "added")
      .when(col("cur_fp").isNull, "removed")
      .when(col("cur_fp") =!= col("prev_fp"), "changed")
      .otherwise("unchanged")
    joined
      .select(coalesce(col("cur_key"), col("prev_key")).as(keyCol), status.as("st"))
      .groupBy(keyCol)
      .agg(
        sum(when(col("st") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("st") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("st") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("st") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }
}
