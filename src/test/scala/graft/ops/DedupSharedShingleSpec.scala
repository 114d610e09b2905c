package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r20: the composed dedup pipelines derive minhash signatures AND the
  * Jaccard verify from ONE materialized distinct-shingle table instead
  * of re-shingling the corpus per stage. These pins prove the derived
  * forms are value-identical to the per-stage forms they replaced. */
class DedupSharedShingleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // byte twin
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup
    (4L, "completely different text about training data pipelines"),
    (5L, "the the the the the"),                         // repeated tokens
    (6L, "short"),                                       // <n tokens: raw-text shingle
    (7L, "")                                             // empty text
  ).toDF("doc_id", "text")

  test("minhashFromShingles(shingleTable) == minhashExploded (set min = multiset min)") {
    val shTab = Dedup.shingleTable(docs, "doc_id", "text", shingleN = 3)
    val a = Dedup.minhashFromShingles(shTab, k = 8, "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Dedup.minhashExploded(docs, k = 8).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("jaccardVerifyFromShingles(shingleTable) == jaccardVerify") {
    val cands = Seq((1L, 2L), (1L, 3L), (3L, 4L), (2L, 5L)).toDF("id_a", "id_b")
    val shTab = Dedup.shingleTable(docs, "doc_id", "text", shingleN = 3)
    val a = Dedup.jaccardVerifyFromShingles(cands, shTab, "doc_id")
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    val b = Dedup.jaccardVerify(cands, docs).orderBy("id_a", "id_b")
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // the twin pair is exactly 1.0 and the near pair strictly below it
    val j = Dedup.jaccardVerifyFromShingles(cands, shTab, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0 && j((1L, 3L)) < 1.0)
  }

  test("containmentVerifyFromShingles(shingleTable) == containmentVerify") {
    val cands = Seq((1L, 2L), (1L, 3L), (3L, 4L), (2L, 5L)).toDF("id_a", "id_b")
    val shTab = Dedup.shingleTable(docs, "doc_id", "text", shingleN = 3)
    val a = Dedup.containmentVerifyFromShingles(cands, shTab, "doc_id")
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    val b = Dedup.containmentVerify(cands, docs).orderBy("id_a", "id_b")
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("lshCandidatesFromSig(derived signatures) == lshCandidates") {
    val shTab = Dedup.shingleTable(docs, "doc_id", "text", shingleN = 3)
    val a = Dedup.lshCandidatesFromSig(
        Dedup.minhashFromShingles(shTab, 8, "doc_id"), "doc_id", 8, 4)
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    val b = Dedup.lshCandidates(docs, k = 8, bands = 4)
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
