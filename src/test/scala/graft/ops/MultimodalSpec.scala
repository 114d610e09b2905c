package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing spec: binary columns, typed metadata, partition-
  * batched stub decode, binary-in/binary-out transforms. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "image", "aaaa".getBytes("UTF-8")),
    (2L, "audio", "bbbbbbbb".getBytes("UTF-8")),
    (3L, "video", "cc".getBytes("UTF-8"))
  ).toDF("media_id", "kind", "payload")

  test("decodeMeta: typed metadata, deterministic stub") {
    val meta = Multimodal.decodeMeta(media).collect().sortBy(_.id)
    assert(meta.map(_.id).toSeq == Seq(1L, 2L, 3L))
    assert(meta.map(_.nBytes).toSeq == Seq(4L, 8L, 2L))
    assert(meta.forall(m => m.width >= 16 && m.height >= 16))
    // deterministic: same input → same metadata across runs/partitions
    val again = Multimodal.decodeMeta(media.repartition(3)).collect().sortBy(_.id)
    assert(meta.toSeq == again.toSeq)
  }

  test("transformPayload keeps binary schema and is size-bounded") {
    val out = Multimodal.transformPayload(media, arg = 3)
    assert(out.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val sizes = out.select(col("media_id"), length(col("payload")))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(sizes == Map(1L -> 3, 2L -> 3, 3L -> 2))
  }

  test("fromDocuments synthesizes stable kinds and payloads") {
    val docs = Seq((0L, "abc"), (1L, "de"), (2L, "f")).toDF("doc_id", "text")
    val m = Multimodal.fromDocuments(docs).collect().sortBy(_.getLong(0))
    assert(m.map(_.getString(1)).toSeq == Seq("image", "audio", "video"))
    assert(m.map(_.getAs[Array[Byte]]("payload").length).toSeq == Seq(3, 2, 1))
  }
}
