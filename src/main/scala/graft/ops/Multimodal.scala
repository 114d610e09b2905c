package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns for training-data pipelines: image/audio/video
 * payloads travel as opaque `BINARY` columns with typed metadata structs.
 *
 * The Spark-side plumbing is real — schema, per-partition batched decode
 * via `mapPartitions` (the Scala analog of `mapInPandas`: one iterator
 * per partition, decoder state reused across rows), partition sizing —
 * while the actual codec is a pluggable [[MediaDecoder]]; this container
 * has no image/audio libraries, so the default [[StubDecoder]] is a
 * clearly-marked deterministic fake (metadata derived from the bytes, so
 * tests are stable).
 *
 * Scale notes: payload bytes never shuffle — decode/feature steps are
 * narrow maps; only extracted metadata/features (small) flow into joins
 * and aggregations. Control partition size with
 * `spark.sql.files.maxPartitionBytes` so one partition's payloads fit in
 * executor memory.
 */
object Multimodal {

  /** Typed metadata extracted per media payload. */
  final case class MediaMeta(
      id: Long,
      kind: String,            // image | audio | video
      nBytes: Long,
      width: Int, height: Int, // images/video
      durationMs: Long,        // audio/video
      sampleRate: Int)         // audio

  /** Per-partition decoder: instantiated once per partition (expensive
    * codec init amortized), fed payloads in order. */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, kind: String, payload: Array[Byte]): MediaMeta
    /** Re-encode transform (resize/frame-sample); stub = prefix slice. */
    def transform(payload: Array[Byte], arg: Int): Array[Byte]
  }

  /** STUB — deterministic fake standing in for a real codec (no
    * image/audio libs in this container). Metadata is a pure function of
    * the payload's md5 (engine-portable, so the decode pass is
    * oracle-checkable end to end); replace with a JNI/ffmpeg-backed impl
    * in prod. */
  object StubDecoder extends MediaDecoder {
    override def decode(id: Long, kind: String, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      val hex = java.security.MessageDigest.getInstance("MD5").digest(payload)
        .map("%02x".format(_)).mkString
      val h1 = java.lang.Integer.parseInt(hex.substring(0, 4), 16)
      val h2 = java.lang.Integer.parseInt(hex.substring(4, 8), 16)
      MediaMeta(id, kind, n,
        width = 16 + h1 % 1024, height = 16 + h2 % 1024,
        durationMs = n * 20, sampleRate = 16000)
    }
    override def transform(payload: Array[Byte], arg: Int): Array[Byte] =
      payload.take(math.max(1, math.min(arg, payload.length)))
  }

  /** Decode pass: (id, kind, payload) → typed MediaMeta dataset, one
    * decoder per partition, streamed batch shape. */
  def decodeMeta(media: DataFrame, decoder: MediaDecoder = StubDecoder,
                 idCol: String = "media_id", kindCol: String = "kind",
                 payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val rows = media.select(col(idCol).cast("long"), col(kindCol), col(payloadCol))
    rows.mapPartitions { it =>
      // decoder init happens here, once per partition (mapInPandas-style)
      val d = decoder
      it.map(r => d.decode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
    }(Encoders.product[MediaMeta])
  }

  /** Feature/transform pass: payload → transformed payload (e.g. resize,
    * frame-sample), keeping the pipeline binary-in/binary-out. */
  def transformPayload(media: DataFrame, arg: Int,
                       decoder: MediaDecoder = StubDecoder,
                       idCol: String = "media_id",
                       payloadCol: String = "payload"): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { it =>
        val d = decoder
        it.map(r => (r.getLong(0), d.transform(r.getAs[Array[Byte]](1), arg)))
      }(enc)
      .toDF(idCol, "payload")
  }

  /**
   * Frame sampling plumbing: one row per sampled frame timestamp,
   * `everyMs` apart over `[0, duration_ms)` (at least one frame). The
   * actual frame EXTRACTION is the decoder's `transform` (stubbed here —
   * no codecs in this container); this operator is the real Spark side:
   * timestamp generation is a narrow `sequence` + `posexplode`, so frame
   * rows are produced partition-locally and only (id, frame_no, t_ms)
   * tuples flow downstream — payload bytes never fan out per frame.
   */
  def frameSamples(media: DataFrame, everyMs: Int,
                   idCol: String = "media_id",
                   durCol: String = "duration_ms"): DataFrame =
    media.select(col(idCol),
        posexplode(sequence(lit(0L),
          greatest(col(durCol).cast("long") - 1L, lit(0L)),
          lit(everyMs.toLong))).as(Seq("frame_no", "t_ms")))
      .select(col(idCol), col("frame_no").cast("long").as("frame_no"), col("t_ms"))

  /** Synthesize a media table from documents (test/demo input: payload =
    * UTF-8 bytes; kind round-robins deterministically). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))
}
