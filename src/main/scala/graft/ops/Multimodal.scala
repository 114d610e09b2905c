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
 * and the codec is a pluggable [[MediaDecoder]] with two impls:
 * [[HeaderDecoder]] REALLY parses self-describing formats (BMP
 * dimensions, RIFF/WAVE sample rate + duration, WAV truncation as a
 * genuine transform) with pure-JVM byte arithmetic; [[StubDecoder]] is
 * the clearly-marked deterministic fake used for opaque synthetic
 * payloads (metadata derived from the bytes, so tests are stable) and
 * as HeaderDecoder's fallback — compressed codecs (JPEG/H.264/MP3)
 * would slot in behind the same trait via JNI/ffmpeg in prod.
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

  /**
   * REAL pure-JVM decoder for self-describing formats — no native libs
   * needed: BMP headers (width/height from the BITMAPINFOHEADER) and
   * RIFF/WAVE headers (channels, sample rate, duration from the fmt and
   * data chunks), parsed with plain little-endian arithmetic per the
   * public format specs. Payloads that are neither fall back to
   * `StubDecoder`, keeping the pipeline total. `transform(arg)` on a
   * WAV is a REAL media operation: truncate the audio to `arg`
   * milliseconds, rewriting the RIFF and data chunk sizes so the output
   * is itself a valid WAV (spec round-trips it through decode).
   */
  object HeaderDecoder extends MediaDecoder {
    private def leInt(p: Array[Byte], off: Int): Int =
      java.nio.ByteBuffer.wrap(p, off, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    private def leShort(p: Array[Byte], off: Int): Int =
      java.nio.ByteBuffer.wrap(p, off, 2).order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort.toInt
    private def tag(p: Array[Byte], off: Int): String =
      new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private def isBmp(p: Array[Byte]): Boolean =
      p.length >= 26 && p(0) == 'B' && p(1) == 'M'
    private def isWav(p: Array[Byte]): Boolean =
      p.length >= 44 && tag(p, 0) == "RIFF" && tag(p, 8) == "WAVE"

    private final case class Wav(channels: Int, sampleRate: Int, byteRate: Int,
                                 blockAlign: Int, dataOff: Int, dataLen: Int)

    private def parseWav(p: Array[Byte]): Option[Wav] = {
      var off = 12
      var fmt: Option[(Int, Int, Int, Int)] = None
      var data: Option[(Int, Int)] = None
      while (off + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(p, off)
        val size = leInt(p, off + 4)
        if (size < 0) return None
        if (id == "fmt " && off + 8 + 16 <= p.length)
          fmt = Some((leShort(p, off + 10), leInt(p, off + 12),
            leInt(p, off + 16), leShort(p, off + 20)))
        else if (id == "data")
          data = Some((off + 8, math.min(size.toLong, (p.length - off - 8).toLong).toInt))
        off += 8 + size + (size & 1) // chunks pad to even length
      }
      for ((ch, sr, br, ba) <- fmt; (d0, dl) <- data if br > 0)
        yield Wav(ch, sr, br, ba, d0, dl)
    }

    override def decode(id: Long, kind: String, payload: Array[Byte]): MediaMeta =
      if (isBmp(payload)) {
        // header-size field selects the layout: BITMAPINFOHEADER and its
        // V4/V5 extensions (>= 40) carry int32 dims at 18/22; the legacy
        // BITMAPCOREHEADER (12) carries int16 dims at 18/20
        val hdrSize = leInt(payload, 14)
        val (w, h) =
          if (hdrSize >= 40) (leInt(payload, 18), math.abs(leInt(payload, 22)))
          else (leShort(payload, 18), leShort(payload, 20))
        MediaMeta(id, "image", payload.length.toLong,
          width = w, height = h, durationMs = 0L, sampleRate = 0)
      }
      else if (isWav(payload)) parseWav(payload) match {
        case Some(w) =>
          MediaMeta(id, "audio", payload.length.toLong, width = 0, height = 0,
            durationMs = w.dataLen.toLong * 1000L / w.byteRate,
            sampleRate = w.sampleRate)
        case None => StubDecoder.decode(id, kind, payload)
      }
      else StubDecoder.decode(id, kind, payload)

    override def transform(payload: Array[Byte], arg: Int): Array[Byte] =
      if (isWav(payload)) parseWav(payload) match {
        case Some(w) =>
          val wantBytes = (w.byteRate.toLong * arg / 1000L) / w.blockAlign * w.blockAlign
          val keep = math.min(w.dataLen.toLong, math.max(0L, wantBytes)).toInt
          val out = java.util.Arrays.copyOf(payload, w.dataOff + keep)
          val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.putInt(4, out.length - 8)        // RIFF chunk size
          bb.putInt(w.dataOff - 4, keep)      // data chunk size
          out
        case None => StubDecoder.transform(payload, arg)
      }
      else StubDecoder.transform(payload, arg)
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
