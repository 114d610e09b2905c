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

  /** Hand-built fixtures per the public BMP / RIFF-WAVE specs. */
  private def bmp(w: Int, h: Int): Array[Byte] = {
    // 14-byte file header + 40-byte BITMAPINFOHEADER (no pixel data —
    // only headers are decoded): width int32 @18, height int32 @22
    val b = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54).putInt(0).putInt(54) // file size, reserved, pixel offset
    b.putInt(40)                      // BITMAPINFOHEADER size
    b.putInt(w).putInt(h)
    b.putShort(1).putShort(24)        // planes, bits per pixel
    b.array()                         // remaining INFO fields stay zero
  }

  private def wav(sampleRate: Int, samples: Int): Array[Byte] = {
    val dataLen = samples * 2 // 16-bit mono
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    b.put("data".getBytes).putInt(dataLen)
    (0 until samples).foreach(i => b.putShort((i % 1000).toShort))
    b.array()
  }

  test("HeaderDecoder really parses BMP and WAV headers") {
    val meta = Multimodal.HeaderDecoder.decode(1L, "image", bmp(640, 480))
    assert(meta.width == 640 && meta.height == 480 && meta.kind == "image")

    // 8 kHz mono 16-bit, 800 samples = exactly 100 ms
    val audio = Multimodal.HeaderDecoder.decode(2L, "audio", wav(8000, 800))
    assert(audio.sampleRate == 8000 && audio.durationMs == 100L)

    // unknown bytes fall back to the stub (pipeline stays total)
    val fb = Multimodal.HeaderDecoder.decode(3L, "video", Array[Byte](1, 2, 3))
    assert(fb.nBytes == 3L && fb.sampleRate == 16000)
  }

  test("HeaderDecoder WAV truncation emits a valid WAV of the requested length") {
    val full = wav(8000, 800)                             // 100 ms
    val cut = Multimodal.HeaderDecoder.transform(full, 50) // -> 50 ms
    val meta = Multimodal.HeaderDecoder.decode(9L, "audio", cut)
    assert(meta.durationMs == 50L, s"got $meta")
    assert(meta.sampleRate == 8000)
    assert(cut.length == 44 + 400 * 2, "data truncated to 400 samples + header")
    // idempotent beyond the available audio: asking for more keeps all
    assert(Multimodal.HeaderDecoder.transform(cut, 500).length == cut.length)
  }

  test("decodeMeta runs the real decoder distributed (mapPartitions path)") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", bmp(32, 16)),
      (2L, "audio", wav(16000, 1600))
    ).toDF("media_id", "kind", "payload").repartition(2)
    val out = Multimodal.decodeMeta(media, Multimodal.HeaderDecoder)
      .collect().sortBy(_.id)
    assert(out(0).width == 32 && out(0).height == 16)
    assert(out(1).sampleRate == 16000 && out(1).durationMs == 100L)
  }

  /** Real PNG via the JDK's own encoder — the independent oracle for
    * our hand-rolled chunk/inflate/unfilter pipeline. */
  private def png(w: Int, h: Int): (Array[Byte], java.awt.image.BufferedImage) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y) % 256 << 16) | ((y * 13) % 256 << 8) | ((x * 3) % 256))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    (buf.toByteArray, img)
  }

  test("HeaderDecoder parses real PNG dims (ImageIO-encoded)") {
    val (bytes, _) = png(21, 13)
    val meta = Multimodal.HeaderDecoder.decode(7L, "image", bytes)
    assert(meta.kind == "image" && meta.width == 21 && meta.height == 13, meta.toString)
  }

  test("PNG crop: inflate + unfilter + re-encode round-trips through ImageIO pixel-exact") {
    val (bytes, orig) = png(21, 13)
    val cropped = Multimodal.HeaderDecoder.transform(bytes, 8)
    // our own decoder sees the new dims
    val meta = Multimodal.HeaderDecoder.decode(7L, "image", cropped)
    assert(meta.width == 8 && meta.height == 8, meta.toString)
    // the JDK reader accepts our file and every pixel equals the
    // original's top-left 8x8 window
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cropped))
    assert(back != null && back.getWidth == 8 && back.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 8)
      assert((back.getRGB(x, y) & 0xFFFFFF) == (orig.getRGB(x, y) & 0xFFFFFF),
        s"pixel ($x,$y) differs")
    // arg larger than the image clamps to full size
    val full = Multimodal.HeaderDecoder.transform(bytes, 999)
    val fb = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(full))
    assert(fb.getWidth == 21 && fb.getHeight == 13)
  }

  /** Real JPEG via the JDK's own encoder (baseline SOF0; progressive
    * SOF2 when requested) — the independent oracle for the T.81 marker
    * scan. */
  private def jpeg(w: Int, h: Int, progressive: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 5 + y) % 256 << 16) | ((y * 11) % 256 << 8) | ((x * 2) % 256))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    if (progressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val buf = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(out)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    out.close(); writer.dispose()
    buf.toByteArray
  }

  test("HeaderDecoder parses real JPEG dims: baseline SOF0 and progressive SOF2") {
    val base = jpeg(37, 23)
    // the fixture really is a JPEG with a frame header present
    assert((base(0) & 0xFF) == 0xFF && (base(1) & 0xFF) == 0xD8)
    val m0 = Multimodal.HeaderDecoder.decode(1L, "image", base)
    assert(m0.kind == "image" && m0.width == 37 && m0.height == 23, m0.toString)

    val prog = jpeg(64, 48, progressive = true)
    val m2 = Multimodal.HeaderDecoder.decode(2L, "image", prog)
    assert(m2.width == 64 && m2.height == 48, m2.toString)

    // a truncated payload (cut before any SOFn) falls back to the stub
    // instead of failing the pipeline
    val cut = java.util.Arrays.copyOf(base, 8)
    val ms = Multimodal.HeaderDecoder.decode(3L, "image", cut)
    assert(ms == Multimodal.StubDecoder.decode(3L, "image", cut))

    // and the distributed decode path carries JPEG rows like any other
    import spark.implicits._
    val media = Seq((1L, "image", base), (2L, "image", prog))
      .toDF("media_id", "kind", "payload").repartition(2)
    val out = Multimodal.decodeMeta(media, Multimodal.HeaderDecoder)
      .collect().sortBy(_.id)
    assert(out.map(m => (m.width, m.height)).toSeq == Seq((37, 23), (64, 48)))
  }
}
