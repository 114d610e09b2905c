package graft.engine

import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.nio.file.{Files, Path}

/**
 * CAR v1 (Content Addressable aRchive) — the container format the
 * reference's cold-retrieval path produces and then extracts the root
 * block from (`internal/app/retriever.go:88-233`: lassie fetch →
 * `car.WriteAsCarV1(true)` → `extract` = open, take `Roots()[0]`, stream
 * that block). The format is public and fully offline-parseable:
 *
 *   CAR v1 = varint(len) ‖ header ‖ block*
 *   header = DAG-CBOR map {"roots": [tag42 CID-link...], "version": 1}
 *   block  = varint(len(cid ‖ data)) ‖ cid ‖ data
 *
 * CIDs follow the CIDv1 spec (varint version ‖ varint codec ‖ multihash)
 * with CIDv0 (bare sha2-256 multihash) accepted on read; the string form
 * is multibase base32-lower ("b…") like the reference's ids.
 */
object CarV1 {

  // ── unsigned LEB128 varints ───────────────────────────────────────────
  def writeVarint(n0: Long, out: OutputStream): Unit = {
    require(n0 >= 0, s"negative varint: $n0")
    var n = n0
    while ((n & ~0x7fL) != 0) { out.write(((n & 0x7f) | 0x80).toInt); n >>>= 7 }
    out.write(n.toInt)
  }

  /** Returns -1 at clean EOF (before any byte). */
  def readVarint(in: InputStream): Long = {
    var shift = 0; var acc = 0L; var first = true
    while (true) {
      val b = in.read()
      if (b < 0) {
        if (first) return -1L
        throw new java.io.EOFException("truncated varint")
      }
      acc |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return acc
      shift += 7; first = false
      require(shift < 63, "varint too long")
    }
    acc
  }

  // ── CIDs ──────────────────────────────────────────────────────────────
  /** Multicodec ids (public multiformats tables). */
  val CodecRaw = 0x55
  val CodecDagPb = 0x70
  val CodecDagCbor = 0x71
  private val Sha256Code = 0x12

  final case class Cid(bytes: Array[Byte]) {
    def version: Int = if (isV0) 0 else bytes(0).toInt
    private def isV0 = bytes.length == 34 && bytes(0) == 0x12 && bytes(1) == 0x20
    /** Multibase string: CIDv1 → "b" + base32-lower; CIDv0 → hex fallback
      * (base58btc is the canonical v0 form; v0 appears only on read). */
    override def toString: String =
      if (isV0) bytes.map("%02x".format(_)).mkString
      else "b" + base32Lower(bytes)
    override def equals(o: Any): Boolean = o match {
      case c: Cid => java.util.Arrays.equals(bytes, c.bytes)
      case _ => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
  }

  object Cid {
    /** CIDv1 with a sha2-256 multihash of `data`. */
    def v1(codec: Int, data: Array[Byte]): Cid =
      v1FromDigest(codec, java.security.MessageDigest.getInstance("SHA-256").digest(data))

    /** CIDv1 from an already-computed sha2-256 digest (streamed hashing). */
    def v1FromDigest(codec: Int, digest: Array[Byte]): Cid = {
      require(digest.length == 32, "sha2-256 digest must be 32 bytes")
      val out = new ByteArrayOutputStream()
      writeVarint(1, out); writeVarint(codec, out)
      writeVarint(Sha256Code, out); writeVarint(32, out)
      out.write(digest)
      Cid(out.toByteArray)
    }

    /** Read one CID off a stream (inside a block frame). CIDv0 is a bare
      * sha2-256 multihash (0x12 0x20 ‖ 32 bytes); anything else is CIDv1:
      * varint version ‖ varint codec ‖ varint mh-code ‖ varint mh-len ‖
      * digest. */
    def read(in: InputStream): Cid = {
      val b0 = in.read(); val b1 = in.read()
      require(b0 >= 0 && b1 >= 0, "truncated cid")
      if (b0 == 0x12 && b1 == 0x20) {
        val digest = readFully(in, 32)
        Cid(Array(b0.toByte, b1.toByte) ++ digest)
      } else {
        // b0 = version varint (must be 1, single byte), b1 starts codec
        require(b0 == 1, s"unsupported cid version $b0")
        val out = new ByteArrayOutputStream()
        out.write(b0)
        var b = b1 // codec varint, continue if high bit set
        out.write(b)
        while ((b & 0x80) != 0) { b = in.read(); require(b >= 0, "truncated cid"); out.write(b) }
        val mhCode = readVarint(in); val mhLen = readVarint(in)
        require(mhLen >= 0 && mhLen <= 128, s"bad multihash length $mhLen")
        val hdr = new ByteArrayOutputStream()
        writeVarint(mhCode, hdr); writeVarint(mhLen, hdr)
        out.write(hdr.toByteArray)
        out.write(readFully(in, mhLen.toInt))
        Cid(out.toByteArray)
      }
    }
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new java.io.EOFException(s"expected $n bytes, got $off")
      off += r
    }
    buf
  }

  private def base32Lower(b: Array[Byte]): String = {
    val alphabet = "abcdefghijklmnopqrstuvwxyz234567"
    val sb = new StringBuilder
    var buffer = 0L; var bits = 0
    b.foreach { byte =>
      buffer = (buffer << 8) | (byte & 0xffL); bits += 8
      while (bits >= 5) { sb.append(alphabet(((buffer >> (bits - 5)) & 0x1f).toInt)); bits -= 5 }
    }
    if (bits > 0) sb.append(alphabet(((buffer << (5 - bits)) & 0x1f).toInt))
    sb.toString
  }

  // ── header DAG-CBOR ───────────────────────────────────────────────────
  /** {"roots": [...], "version": 1} with canonical (length-first) key
    * order, links as tag(42) over 0x00-prefixed CID bytes. */
  def encodeHeader(roots: Seq[Cid]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0xa2) // map(2)
    out.write(0x65); out.write("roots".getBytes("UTF-8")) // text(5)
    require(roots.size < 24, "too many roots")
    out.write(0x80 | roots.size) // array(n)
    roots.foreach { cid =>
      out.write(0xd8); out.write(42) // tag(42)
      val linkBytes = Array[Byte](0) ++ cid.bytes // identity multibase prefix
      require(linkBytes.length < 256, "cid too long")
      if (linkBytes.length < 24) out.write(0x40 | linkBytes.length)
      else { out.write(0x58); out.write(linkBytes.length) }
      out.write(linkBytes)
    }
    out.write(0x67); out.write("version".getBytes("UTF-8")) // text(7)
    out.write(0x01) // 1
    out.toByteArray
  }

  /** Minimal DAG-CBOR reader, just enough for CAR headers (accepts any
    * key order; rejects version != 1). */
  def decodeHeader(bytes: Array[Byte]): Seq[Cid] = {
    var pos = 0
    def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def arg(minor: Int): Long = minor match {
      case m if m < 24 => m
      case 24 => u8()
      case 25 => (u8() << 8) | u8()
      case 26 => (1 to 4).foldLeft(0L)((a, _) => (a << 8) | u8())
      case 27 => (1 to 8).foldLeft(0L)((a, _) => (a << 8) | u8())
      case m => throw new IllegalArgumentException(s"cbor minor $m")
    }
    def skipOrCollect(roots: scala.collection.mutable.Buffer[Cid], inRoots: Boolean): Any = {
      val ib = u8(); val major = ib >> 5; val minor = ib & 0x1f
      major match {
        case 0 | 1 => arg(minor) // ints
        case 2 => val n = arg(minor).toInt; val s = bytes.slice(pos, pos + n); pos += n; s
        case 3 => val n = arg(minor).toInt; val s = new String(bytes, pos, n, "UTF-8"); pos += n; s
        case 4 => val n = arg(minor).toInt; (1 to n).map(_ => skipOrCollect(roots, inRoots))
        case 5 =>
          val n = arg(minor).toInt
          (1 to n).foreach { _ =>
            val key = skipOrCollect(roots, inRoots = false)
            skipOrCollect(roots, inRoots = key == "roots")
          }
        case 6 =>
          val tag = arg(minor)
          val inner = skipOrCollect(roots, inRoots = false)
          if (tag == 42L) inner match {
            case link: Array[Byte] if link.nonEmpty && link(0) == 0 =>
              val cid = Cid(link.drop(1))
              if (inRoots) roots += cid
              cid
            case _ => throw new IllegalArgumentException("bad cid link")
          } else inner
        case 7 => if (minor >= 25) arg(minor) else minor // simple/float
      }
    }
    val roots = scala.collection.mutable.Buffer.empty[Cid]
    val top = {
      val save = pos
      val ib = bytes(save) & 0xff
      require(ib >> 5 == 5, "car header must be a cbor map")
      // walk the map, collecting roots and version
      var version = -1L
      pos = save
      val n = { val i = u8(); arg(i & 0x1f).toInt }
      (1 to n).foreach { _ =>
        val key = skipOrCollect(roots, inRoots = false)
        val value = skipOrCollect(roots, inRoots = key == "roots")
        if (key == "version") version = value.asInstanceOf[Long]
      }
      version
    }
    require(top == 1L, s"unsupported CAR version $top")
    roots.toSeq
  }

  // ── archive read/write ────────────────────────────────────────────────
  def write(path: Path, roots: Seq[Cid], blocks: Seq[(Cid, Array[Byte])]): Unit = {
    val out = new java.io.BufferedOutputStream(Files.newOutputStream(path))
    try {
      val header = encodeHeader(roots)
      writeVarint(header.length, out); out.write(header)
      blocks.foreach { case (cid, data) =>
        writeVarint(cid.bytes.length + data.length, out)
        out.write(cid.bytes); out.write(data)
      }
    } finally out.close()
  }

  /** Stream all blocks. Returns (roots, block iterator); the iterator must
    * be consumed before closing the stream. */
  def read(in: InputStream): (Seq[Cid], Iterator[(Cid, Array[Byte])]) = {
    val hlen = readVarint(in)
    require(hlen > 0, "empty CAR header")
    val roots = decodeHeader(readFully(in, hlen.toInt))
    val it = new Iterator[(Cid, Array[Byte])] {
      private var nextLen = readVarint(in)
      def hasNext: Boolean = nextLen > 0
      def next(): (Cid, Array[Byte]) = {
        val counting = new java.io.FilterInputStream(in) {
          var count = 0
          override def read(): Int = { val r = super.read(); if (r >= 0) count += 1; r }
          override def read(b: Array[Byte], off: Int, len: Int): Int = {
            val r = super.read(b, off, len); if (r > 0) count += r; r
          }
        }
        val cid = Cid.read(counting)
        val data = readFully(counting, (nextLen - counting.count).toInt)
        nextLen = readVarint(in)
        (cid, data)
      }
    }
    (roots, it)
  }

  /** `extract` (`retriever.go:216-233`): the payload of the first root's
    * block, or None if the file is not a CAR v1 / the root block is
    * absent. */
  def extract(path: Path): Option[Array[Byte]] = {
    val in = new java.io.BufferedInputStream(Files.newInputStream(path))
    try {
      val (roots, blocks) = read(in)
      val root = roots.headOption.getOrElse(return None)
      blocks.collectFirst { case (cid, data) if cid == root => data }
    } catch { case _: Exception => None }
    finally in.close()
  }

  /** Cheap sniff: does this file start with a parseable CAR v1 header? */
  def isCar(path: Path): Boolean = {
    val in = new java.io.BufferedInputStream(Files.newInputStream(path))
    try {
      val hlen = readVarint(in)
      hlen > 0 && hlen < (1L << 20) && decodeHeader(readFully(in, hlen.toInt)).nonEmpty
    } catch { case _: Exception => false }
    finally in.close()
  }
}
