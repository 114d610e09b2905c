package graft.crypto

/**
 * Pure-Scala Keccak-256 (original Keccak padding 0x01, as used by
 * Ethereum — not NIST SHA3's 0x06). Public-knowledge algorithm
 * (FIPS-202 / Keccak reference); implemented from the spec because the
 * build is offline (SURVEY §7.4 risk 4).
 *
 * Replaces the reference's use of go-ethereum's keccak256
 * (`pkg/signing/signing.go:47-57`). Validated against the reference's
 * golden vector (`pkg/signing/signing_test.go:38-39`) and the standard
 * empty-string digest.
 */
object Keccak256 {
  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808AL, 0x8000000080008000L,
    0x000000000000808BL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008AL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000AL,
    0x000000008000808BL, 0x800000000000008BL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800AL, 0x800000008000000AL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets r[x][y]
  private val R: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private val RATE = 136 // bytes, for 256-bit output

  private def rotl(x: Long, n: Int): Long =
    if (n == 0) x else (x << n) | (x >>> (64 - n))

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) { c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20); x += 1 }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) = rotl(a(x + 5 * y), R(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  /** Incremental hasher for streaming use (4 KB chunks like the reference). */
  final class Hasher {
    private val state = new Array[Long](25)
    private val buf = new Array[Byte](RATE)
    private var bufLen = 0

    def update(bytes: Array[Byte], off: Int, len: Int): this.type = {
      var i = off
      val end = off + len
      while (i < end) {
        val take = math.min(RATE - bufLen, end - i)
        System.arraycopy(bytes, i, buf, bufLen, take)
        bufLen += take
        i += take
        if (bufLen == RATE) { absorb(); bufLen = 0 }
      }
      this
    }

    def update(bytes: Array[Byte]): this.type = update(bytes, 0, bytes.length)

    private def absorb(): Unit = {
      var lane = 0
      while (lane < RATE / 8) {
        var v = 0L
        var j = 7
        while (j >= 0) { v = (v << 8) | (buf(lane * 8 + j) & 0xFFL); j -= 1 }
        state(lane) ^= v
        lane += 1
      }
      keccakF(state)
    }

    def digest(): Array[Byte] = {
      // pad: 0x01 ... 0x80 (multi-rate padding with Keccak domain bit)
      java.util.Arrays.fill(buf, bufLen, RATE, 0.toByte)
      buf(bufLen) = 0x01.toByte
      buf(RATE - 1) = (buf(RATE - 1) | 0x80).toByte
      absorb()
      val out = new Array[Byte](32)
      var i = 0
      while (i < 32) { out(i) = ((state(i / 8) >>> (8 * (i % 8))) & 0xFF).toByte; i += 1 }
      out
    }
  }

  def hash(bytes: Array[Byte]): Array[Byte] = new Hasher().update(bytes).digest()

  def hashHex(bytes: Array[Byte]): String =
    hash(bytes).map("%02x".format(_)).mkString
}
