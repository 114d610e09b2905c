package graft.crypto

import java.math.BigInteger
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/**
 * secp256k1 ECDSA with RFC 6979 deterministic nonces and Ethereum-style
 * 65-byte recoverable signatures (r ‖ s ‖ recid, low-s normalized).
 *
 * Pure-JVM implementation from public specs (SEC 2 curve parameters,
 * RFC 6979) because the build is offline (SURVEY §7.4 risk 4). Replaces
 * the reference's go-ethereum `crypto.Sign`
 * (`pkg/signing/signing.go:96-124`); byte-identical output is validated
 * by the golden vector in `pkg/signing/signing_test.go:13-39`.
 * Performance is irrelevant here — signing is per exported file, not per
 * row (C1 in SURVEY §2).
 */
object Secp256k1 {
  val P: BigInteger = new BigInteger(
    "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F", 16)
  val N: BigInteger = new BigInteger(
    "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141", 16)
  private val Gx = new BigInteger(
    "79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798", 16)
  private val Gy = new BigInteger(
    "483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8", 16)
  private val ZERO = BigInteger.ZERO
  private val HALF_N = N.shiftRight(1)

  /** Affine point; None = point at infinity. */
  type Point = Option[(BigInteger, BigInteger)]
  val G: Point = Some((Gx, Gy))

  private def modInv(a: BigInteger, m: BigInteger): BigInteger = a.modInverse(m)

  def add(p1: Point, p2: Point): Point = (p1, p2) match {
    case (None, p) => p
    case (p, None) => p
    case (Some((x1, y1)), Some((x2, y2))) =>
      if (x1 == x2) {
        if (y1.add(y2).mod(P) == ZERO) None // inverse points
        else double(p1)
      } else {
        val l = y2.subtract(y1).multiply(modInv(x2.subtract(x1).mod(P), P)).mod(P)
        val x3 = l.multiply(l).subtract(x1).subtract(x2).mod(P)
        val y3 = l.multiply(x1.subtract(x3)).subtract(y1).mod(P)
        Some((x3, y3))
      }
  }

  def double(p: Point): Point = p match {
    case None => None
    case Some((x, y)) =>
      if (y == ZERO) None
      else {
        val l = x.multiply(x).multiply(BigInteger.valueOf(3))
          .multiply(modInv(y.shiftLeft(1).mod(P), P)).mod(P)
        val x3 = l.multiply(l).subtract(x.shiftLeft(1)).mod(P)
        val y3 = l.multiply(x.subtract(x3)).subtract(y).mod(P)
        Some((x3, y3))
      }
  }

  def mul(k: BigInteger, p: Point): Point = {
    var result: Point = None
    var addend = p
    var n = k.mod(N)
    while (n.signum() > 0) {
      if (n.testBit(0)) result = add(result, addend)
      addend = double(addend)
      n = n.shiftRight(1)
    }
    result
  }

  def pubKey(priv: BigInteger): (BigInteger, BigInteger) = mul(priv, G).get

  /** Uncompressed SEC1 pubkey (0x04 ‖ X ‖ Y). */
  def pubKeyBytes(priv: BigInteger): Array[Byte] = {
    val (x, y) = pubKey(priv)
    Array[Byte](0x04) ++ to32(x) ++ to32(y)
  }

  /** Ethereum address: last 20 bytes of keccak256(pubkey sans 0x04 prefix). */
  def ethAddress(priv: BigInteger): String = {
    val pk = pubKeyBytes(priv).drop(1)
    "0x" + Keccak256.hash(pk).takeRight(20).map("%02x".format(_)).mkString
  }

  def to32(i: BigInteger): Array[Byte] = {
    val raw = i.toByteArray.dropWhile(_ == 0)
    require(raw.length <= 32, "value too large")
    new Array[Byte](32 - raw.length) ++ raw
  }

  private def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  /** RFC 6979 §3.2 deterministic nonce (SHA-256, 256-bit curve). */
  def rfc6979Nonce(privKey: BigInteger, msgHash: Array[Byte]): BigInteger = {
    val x = to32(privKey)
    // bits2octets: int(h1) mod n (≡ h1 itself except with prob ~2^-128)
    val h1 = to32(new BigInteger(1, msgHash).mod(N))
    var v = Array.fill[Byte](32)(0x01)
    var k = Array.fill[Byte](32)(0x00)
    k = hmacSha256(k, v ++ Array[Byte](0x00) ++ x ++ h1)
    v = hmacSha256(k, v)
    k = hmacSha256(k, v ++ Array[Byte](0x01) ++ x ++ h1)
    v = hmacSha256(k, v)
    while (true) {
      v = hmacSha256(k, v)
      val cand = new BigInteger(1, v)
      if (cand.signum() > 0 && cand.compareTo(N) < 0) return cand
      k = hmacSha256(k, v ++ Array[Byte](0x00))
      v = hmacSha256(k, v)
    }
    throw new IllegalStateException("unreachable")
  }

  /**
   * Sign a 32-byte hash → 65-byte recoverable signature r‖s‖v with low-s
   * normalization (Ethereum convention; what go-ethereum crypto.Sign
   * emits).
   */
  def sign(msgHash: Array[Byte], privKey: BigInteger): Array[Byte] = {
    require(msgHash.length == 32, "msgHash must be 32 bytes")
    val z = new BigInteger(1, msgHash)
    val k = rfc6979Nonce(privKey, msgHash)
    val Some((rx, ry)) = mul(k, G): @unchecked
    val r = rx.mod(N)
    require(r.signum() != 0, "degenerate r")
    var s = modInv(k, N).multiply(z.add(r.multiply(privKey))).mod(N)
    var recId = (if (ry.testBit(0)) 1 else 0) | (if (rx.compareTo(N) >= 0) 2 else 0)
    if (s.compareTo(HALF_N) > 0) { s = N.subtract(s); recId ^= 1 }
    to32(r) ++ to32(s) ++ Array[Byte](recId.toByte)
  }

  /** Verify r‖s (first 64 bytes of a signature) over a 32-byte hash. */
  def verify(msgHash: Array[Byte], sig: Array[Byte], pub: (BigInteger, BigInteger)): Boolean = {
    val r = new BigInteger(1, sig.slice(0, 32))
    val s = new BigInteger(1, sig.slice(32, 64))
    if (r.signum() <= 0 || r.compareTo(N) >= 0 || s.signum() <= 0 || s.compareTo(N) >= 0)
      return false
    val z = new BigInteger(1, msgHash)
    val w = modInv(s, N)
    val u1 = z.multiply(w).mod(N)
    val u2 = r.multiply(w).mod(N)
    add(mul(u1, G), mul(u2, Some(pub))) match {
      case Some((x, _)) => x.mod(N) == r
      case None => false
    }
  }

  /** Keypair generation for `account create` (C3). */
  def generatePrivateKey(random: java.security.SecureRandom = new java.security.SecureRandom()): BigInteger = {
    var k = ZERO
    while (k.signum() == 0 || k.compareTo(N) >= 0)
      k = new BigInteger(256, random)
    k
  }
}
