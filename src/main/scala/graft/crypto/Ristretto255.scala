package graft.crypto

import java.math.BigInteger
import java.security.MessageDigest

/**
 * ristretto255 (RFC 9496): the prime-order group over Curve25519 that the
 * reference's ECMH multiset hash is built on (`pkg/ecmh/ecmh.go:1-10` via
 * go-ristretto). Pure-JVM implementation — BigInteger field arithmetic,
 * extended Edwards coordinates — so digests are byte-compatible with the
 * reference without any native dependency.
 *
 * Surface (all public algorithms, per RFC 9496 §4.3):
 *  - `encode`   — canonical 32-byte little-endian encoding (§4.3.2)
 *  - `decode`   — strict decoding, rejects non-canonical input (§4.3.1)
 *  - `elligator`/`fromUniformBytes` — the one-way MAP (§4.3.4)
 *  - `deriveDalek` — SHA-512 → `fromUniformBytes`, exactly
 *    curve25519-dalek's `hash_from_bytes::<Sha512>`, which is what
 *    go-ristretto's `Point.DeriveDalek` (used by `ecmh.go`'s tests)
 *    computes.
 *
 * Sign conventions ("negative" = odd canonical representative, CT_ABS,
 * and the specific square-root constants) follow RFC 9496; the constants
 * below are re-derived from first principles in `Ristretto255Spec` and
 * the whole stack is pinned by the RFC's Appendix-A test vectors
 * (generator multiples + one-way-map images).
 */
object Ristretto255 {
  /** p = 2^255 - 19 */
  val P: BigInteger = BigInteger.TWO.pow(255).subtract(BigInteger.valueOf(19))
  private val ONE = BigInteger.ONE
  private val ZERO = BigInteger.ZERO

  /** Edwards d = -121665/121666 mod p */
  val D: BigInteger =
    BigInteger.valueOf(-121665).multiply(BigInteger.valueOf(121666).modInverse(P)).mod(P)

  /** sqrt(-1) mod p — the canonical (RFC 9496) root. */
  val SQRT_M1: BigInteger = new BigInteger(
    "19681161376707505956807079304988542015446066515923890162744021073123829784752")
  /** 1/sqrt(a-d) with a = -1 (used by ENCODE's rotation branch). */
  val INVSQRT_A_MINUS_D: BigInteger = new BigInteger(
    "54469307008909316920995813868745141605393597292927456921205312896311721017578")
  /** sqrt(a*d - 1) with a = -1 (used by MAP). */
  val SQRT_AD_MINUS_ONE: BigInteger = new BigInteger(
    "25063068953384623474111414158702152701244531502492656460079210482610430750235")
  val ONE_MINUS_D_SQ: BigInteger = ONE.subtract(D.multiply(D)).mod(P)
  val D_MINUS_ONE_SQ: BigInteger = D.subtract(ONE).multiply(D.subtract(ONE)).mod(P)

  @inline private def mul(a: BigInteger, b: BigInteger): BigInteger = a.multiply(b).mod(P)
  @inline private def sq(a: BigInteger): BigInteger = a.multiply(a).mod(P)

  /** "negative" per RFC 9496 §4.1: the canonical LE encoding is odd. */
  @inline def isNegative(x: BigInteger): Boolean = x.mod(P).testBit(0)
  @inline def ctAbs(x: BigInteger): BigInteger = {
    val r = x.mod(P); if (r.testBit(0)) P.subtract(r) else r
  }

  /** Extended Edwards coordinates: x = X/Z, y = Y/Z, T = XY/Z (a = -1). */
  final case class Pt(x: BigInteger, y: BigInteger, z: BigInteger, t: BigInteger) {
    def unary_- : Pt = Pt(P.subtract(x).mod(P), y, z, P.subtract(t).mod(P))
    def +(q: Pt): Pt = {
      // Hisil–Wong–Carter–Dawson extended addition, a = -1 (public EFD).
      val a = mul(y.subtract(x), q.y.subtract(q.x))
      val b = mul(y.add(x), q.y.add(q.x))
      val c = mul(mul(t, D.add(D)), q.t)
      val dd = mul(z.add(z), q.z)
      val e = b.subtract(a); val f = dd.subtract(c)
      val g = dd.add(c); val h = b.add(a)
      Pt(mul(e, f), mul(g, h), mul(f, g), mul(e, h))
    }
    def -(q: Pt): Pt = this + (-q)
    /** RISTRETTO group equality — modulo the Edwards 4-torsion, exactly
      * dalek's `RistrettoPoint::ct_eq`: two Edwards representatives are
      * the same ristretto element iff X1·Y2 = Y1·X2 or Y1·Y2 = X1·X2. */
    def same(q: Pt): Boolean =
      mul(x, q.y) == mul(y, q.x) || mul(y, q.y) == mul(x, q.x)
  }

  val Identity: Pt = Pt(ZERO, ONE, ONE, ZERO)

  /** Ed25519 base point: y = 4/5, x the even root. */
  val Base: Pt = {
    val y = mul(BigInteger.valueOf(4), BigInteger.valueOf(5).modInverse(P))
    val x2 = mul(sq(y).subtract(ONE), mul(D, sq(y)).add(ONE).modInverse(P))
    val x0 = x2.modPow(P.add(BigInteger.valueOf(3)).shiftRight(3), P)
    val x1 = if (sq(x0) == x2) x0 else mul(x0, SQRT_M1)
    val x = if (x1.testBit(0)) P.subtract(x1) else x1
    Pt(x, y, ONE, mul(x, y))
  }

  private val P58 = P.subtract(BigInteger.valueOf(5)).shiftRight(3) // (p-5)/8

  /** SQRT_RATIO_M1 (RFC 9496 §4.2): (was_square, nonnegative root of u/v
    * or of SQRT_M1*u/v). One modPow — the dominant cost per invocation. */
  def sqrtRatioM1(u: BigInteger, v: BigInteger): (Boolean, BigInteger) = {
    val v3 = mul(sq(v), v)
    val v7 = mul(sq(v3), v)
    var r = mul(mul(u, v3), mul(u, v7).modPow(P58, P))
    val check = mul(v, sq(r))
    val uu = u.mod(P)
    val correct = check == uu
    val flipped = check == P.subtract(uu).mod(P)
    val flippedI = check == mul(P.subtract(uu).mod(P), SQRT_M1)
    if (flipped || flippedI) r = mul(r, SQRT_M1)
    (correct || flipped, ctAbs(r))
  }

  /** ENCODE (RFC 9496 §4.3.2) → canonical 32-byte LE string. */
  def encode(pt: Pt): Array[Byte] = {
    val u1 = mul(pt.z.add(pt.y), pt.z.subtract(pt.y))
    val u2 = mul(pt.x, pt.y)
    val (_, inv) = sqrtRatioM1(ONE, mul(u1, sq(u2)))
    val den1 = mul(inv, u1)
    val den2 = mul(inv, u2)
    val zInv = mul(mul(den1, den2), pt.t)
    val rotate = isNegative(mul(pt.t, zInv))
    val (x, y0, denInv) =
      if (rotate) (mul(pt.y, SQRT_M1), mul(pt.x, SQRT_M1), mul(den1, INVSQRT_A_MINUS_D))
      else (pt.x, pt.y, den2)
    val y = if (isNegative(mul(x, zInv))) P.subtract(y0).mod(P) else y0
    val s = ctAbs(mul(denInv, pt.z.subtract(y)))
    toLe32(s)
  }

  /** DECODE (RFC 9496 §4.3.1): strict — returns None on any non-canonical
    * or invalid encoding (the RFC Appendix A.2 rejection cases). */
  def decode(bytes: Array[Byte]): Option[Pt] = {
    if (bytes.length != 32) return None
    val s = fromLe(bytes)
    if (s.compareTo(P) >= 0 || s.testBit(0)) return None // non-canonical | negative
    val ss = sq(s)
    val u1 = ONE.subtract(ss).mod(P)
    val u2 = ONE.add(ss).mod(P)
    val u2sq = sq(u2)
    val v = P.subtract(mul(D, sq(u1))).subtract(u2sq).mod(P)
    val (wasSquare, inv) = sqrtRatioM1(ONE, mul(v, u2sq))
    val denX = mul(inv, u2)
    val denY = mul(mul(inv, denX), v)
    val x = ctAbs(mul(s.add(s), denX))
    val y = mul(u1, denY)
    val t = mul(x, y)
    if (!wasSquare || isNegative(t) || y.signum() == 0) None
    else Some(Pt(x, y, ONE, t))
  }

  /** MAP / "elligator ristretto flavor" (RFC 9496 §4.3.4). */
  def elligator(t0: BigInteger): Pt = {
    val t = t0.mod(P)
    val r = mul(SQRT_M1, sq(t))
    val u = mul(r.add(ONE), ONE_MINUS_D_SQ)
    val v = mul(P.subtract(ONE).subtract(mul(r, D)), r.add(D))
    val (wasSquare, s0) = sqrtRatioM1(u, v)
    val s = if (wasSquare) s0 else P.subtract(ctAbs(mul(s0, t))).mod(P)
    // c = -1 in the square branch (dalek initializes c to MINUS_ONE and
    // only overwrites it with r when u/v was NOT square) — using +1 here
    // silently lands points off-curve, caught by the on-curve spec.
    val c = if (wasSquare) P.subtract(ONE) else r
    val n = mul(mul(c, r.subtract(ONE)), D_MINUS_ONE_SQ).subtract(v).mod(P)
    val w0 = mul(s.add(s), v)
    val w1 = mul(n, SQRT_AD_MINUS_ONE)
    val w2 = ONE.subtract(sq(s)).mod(P)
    val w3 = ONE.add(sq(s)).mod(P)
    Pt(mul(w0, w3), mul(w2, w1), mul(w1, w3), mul(w0, w2))
  }

  /** from_uniform_bytes: MAP each 255-bit half of a 64-byte string, add. */
  def fromUniformBytes(b: Array[Byte]): Pt = {
    require(b.length == 64, s"need 64 bytes, got ${b.length}")
    elligator(fromLe255(b, 0)) + elligator(fromLe255(b, 32))
  }

  /** curve25519-dalek `hash_from_bytes::<Sha512>` ≡ go-ristretto
    * `Point.DeriveDalek` — the item→point derivation of the reference's
    * multiset hash (`pkg/ecmh/ecmh_test.go:31-41`). */
  def deriveDalek(data: Array[Byte]): Pt =
    fromUniformBytes(MessageDigest.getInstance("SHA-512").digest(data))

  // ── little-endian byte helpers ────────────────────────────────────────
  def toLe32(x: BigInteger): Array[Byte] = {
    val be = x.mod(P).toByteArray // big-endian, possibly short or sign-padded
    val out = new Array[Byte](32)
    var i = 0
    val start = math.max(0, be.length - 33) // skip any leading sign byte
    var j = be.length - 1
    while (j >= start && i < 32) { out(i) = be(j); i += 1; j -= 1 }
    out
  }
  private def fromLe(b: Array[Byte]): BigInteger =
    new BigInteger(1, b.reverse)
  /** Load 32 bytes LE, mask bit 255 (dalek FieldElement::from_bytes). */
  private def fromLe255(b: Array[Byte], off: Int): BigInteger = {
    val chunk = java.util.Arrays.copyOfRange(b, off, off + 32)
    chunk(31) = (chunk(31) & 0x7f).toByte
    fromLe(chunk)
  }
}
