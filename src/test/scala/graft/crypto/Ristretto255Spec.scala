package graft.crypto

import java.math.BigInteger
import org.scalatest.funsuite.AnyFunSuite

/** ristretto255 pinned to the public RFC 9496 Appendix-A vectors, with the
  * square-root constants re-derived from first principles (a typo in a
  * 77-digit literal should fail loudly, not corrupt digests silently). */
class Ristretto255Spec extends AnyFunSuite {
  import Ristretto255._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("constants re-derive: SQRT_M1, INVSQRT_A_MINUS_D, SQRT_AD_MINUS_ONE") {
    val minusOne = P.subtract(BigInteger.ONE)
    assert(SQRT_M1.multiply(SQRT_M1).mod(P) == minusOne)
    assert(!isNegative(SQRT_M1), "canonical sqrt(-1) is the even root")
    // (1/sqrt(a-d))^2 * (a-d) = 1, a = -1
    val aMinusD = P.subtract(BigInteger.ONE).subtract(D).mod(P)
    assert(INVSQRT_A_MINUS_D.modPow(BigInteger.TWO, P).multiply(aMinusD).mod(P) == BigInteger.ONE)
    // sqrt(ad-1)^2 = -d - 1
    val adMinusOne = P.subtract(D).subtract(BigInteger.ONE).mod(P)
    assert(SQRT_AD_MINUS_ONE.multiply(SQRT_AD_MINUS_ONE).mod(P) == adMinusOne)
    // d = -121665/121666
    assert(D.multiply(BigInteger.valueOf(121666)).add(BigInteger.valueOf(121665)).mod(P).signum() == 0)
  }

  test("RFC 9496 A.1: encodings of B*0 .. B*15 (repeated addition)") {
    val expected = Seq(
      "0000000000000000000000000000000000000000000000000000000000000000",
      "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
      "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
      "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
      "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
      "e882b131016b52c1d3337080187cf768423efccbb517bb495ab812c4160ff44e",
      "f64746d3c92b13050ed8d80236a7f0007c3b3f962f5ba793d19a601ebb1df403",
      "44f53520926ec81fbd5a387845beb7df85a96a24ece18738bdcfa6a7822a176d",
      "903293d8f2287ebe10e2374dc1a53e0bc887e592699f02d077d5263cdd55601c",
      "02622ace8f7303a31cafc63f8fc48fdc16e1c8c8d234b2f0d6685282a9076031",
      "20706fd788b2720a1ed2a5dad4952b01f413bcf0e7564de8cdc816689e2db95f",
      "bce83f8ba5dd2fa572864c24ba1810f9522bc6004afe95877ac73241cafdab42",
      "e4549ee16b9aa03099ca208c67adafcafa4c3f3e4e5303de6026e3ca8ff84460",
      "aa52e000df2e16f55fb1032fc33bc42742dad6bd5a8fc0be0167436c5948501f",
      "46376b80f409b29dc2b5f6f0c52591990896e5716f41477cd30085ab7f10301e",
      "e0c418f7c8d9c4cdd7395b93ea124f3ad99021bb681dfc3302a9d99a2e53e64e")
    var acc = Identity
    expected.zipWithIndex.foreach { case (want, k) =>
      assert(hex(encode(acc)) == want, s"B*$k")
      acc = acc + Base
    }
  }

  test("RFC 9496 A.3: one-way map images of SHA-512(label)") {
    // Four of the RFC's seven labeled vectors, independently cross-checked;
    // between them the two SHA-512 halves exercise both MAP branches
    // (square and non-square sqrt_ratio outcomes).
    val vectors = Seq(
      "Ristretto is traditionally a short shot of espresso coffee" ->
        "3066f82a1a747d45120d1740f14358531a8f04bbffe6a819f86dfe50f44a0a46",
      "about half the amount of water in the same amount of time" ->
        "006ccd2a9e6867e6a2c5cea83d3302cc9de128dd2a9a57dd8ee7b9d7ffe02826",
      "by using a finer grind." ->
        "f8f0c87cf237953c5890aec3998169005dae3eca1fbb04548c635953c817f92a",
      "This produces a concentrated shot of coffee per volume." ->
        "ae81e7dedf20a497e10c304a765c1767a42d6e06029758d2d7e8ef7cc4c41179")
    vectors.foreach { case (label, want) =>
      assert(hex(encode(deriveDalek(label.getBytes("UTF-8")))) == want, label)
    }
  }

  test("elligator outputs are on-curve with a consistent extended T") {
    // -x² + y² = 1 + d·x²·y², and Z·T = X·Y — the invariant that catches
    // a wrong branch constant in MAP (off-curve points can still encode
    // to plausible-looking strings).
    (1 to 40).foreach { i =>
      val pt = deriveDalek(s"probe-$i".getBytes)
      val zInv = pt.z.modInverse(P)
      val x = pt.x.multiply(zInv).mod(P)
      val y = pt.y.multiply(zInv).mod(P)
      val lhs = y.multiply(y).subtract(x.multiply(x)).mod(P)
      val rhs = BigInteger.ONE.add(
        D.multiply(x).multiply(x).multiply(y).multiply(y)).mod(P)
      assert(lhs == rhs, s"probe-$i off-curve")
      assert(pt.z.multiply(pt.t).subtract(pt.x.multiply(pt.y)).mod(P).signum() == 0,
        s"probe-$i T invariant")
    }
  }

  test("decode is the left inverse of encode; group equality survives") {
    val pts = Seq(Base, Base + Base, deriveDalek("x".getBytes),
      deriveDalek("y".getBytes) + Base, Identity)
    pts.foreach { p =>
      val d = decode(encode(p))
      assert(d.isDefined)
      assert(d.get.same(p))
      assert(hex(encode(d.get)) == hex(encode(p)))
    }
  }

  test("decode rejects non-canonical encodings (RFC A.2 cases)") {
    // s >= p (all-ones)
    assert(decode(Array.fill[Byte](32)(0xff.toByte)).isEmpty)
    // negative s (odd): 1 followed by zeros
    val odd = new Array[Byte](32); odd(0) = 1
    assert(decode(odd).isEmpty)
    // wrong length
    assert(decode(new Array[Byte](31)).isEmpty)
    // non-square candidate: s = 2 little-endian hits the was_square gate
    // for this curve? — construct a rejected value by flipping a valid one
    val tweaked = encode(Base).clone()
    tweaked(0) = (tweaked(0) ^ 0x02).toByte // stays even, likely invalid
    decode(tweaked).foreach { p => // if it decodes it must re-encode canonically
      assert(hex(encode(p)) == hex(tweaked))
    }
  }

  test("point algebra: identity, inverse, commutativity, associativity") {
    val a = deriveDalek("a".getBytes)
    val b = deriveDalek("b".getBytes)
    val c = deriveDalek("c".getBytes)
    assert((a + Identity).same(a))
    assert((a - a).same(Identity))
    assert((a + b).same(b + a))
    assert(((a + b) + c).same(a + (b + c)))
    assert(hex(encode(a + b - b)) == hex(encode(a)))
  }

  test("property: random uniform bytes map to valid group elements") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val bytesGen = Gen.containerOfN[Array, Byte](64, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    val prop = Prop.forAll(bytesGen) { b: Array[Byte] =>
      val p = fromUniformBytes(b)
      // on-curve, consistent T, and the encoding round-trips canonically
      val zInv = p.z.modInverse(P)
      val x = p.x.multiply(zInv).mod(P)
      val y = p.y.multiply(zInv).mod(P)
      val onCurve = y.multiply(y).subtract(x.multiply(x)).mod(P) ==
        BigInteger.ONE.add(D.multiply(x).multiply(x).multiply(y).multiply(y)).mod(P)
      val tOk = p.z.multiply(p.t).subtract(p.x.multiply(p.y)).mod(P).signum() == 0
      val enc = encode(p)
      val rt = decode(enc).exists(q => hex(encode(q)) == hex(enc))
      onCurve && tOk && rt
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop).passed)
  }

  test("property: group laws on randomly derived points") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val ptGen = Gen.alphaNumStr.map(s => deriveDalek(("pt-" + s).getBytes("UTF-8")))
    val prop = Prop.forAll(Gen.zip(ptGen, ptGen, ptGen)) {
      case (a: Pt, b: Pt, c: Pt) =>
        (a + b).same(b + a) &&
        ((a + b) + c).same(a + (b + c)) &&
        (a + Identity).same(a) &&
        (a - a).same(Identity) &&
        hex(encode(a + b - b)) == hex(encode(a))
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop).passed)
  }

  test("fromUniformBytes: deterministic, half-order sensitive") {
    val b1 = Array.tabulate[Byte](64)(i => i.toByte)
    assert(hex(encode(fromUniformBytes(b1))) == hex(encode(fromUniformBytes(b1.clone))))
    val swapped = b1.slice(32, 64) ++ b1.slice(0, 32)
    // adding the same two mapped points in either order is equal…
    assert(fromUniformBytes(b1).same(fromUniformBytes(swapped)))
    // …but different bytes give a different point
    val b2 = b1.clone; b2(0) = 99
    assert(!fromUniformBytes(b1).same(fromUniformBytes(b2)))
  }
}
