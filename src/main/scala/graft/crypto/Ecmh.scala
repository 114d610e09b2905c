package graft.crypto

import java.math.BigInteger

/**
 * ECMH — elliptic-curve multiset hash (C2): a homomorphic, order-
 * independent, multiset-aware digest. `insert` = point addition,
 * `remove` = subtraction; `union`/`difference` combine accumulators
 * (`pkg/ecmh/ecmh.go:12-60`).
 *
 * The reference builds this over ristretto255; the construction is
 * group-agnostic and this implementation uses secp256k1 (already needed
 * for signing) with try-and-increment keccak hash-to-point. The
 * reference's tests assert only algebraic properties (insert/remove
 * round trip, union/difference, duplicate sensitivity —
 * `pkg/ecmh/ecmh_test.go:14-84`), all of which hold for any prime-order
 * group; digests are not wire-compatible with the Go library (divergence
 * recorded per SURVEY §7.4 risk 4 — offline build, no JVM ristretto255).
 */
object Ecmh {
  import Secp256k1.{P, Point, add, mul}

  private val SQRT_EXP = P.add(BigInteger.ONE).shiftRight(2) // p ≡ 3 (mod 4)

  /** Binary Jacobi symbol (a|n), n odd positive. O(bits²) shift/mod work —
    * orders of magnitude cheaper than the modPow square root, so the hot
    * path can reject the ~half of candidate x with no curve point before
    * paying for the root. */
  private[crypto] def jacobi(a0: BigInteger, n0: BigInteger): Int = {
    var a = a0.mod(n0); var n = n0; var result = 1
    while (a.signum() != 0) {
      val twos = a.getLowestSetBit
      if ((twos & 1) == 1) {
        val nMod8 = n.intValue() & 7
        if (nMod8 == 3 || nMod8 == 5) result = -result
      }
      a = a.shiftRight(twos)
      if ((a.intValue() & 3) == 3 && (n.intValue() & 3) == 3) result = -result
      val t = a; a = n.mod(t); n = t
    }
    if (n == BigInteger.ONE) result else 0
  }

  /** Deterministic hash-to-point: x = keccak(item ‖ ctr), first valid
    * curve x; y chosen even. Try-and-increment with a Jacobi pre-check:
    * non-residue candidates (~half) are rejected for the cost of a gcd,
    * so each item pays exactly ONE modPow square root (the dominant
    * per-row cost of the ECMH aggregate) instead of ~2. */
  def hashToPoint(item: Array[Byte]): Point = {
    var ctr = 0
    while (ctr < 256) {
      val h = Keccak256.hash(item ++ Array(ctr.toByte))
      val x = new BigInteger(1, h).mod(P)
      val y2 = x.multiply(x).multiply(x).add(BigInteger.valueOf(7)).mod(P)
      if (jacobi(y2, P) == 1) {
        val y = y2.modPow(SQRT_EXP, P)
        val yEven = if (y.testBit(0)) P.subtract(y) else y
        return Some((x, yEven))
      }
      ctr += 1
    }
    throw new IllegalStateException("hash-to-point failed")
  }

  def negate(p: Point): Point = p.map { case (x, y) => (x, P.subtract(y).mod(P)) }

  /** 33-byte SEC1 compressed encoding; empty accumulator = empty array. */
  def encode(p: Point): Array[Byte] = p match {
    case None => Array.emptyByteArray
    case Some((x, y)) =>
      Array[Byte](if (y.testBit(0)) 0x03 else 0x02) ++ Secp256k1.to32(x)
  }

  def decode(bytes: Array[Byte]): Point =
    if (bytes.isEmpty) None
    else {
      val x = new BigInteger(1, bytes.slice(1, 33))
      val y2 = x.multiply(x).multiply(x).add(BigInteger.valueOf(7)).mod(P)
      val y0 = y2.modPow(P.add(BigInteger.ONE).shiftRight(2), P)
      val y = if (y0.testBit(0) == (bytes(0) == 0x03)) y0 else P.subtract(y0)
      Some((x, y))
    }

  /**
   * Jacobian-coordinate point arithmetic for the aggregation hot path:
   * (X, Y, Z) ≡ affine (X/Z², Y/Z³), Z = 0 ⇒ infinity. Addition costs
   * ~12 modular multiplications and NO modular inverse — the affine
   * formulas pay one `modInverse` per added row, which at corpus scale
   * is the dominant non-hash cost. One inverse total, in `toAffine`.
   * Standard formulas for short Weierstrass a=0 (public EFD database).
   */
  object Jacobian {
    type JPoint = (BigInteger, BigInteger, BigInteger)
    private val ONE = BigInteger.ONE
    val Infinity: JPoint = (ONE, ONE, BigInteger.ZERO)

    def fromAffine(p: Point): JPoint = p match {
      case None => Infinity
      case Some((x, y)) => (x, y, ONE)
    }

    def isInfinity(p: JPoint): Boolean = p._3.signum() == 0

    def toAffine(p: JPoint): Point =
      if (isInfinity(p)) None
      else {
        val zInv = p._3.modInverse(P)
        val zInv2 = zInv.multiply(zInv).mod(P)
        Some((p._1.multiply(zInv2).mod(P),
              p._2.multiply(zInv2).multiply(zInv).mod(P)))
      }

    def double(p: JPoint): JPoint = {
      if (isInfinity(p) || p._2.signum() == 0) return Infinity
      val (x1, y1, z1) = p
      val a = x1.multiply(x1).mod(P)
      val b = y1.multiply(y1).mod(P)
      val c = b.multiply(b).mod(P)
      val xb = x1.add(b)
      val d = xb.multiply(xb).subtract(a).subtract(c).shiftLeft(1).mod(P)
      val e = a.multiply(BigInteger.valueOf(3)).mod(P)
      val f = e.multiply(e).mod(P)
      val x3 = f.subtract(d.shiftLeft(1)).mod(P)
      val y3 = e.multiply(d.subtract(x3)).subtract(c.shiftLeft(3)).mod(P)
      val z3 = y1.multiply(z1).shiftLeft(1).mod(P)
      (x3, y3, z3)
    }

    /** Mixed addition: Jacobian accumulator + affine point (Z2 = 1). */
    def addAffine(p: JPoint, q: Point): JPoint = q match {
      case None => p
      case Some((x2, y2)) =>
        if (isInfinity(p)) return (x2, y2, ONE)
        val (x1, y1, z1) = p
        val z1z1 = z1.multiply(z1).mod(P)
        val u2 = x2.multiply(z1z1).mod(P)
        val s2 = y2.multiply(z1).multiply(z1z1).mod(P)
        if (u2 == x1) {
          if (s2 == y1) double(p)
          else Infinity // inverse points
        } else {
          val h = u2.subtract(x1).mod(P)
          val h2 = h.multiply(h).mod(P)
          val h3 = h2.multiply(h).mod(P)
          val r = s2.subtract(y1).mod(P)
          val v = x1.multiply(h2).mod(P)
          val x3 = r.multiply(r).subtract(h3).subtract(v.shiftLeft(1)).mod(P)
          val y3 = r.multiply(v.subtract(x3)).subtract(y1.multiply(h3)).mod(P)
          val z3 = z1.multiply(h).mod(P)
          (x3, y3, z3)
        }
    }

    /** Full Jacobian + Jacobian addition (partial-aggregate merge). */
    def add(p: JPoint, q: JPoint): JPoint = {
      if (isInfinity(p)) return q
      if (isInfinity(q)) return p
      val (x1, y1, z1) = p
      val (x2, y2, z2) = q
      val z1z1 = z1.multiply(z1).mod(P)
      val z2z2 = z2.multiply(z2).mod(P)
      val u1 = x1.multiply(z2z2).mod(P)
      val u2 = x2.multiply(z1z1).mod(P)
      val s1 = y1.multiply(z2).multiply(z2z2).mod(P)
      val s2 = y2.multiply(z1).multiply(z1z1).mod(P)
      if (u1 == u2) {
        if (s1 == s2) double(p) else Infinity
      } else {
        val h = u2.subtract(u1).mod(P)
        val h2 = h.multiply(h).mod(P)
        val h3 = h2.multiply(h).mod(P)
        val r = s2.subtract(s1).mod(P)
        val v = u1.multiply(h2).mod(P)
        val x3 = r.multiply(r).subtract(h3).subtract(v.shiftLeft(1)).mod(P)
        val y3 = r.multiply(v.subtract(x3)).subtract(s1.multiply(h3)).mod(P)
        val z3 = z1.multiply(z2).multiply(h).mod(P)
        (x3, y3, z3)
      }
    }
  }

  final class MultisetHash private (private var acc: Point) {
    def insert(item: Array[Byte]): this.type = { acc = add(acc, hashToPoint(item)); this }
    def remove(item: Array[Byte]): this.type = { acc = add(acc, negate(hashToPoint(item))); this }
    def insertAll(items: Iterable[Array[Byte]]): this.type = { items.foreach(insert); this }
    def removeAll(items: Iterable[Array[Byte]]): this.type = { items.foreach(remove); this }
    def union(other: MultisetHash): this.type = { acc = add(acc, other.acc); this }
    def difference(other: MultisetHash): this.type = { acc = add(acc, negate(other.acc)); this }
    def point: Point = acc
    def digest: String = acc match {
      case None => "empty"
      case p => encode(p).map("%02x".format(_)).mkString
    }
    override def equals(o: Any): Boolean = o match {
      case m: MultisetHash => m.acc == acc
      case _ => false
    }
    override def hashCode(): Int = acc.hashCode()
  }

  object MultisetHash {
    def empty: MultisetHash = new MultisetHash(None)
    def of(items: Array[Byte]*): MultisetHash = empty.insertAll(items)
  }
}

/**
 * Spark typed aggregate for ECMH: commutative + associative point
 * addition makes partial (map-side) aggregation safe in any partitioning
 * — the distributed form of the reference's accumulator.
 *
 * Hot-path layout: the buffer is a JACOBIAN point (32B X ‖ 32B Y ‖ 32B Z)
 * so per-row reduction is one inversion-free mixed addition (~12 modular
 * multiplications); affine buffers would pay a `modInverse` per row and
 * compressed ones a modular square root. The single inversion and the
 * 33-byte compressed encoding happen once, in `finish`. Shuffle traffic
 * is 96 bytes per partial.
 */
class EcmhAggregator extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Byte], String] {
  import Ecmh._
  import Ecmh.Jacobian.JPoint
  import java.math.BigInteger

  private def enc(p: JPoint): Array[Byte] =
    if (Jacobian.isInfinity(p)) Array.emptyByteArray
    else Secp256k1.to32(p._1) ++ Secp256k1.to32(p._2) ++ Secp256k1.to32(p._3)
  private def dec(b: Array[Byte]): JPoint =
    if (b.isEmpty) Jacobian.Infinity
    else (new BigInteger(1, b.slice(0, 32)), new BigInteger(1, b.slice(32, 64)),
          new BigInteger(1, b.slice(64, 96)))

  override def zero: Array[Byte] = Array.emptyByteArray
  override def reduce(buf: Array[Byte], item: Array[Byte]): Array[Byte] =
    if (item == null) buf
    else enc(Jacobian.addAffine(dec(buf), hashToPoint(item)))
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    enc(Jacobian.add(dec(a), dec(b)))
  override def finish(buf: Array[Byte]): String = Jacobian.toAffine(dec(buf)) match {
    case None => "empty"
    case p => encode(p).map("%02x".format(_)).mkString
  }
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: org.apache.spark.sql.Encoder[String] =
    org.apache.spark.sql.Encoders.STRING
}

object EcmhAggregator {
  /** Column form: `ecmhDigest(binaryCol)` — usable in any groupBy. */
  def digest(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new EcmhAggregator).apply(c)
}
