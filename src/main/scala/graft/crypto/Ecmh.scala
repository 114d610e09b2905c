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

  /** Deterministic hash-to-point: x = keccak(item ‖ ctr), first valid
    * curve x; y chosen even. (Try-and-increment — fine off the hot path;
    * ~2 tries expected.) */
  def hashToPoint(item: Array[Byte]): Point = {
    var ctr = 0
    while (ctr < 256) {
      val h = Keccak256.hash(item ++ Array(ctr.toByte))
      val x = new BigInteger(1, h).mod(P)
      val y2 = x.multiply(x).multiply(x).add(BigInteger.valueOf(7)).mod(P)
      val y = y2.modPow(P.add(BigInteger.ONE).shiftRight(2), P) // p ≡ 3 (mod 4)
      if (y.multiply(y).mod(P) == y2) {
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
 * Hot-path layout: the buffer is the UNCOMPRESSED affine point
 * (32B x ‖ 32B y) so per-row reduction is one point addition — the
 * compressed form would cost a modular square root per row to
 * decompress. The 33-byte compressed encoding is only produced once, in
 * `finish`. Shuffle traffic is 64 bytes per partial.
 */
class EcmhAggregator extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Byte], String] {
  import Ecmh._
  import java.math.BigInteger

  private def enc(p: Secp256k1.Point): Array[Byte] = p match {
    case None => Array.emptyByteArray
    case Some((x, y)) => Secp256k1.to32(x) ++ Secp256k1.to32(y)
  }
  private def dec(b: Array[Byte]): Secp256k1.Point =
    if (b.isEmpty) None
    else Some((new BigInteger(1, b.slice(0, 32)), new BigInteger(1, b.slice(32, 64))))

  override def zero: Array[Byte] = Array.emptyByteArray
  override def reduce(buf: Array[Byte], item: Array[Byte]): Array[Byte] =
    if (item == null) buf
    else enc(Secp256k1.add(dec(buf), hashToPoint(item)))
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    enc(Secp256k1.add(dec(a), dec(b)))
  override def finish(buf: Array[Byte]): String =
    if (buf.isEmpty) "empty" else encode(dec(buf)).map("%02x".format(_)).mkString
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
