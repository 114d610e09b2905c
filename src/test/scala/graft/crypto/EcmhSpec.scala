package graft.crypto

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ECMH algebra (ecmh_test.go:14-84) + scalacheck properties (SURVEY §5d)
  * + distributed Aggregator consistency. */
class EcmhSpec extends SparkSpec {
  import Ecmh._
  private def b(s: String) = s.getBytes("UTF-8")

  test("insert/remove round-trip restores digest (ecmh_test.go:14-45)") {
    val base = MultisetHash.of(b("apple"), b("banana"), b("cherry"))
    val d0 = base.digest
    base.insert(b("date"))
    assert(base.digest != d0)
    base.remove(b("date"))
    assert(base.digest == d0)
  }

  test("multiset: duplicates count (ecmh_test.go)") {
    val one = MultisetHash.of(b("apple"))
    val two = MultisetHash.of(b("apple"), b("apple"))
    assert(one.digest != two.digest)
    two.remove(b("apple"))
    assert(one.digest == two.digest)
  }

  test("union/difference round trip (ecmh_test.go:47-84)") {
    val ab = MultisetHash.of(b("a"), b("b"))
    val cd = MultisetHash.of(b("c"), b("d"))
    val d0 = ab.digest
    ab.union(cd)
    assert(ab.digest == MultisetHash.of(b("a"), b("b"), b("c"), b("d")).digest)
    ab.difference(cd)
    assert(ab.digest == d0)
  }

  test("property: order independence (commutativity)") {
    val gen = Gen.listOfN(8, Gen.alphaNumStr.suchThat(_.nonEmpty))
    val prop = Prop.forAll(gen) { xs: List[String] =>
      val fwd = MultisetHash.empty.insertAll(xs.map(b))
      val rev = MultisetHash.empty.insertAll(xs.reverse.map(b))
      fwd.digest == rev.digest
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop).passed)
  }

  test("property: homomorphism — hash(A ⊎ B) = hash(A) ∪ hash(B)") {
    val gen = Gen.zip(Gen.listOfN(5, Gen.alphaNumStr), Gen.listOfN(5, Gen.alphaNumStr))
    val prop = Prop.forAll(gen) { case (xs, ys) =>
      val whole = MultisetHash.empty.insertAll((xs ++ ys).map(b))
      val parts = MultisetHash.empty.insertAll(xs.map(b))
        .union(MultisetHash.empty.insertAll(ys.map(b)))
      whole.digest == parts.digest
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop).passed)
  }

  test("jacobi pre-check agrees with the modPow sqrt criterion") {
    import java.math.BigInteger
    val P = Secp256k1.P
    val sqrtExp = P.add(BigInteger.ONE).shiftRight(2)
    // every candidate y² either has a sqrt (jacobi=1) or not (jacobi=-1)
    for (i <- 1 to 200) {
      val y2 = new BigInteger(1, Keccak256.hash(s"probe-$i".getBytes)).mod(P)
      val root = y2.modPow(sqrtExp, P)
      val isSquare = root.multiply(root).mod(P) == y2
      assert(Ecmh.jacobi(y2, P) == (if (isSquare) 1 else -1), s"i=$i")
    }
    assert(Ecmh.jacobi(BigInteger.ZERO, P) == 0)
  }

  test("Jacobian accumulation equals affine point addition") {
    import Ecmh.Jacobian
    val pts = (1 to 20).map(i => hashToPoint(b(s"p$i")))
    // fold in Jacobian (the aggregator's hot path) vs affine (MultisetHash)
    val jac = pts.foldLeft(Jacobian.Infinity)(Jacobian.addAffine)
    val aff = pts.foldLeft(None: Secp256k1.Point)(Secp256k1.add)
    assert(Jacobian.toAffine(jac) == aff)
    // doubling path: P + P via addAffine detects equal points
    val p1 = pts.head
    assert(Jacobian.toAffine(Jacobian.addAffine(Jacobian.fromAffine(p1), p1)) ==
      Secp256k1.double(p1))
    // inverse points cancel to infinity
    assert(Jacobian.isInfinity(
      Jacobian.addAffine(Jacobian.fromAffine(p1), Ecmh.negate(p1))))
    // full Jacobian+Jacobian merge (partial-aggregate combine)
    val (l, r) = pts.splitAt(10)
    val lj = l.foldLeft(Jacobian.Infinity)(Jacobian.addAffine)
    val rj = r.foldLeft(Jacobian.Infinity)(Jacobian.addAffine)
    assert(Jacobian.toAffine(Jacobian.add(lj, rj)) == aff)
    assert(Jacobian.toAffine(Jacobian.add(lj, Jacobian.Infinity)) == Jacobian.toAffine(lj))
  }

  test("point encode/decode round trip") {
    val p = hashToPoint(b("x"))
    assert(decode(encode(p)) == p)
    assert(decode(encode(None)) == None)
  }

  test("Spark aggregator: digest independent of partitioning, matches local") {
    import spark.implicits._
    val items = (1 to 50).map(i => s"item-$i")
    val local = MultisetHash.empty.insertAll(items.map(b)).digest
    for (parts <- Seq(1, 4)) {
      val df = items.toDF("s").repartition(parts)
        .select(col("s").cast("binary").as("v"))
      val d = df.agg(EcmhAggregator.digest(col("v")).as("d")).collect()(0).getString(0)
      assert(d == local, s"partitions=$parts")
    }
  }
}
