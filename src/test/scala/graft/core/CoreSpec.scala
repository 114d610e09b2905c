package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant

/** VaultName/Account validation (commands.go:32, models.go:18-35) and
  * timestamp parsing (timestamp.go:30-48, timestamp_test.go:10-26). */
class CoreSpec extends AnyFunSuite {

  test("vault name parse/validate") {
    assert(VaultName.parse("ns.rel") == Right(VaultName("ns", "rel")))
    assert(VaultName.parse("_a1.b_2").isRight)
    assert(VaultName.parse("1ns.rel").isLeft)   // must start with letter/_
    assert(VaultName.parse("ns").isLeft)
    assert(VaultName.parse("ns.rel.x").isLeft)
    assert(VaultName.parse("ns.").isLeft)
    assert(VaultName.unsafe("a.b").toString == "a.b")
  }

  test("account address validation") {
    assert(Account.isValid("0x396F15b0A2be942193BBBdC11BE3bF6F6EB1a08a"))
    assert(!Account.isValid("396F15b0A2be942193BBBdC11BE3bF6F6EB1a08a"))
    assert(!Account.isValid("0x123"))
    assert(!Account.isValid("0xZZZF15b0A2be942193BBBdC11BE3bF6F6EB1a08a"))
  }

  test("property: valid vault names always round-trip") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val ident = for {
      h <- Gen.oneOf(Gen.alphaChar, Gen.const('_'))
      t <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
    } yield (h :: t).mkString
    val prop = Prop.forAll(ident, ident) { (ns: String, rel: String) =>
      VaultName.parse(s"$ns.$rel") == Right(VaultName(ns, rel))
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop).passed)
  }

  test("property: unix-seconds timestamps round-trip") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val prop = Prop.forAll(Gen.chooseNum(0L, 4102444800L)) { s: Long =>
      Timestamps.parse(s.toString).map(Timestamps.unixSeconds) == Right(s)
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop).passed)
  }

  test("timestamp parse: unix seconds, date, RFC3339 (timestamp_test.go)") {
    assert(Timestamps.parse("1699984703") == Right(Instant.ofEpochSecond(1699984703L)))
    assert(Timestamps.parse("2006-01-02") ==
      Right(Instant.parse("2006-01-02T00:00:00Z")))
    assert(Timestamps.parse("2006-01-02T15:04:05+07:00") ==
      Right(Instant.parse("2006-01-02T08:04:05Z")))
    assert(Timestamps.parse("").isLeft)
    assert(Timestamps.parse("not a time").isLeft)
  }
}
