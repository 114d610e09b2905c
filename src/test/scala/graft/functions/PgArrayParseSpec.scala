package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Prop.forAll

/** PG array-literal scanner spec over the FIXTURES.md §4 corpus. */
class PgArrayParseSpec extends AnyFunSuite {
  private def p(s: String): Array[String] = PgArrayParse.parse(s).toOption.get

  test("simple literals") {
    assert(p("{a,Z,NULL}").toSeq == Seq("a", "Z", null))
    assert(p("{t,f,NULL}").toSeq == Seq("t", "f", null))
    assert(p("{42,-42,NULL}").toSeq == Seq("42", "-42", null))
    assert(p("{42.01,-42.01,NULL}").toSeq == Seq("42.01", "-42.01", null))
    assert(p("{}").isEmpty)
  }

  test("quoted elements with escapes (json[]/bytea[] fixtures)") {
    assert(p("""{"\\x3030303130323033",NULL}""").toSeq == Seq("\\x3030303130323033", null))
    assert(p("""{"{\"key\": \"value\"}",NULL}""").toSeq == Seq("""{"key": "value"}""", null))
    assert(p("""{"a,b",c}""").toSeq == Seq("a,b", "c"))
    assert(p("""{"NULL"}""").toSeq == Seq("NULL")) // quoted NULL is the string
  }

  test("timestamps / uuids / dates") {
    assert(p("""{"2021-03-01 12:45:01",NULL}""").toSeq == Seq("2021-03-01 12:45:01", null))
    assert(p("{a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11,NULL}").head ==
      "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")
  }

  test("multi-dimensional arrays rejected (db_test.go:654-676)") {
    val r = PgArrayParse.parse("{{1,2},{3,4}}")
    assert(r.isLeft && r.swap.toOption.get.contains("unsupported type"))
  }

  test("malformed literals rejected") {
    assert(PgArrayParse.parse("not an array").isLeft)
    assert(PgArrayParse.parse("""{"unterminated}""").isLeft)
  }

  test("property: unquoted round trip") {
    val gen = org.scalacheck.Gen.listOf(
      org.scalacheck.Gen.alphaNumStr.suchThat(s => s.nonEmpty && s != "NULL"))
    val prop = forAll(gen) { xs: List[String] =>
      xs.isEmpty || p(xs.mkString("{", ",", "}")).toSeq == xs
    }
    val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }
}
