package graft

import graft.functions.JsonPathPredicate
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Golden-table semantics of the JSONPath-predicate compiler, ported from the
  * reference's predicate tests
  * (`/root/reference/src/test/java/io/confluent/developer/store/JacksonProtobufMappingProviderTest.java:74-152`):
  * rows BWB(buys=333,sells=333), ALB(400,333), EAB(333,400) against the exact
  * predicate strings the reference exercises.
  */
class JsonPathPredicateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val golden: DataFrame = Seq(
    ("BWB", 333.0, 333.0, 100L),
    ("ALB", 400.0, 333.0, 100L),
    ("EAB", 333.0, 400.0, 100L)
  ).toDF("symbol", "buys", "sells", "number_shares")

  private def symbolsFor(pred: String): Set[String] =
    golden.filter(JsonPathPredicate.compile(pred))
      .select("symbol").collect().map(_.getString(0)).toSet

  test("@.buys > @.sells selects ALB") {
    assert(symbolsFor("@.buys > @.sells") === Set("ALB"))
  }
  test("@.sells > @.buys selects EAB") {
    assert(symbolsFor("@.sells > @.buys") === Set("EAB"))
  }
  test("@.sells == @.buys selects BWB") {
    assert(symbolsFor("@.sells == @.buys") === Set("BWB"))
  }
  test("@.buys > 299 selects all") {
    assert(symbolsFor("@.buys > 299") === Set("BWB", "ALB", "EAB"))
  }
  test("mixed-type comparison rejects loudly (ANSI cast), not silently-false like jayway") {
    // `@.symbol > 5` compares a string field to a number. jayway's
    // type-strict ValueCompare silently yields false; under Spark's ANSI
    // mode (default in 4.x) the implicit string→number cast THROWS on
    // non-numeric tickers. That matches this repo's grammar policy —
    // outside the exercised subset, fail loudly rather than return a
    // quietly different answer (SURVEY §7.3).
    val e = intercept[Exception] { symbolsFor("@.symbol > 5") }
    assert(e.getMessage.contains("CAST_INVALID_INPUT"), s"unexpected error: ${e.getMessage}")
  }

  test("supplementary characters: compiled ordering matches code-point eval") {
    import org.apache.spark.sql.functions.col
    // U+E000 (private use, BMP) sorts AFTER U+10000 (supplementary) in
    // UTF-16 code-unit order, but BEFORE it in code-point/UTF-8 order —
    // Catalyst uses the latter; eval must agree (ADVICE r2).
    val bmp = "\uE000"
    val supp = new String(Character.toChars(0x10000))
    val df = Seq((bmp, 1.0), (supp, 2.0)).toDF("symbol", "buys")
    val pred = s"@.symbol < '$supp'"
    val compiled = df.filter(JsonPathPredicate.compile(pred))
      .select("symbol").collect().map(_.getString(0)).toSet
    assert(compiled === Set(bmp)) // code-point order: U+E000 < U+10000
    val p = JsonPathPredicate.parse(pred)
    assert(JsonPathPredicate.eval(p, Map("symbol" -> bmp)).contains(true))
    assert(JsonPathPredicate.eval(p, Map("symbol" -> supp)).contains(false))
  }

  test("@.buys > 500 selects none") {
    assert(symbolsFor("@.buys > 500") === Set.empty[String])
  }
  test("symbol equality (integration-test predicate @.symbol == 'CFLT' shape)") {
    assert(symbolsFor("@.symbol == 'ALB'") === Set("ALB"))
  }
  test("conjunction and disjunction") {
    assert(symbolsFor("@.buys > @.sells || @.sells > @.buys") === Set("ALB", "EAB"))
    assert(symbolsFor("@.buys >= 333 && @.sells >= 400") === Set("EAB"))
  }
  test("negation and parentheses") {
    assert(symbolsFor("!(@.buys > @.sells)") === Set("BWB", "EAB"))
    assert(symbolsFor("!(@.buys > @.sells) && !(@.sells > @.buys)") === Set("BWB"))
  }

  // ------------------------------------------------- parser edge behavior

  test("bad predicate is rejected loudly") {
    intercept[IllegalArgumentException](JsonPathPredicate.parse("@.buys $$ nonsense"))
    intercept[IllegalArgumentException](JsonPathPredicate.parse("@.buys >"))
    intercept[IllegalArgumentException](JsonPathPredicate.parse(""))
    intercept[IllegalArgumentException](JsonPathPredicate.parse("@.buys == 1 extra"))
  }

  test("string escapes are interpreted (JSON semantics), unknown escapes rejected") {
    val p = JsonPathPredicate.parse("""@.symbol == 'a\n\t\\\'b'""")
    p match {
      case JsonPathPredicate.Cmp(_, "==", JsonPathPredicate.StringLit(v)) =>
        assert(v === "a\n\t\\'b")
      case other => fail(s"unexpected parse: $other")
    }
    intercept[IllegalArgumentException](JsonPathPredicate.parse("""@.symbol == 'a\qb'"""))
  }

  test("double-quoted strings parse like single-quoted") {
    val p = JsonPathPredicate.parse("""@.symbol == "CFLT"""")
    p match {
      case JsonPathPredicate.Cmp(_, "==", JsonPathPredicate.StringLit(v)) => assert(v === "CFLT")
      case other => fail(s"unexpected parse: $other")
    }
  }

  test("numeric literal forms") {
    assert(symbolsFor("@.buys == 4e2") === Set("ALB"))
    assert(symbolsFor("@.buys == 400.0") === Set("ALB"))
    assert(symbolsFor("@.buys != 333") === Set("ALB"))
  }
}
