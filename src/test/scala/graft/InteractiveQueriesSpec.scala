package graft

import graft.operators.{InteractiveQueries, StockAggregation}
import graft.sources.Serdes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interactive-query semantics against the reference's integration-test ④
  * fixture (`/root/reference/src/test/java/io/confluent/developer/InteractiveQueriesIntegrationTest.java:252-284,410-422`):
  * CFLT gets 5 buy transactions @ amount 1000 and 5 sells @ 500; a filtered
  * range with predicate `@.symbol == 'CFLT'` must return exactly that one
  * aggregate row. Plus the edge probes formerly in Scratch.scala.
  */
class InteractiveQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (symbol, buy, amount, number_shares) fixture — CFLT per the reference's
    * `getTransactionList` + 5 other symbols with amount=100 txns
    * (`InteractiveQueriesIntegrationTest.java:404-422`).
    */
  private lazy val txns: DataFrame = {
    val cflt = Seq.fill(5)(("CFLT", true, 1000.0, 100)) ++
      Seq.fill(5)(("CFLT", false, 500.0, 100))
    val others = Seq("AAPL", "GOOG", "MSFT", "ZELK", "BWB").flatMap { s =>
      Seq((s, true, 100.0, 10), (s, false, 100.0, 10))
    }
    (cflt ++ others).toDF("symbol", "buy", "amount", "number_shares")
  }

  private lazy val agg = StockAggregation.aggregate(txns)

  test("integration fixture: filtered range @.symbol == 'CFLT' returns exactly the CFLT aggregate") {
    val out = InteractiveQueries
      .filteredRangeQuery(agg, None, None, "@.symbol == 'CFLT'")
      .collect()
    assert(out.length === 1)
    val row = out.head
    assert(row.getAs[String]("symbol") === "CFLT")
    assert(row.getAs[Double]("buys") === 5000.0)
    assert(row.getAs[Double]("sells") === 2500.0)
    assert(row.getAs[Long]("number_shares") === 1000L)
  }

  test("key query: present and missing keys") {
    assert(InteractiveQueries.keyQuery(agg, "CFLT").count() === 1)
    assert(InteractiveQueries.keyQuery(agg, "NOPE").count() === 0)
  }

  test("multi-key query returns one row per existing key") {
    val out = InteractiveQueries.multiKeyQuery(agg, Seq("CFLT", "AAPL", "NOPE"))
      .select("symbol").as[String].collect().toSet
    assert(out === Set("CFLT", "AAPL"))
  }

  test("multi-key large (broadcast semi-join) matches isin path") {
    val keys = Seq("CFLT", "AAPL", "NOPE", "ZELK").toDF("symbol")
    val viaJoin = InteractiveQueries.multiKeyQueryLarge(agg, keys)
      .select("symbol").as[String].collect().toSet
    val viaIsin = InteractiveQueries.multiKeyQuery(agg, Seq("CFLT", "AAPL", "NOPE", "ZELK"))
      .select("symbol").as[String].collect().toSet
    assert(viaJoin === viaIsin)
  }

  test("range query bound modes (byte-lex string order)") {
    val all = agg.count()
    assert(InteractiveQueries.rangeQuery(agg, None, None).count() === all)
    assert(InteractiveQueries.rangeQuery(agg, Some("B"), Some("D"))
      .select("symbol").as[String].collect().toSet === Set("BWB", "CFLT"))
    assert(InteractiveQueries.rangeQuery(agg, Some("M"), None)
      .select("symbol").as[String].collect().toSet === Set("MSFT", "ZELK"))
    assert(InteractiveQueries.rangeQuery(agg, None, Some("B"))
      .select("symbol").as[String].collect().toSet === Set("AAPL"))
  }

  test("reversed range returns empty (matches store iterator semantics)") {
    assert(InteractiveQueries.rangeQuery(agg, Some("Z"), Some("A")).count() === 0)
  }

  test("changelog encode/decode round-trip preserves the aggregate") {
    val roundTripped = Serdes.decodeAggregation(Serdes.encodeAggregation(agg))
    val diff = roundTripped.exceptAll(agg).count() + agg.exceptAll(roundTripped).count()
    assert(diff === 0)
  }

  test("changelog wire format uses the reference's camelCase numberShares") {
    val value = Serdes.encodeAggregation(agg)
      .filter(col("key") === "CFLT").select("value").as[String].head()
    assert(value.contains("\"numberShares\":1000"))
    assert(!value.contains("number_shares"))
  }
}
