package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Serdes

/** Pins the wire decode's malformed-input policy (see
  * [[graft.sources.Serdes.decodeTransaction]]'s scaladoc): permissive decode
  * nulls, strict decode throws like the reference's Jackson deserializer,
  * and the quarantine predicate separates the two populations exactly.
  */
class SerdesMalformedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val good = """{"symbol":"AAA","buy":true,"amount":1.5,"numberShares":2}"""
  private val notJson = """{"symbol": <<<garbage"""
  private val wrongType = """{"symbol":"BBB","buy":"not_a_bool","amount":1.5,"numberShares":2}"""
  private val missingFields = """{"symbol":"CCC"}"""

  test("permissive decode: malformed values become all-null structs, never errors") {
    val rows = Seq(good, notJson, missingFields)
      .toDF("value")
      .select(col("value"), Serdes.decodeTransaction(col("value")).as("t"))
      .collect()
    assert(rows(0).getStruct(1).getString(0) == "AAA")
    assert(rows(0).getStruct(1).getBoolean(1))
    // unparseable JSON: the decode yields an all-null-fields struct (Spark's
    // PERMISSIVE semantics), never an error
    val corrupt = rows(1).getStruct(1)
    assert((0 until corrupt.length).forall(corrupt.isNullAt),
      "unparseable JSON must decode to an all-null-fields struct")
    // schema-valid JSON with absent fields keeps the row, nulls the fields
    assert(rows(2).getStruct(1).getString(0) == "CCC")
    assert(rows(2).getStruct(1).isNullAt(1))
  }

  test("quarantine predicate flags exactly the corrupt rows") {
    val flagged = Seq(good, notJson, missingFields, wrongType)
      .toDF("value")
      .select(col("value"), Serdes.isCorrupt(col("value")).as("bad"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!flagged(good))
    assert(flagged(notJson))
    assert(!flagged(missingFields), "missing fields are absent data, not corruption")
    // type mismatch: PERMISSIVE nulls the whole record (the Jacksonesque
    // parser aborts the row), so it quarantines as corrupt
    assert(flagged(wrongType))
    // a NULL wire value (Kafka tombstone) is not corrupt
    val tombstone = Seq(Option.empty[String]).toDF("value")
      .select(Serdes.isCorrupt(col("value"))).head()
    assert(!tombstone.getBoolean(0))
  }

  test("strict decode throws on malformed input, like the reference deserializer") {
    val e = intercept[Exception] {
      Seq(good, notJson).toDF("value")
        .select(Serdes.decodeTransactionStrict(col("value")).as("t"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m != null && (m.contains("Malformed") || m.contains("FAILFAST"))),
      s"expected a malformed-record failure, got: ${messages(e)}")
    // and the strict decode is the identity on clean input
    val ok = Seq(good).toDF("value")
      .select(Serdes.decodeTransactionStrict(col("value")).as("t"))
      .select("t.symbol", "t.numberShares").head()
    assert(ok.getString(0) == "AAA" && ok.getInt(1) == 2)
  }
}
