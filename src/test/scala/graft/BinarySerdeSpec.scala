package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Serdes

/** Byte-level layout of the ValueAndTimestamp binary serde — the reference's
  * 8-byte big-endian timestamp ‖ JSON-bytes framing (`SerdeUtil.java:53-95`).
  */
class BinarySerdeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("frame layout: 8-byte BE timestamp prefix then JSON bytes") {
    val df = Seq((1L, """{"a":1}""")).toDF("ts", "json")
      .select(Serdes.encodeValueAndTimestamp(col("ts"), col("json")).as("bin"))
    val bytes = df.head().getAs[Array[Byte]]("bin")
    assert(bytes.length == 8 + 7)
    assert(bytes.take(8).sameElements(Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)))
    assert(new String(bytes.drop(8), "UTF-8") == """{"a":1}""")
  }

  test("round trip preserves timestamp and value for arbitrary millis") {
    val fixtures = Seq(
      (0L, "{}"), (1234567890123L, """{"symbol":"CFLT","buys":5000.0}"""),
      (253402300799999L, """{"x":"y"}"""), // year 9999
      // signed 8-byte BE framing (reference uses ByteBuffer.putLong):
      // pre-1970 timestamps must survive the unsigned hex decode
      (-1L, """{"neg":"ms"}"""), (-62135596800000L, """{"year":"0001"}"""),
      (Long.MinValue, """{"edge":"min"}"""), (Long.MaxValue, """{"edge":"max"}"""))
    val df = fixtures.toDF("ts", "json")
      .select(col("ts"), col("json"),
        Serdes.encodeValueAndTimestamp(col("ts"), col("json")).as("bin"))
    val (tsMs, json) = Serdes.decodeValueAndTimestamp(col("bin"))
    val back = df.select(col("ts"), col("json"), tsMs.as("ts2"), json.as("json2"))
      .collect()
    back.foreach { r =>
      assert(r.getLong(0) == r.getLong(2), "timestamp must round-trip")
      assert(r.getString(1) == r.getString(3), "value bytes must round-trip")
    }
  }
}
