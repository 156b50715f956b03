package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Value encode/decode (S2/S3) — the reference's serde layer
  * (`streams/SerdeUtil.java:27-168`) re-expressed as codegen'd column
  * functions.
  *
  * - decode: JSON bytes → `StockTransaction` (Jackson `ObjectDeserializer`,
  *   `SerdeUtil.java:151-167`) → `from_json` with a fixed schema.
  * - encode: aggregate → canonical JSON (`ProtoAggregationJsonSerializer`,
  *   `SerdeUtil.java:97-111`) → `to_json(struct(...))`. proto3's printer omits
  *   zero-valued fields at the store layer but the REST layer forces them
  *   present (`config/KafkaStreamsAppConfiguration.java:66-84`); `to_json`
  *   keeps zeros, i.e. we pin the REST-layer behavior (SURVEY §1.3).
  */
object Serdes {

  /** Wire schema of the input record (`model/StockTransaction.java:3-9`). */
  val stockTransactionSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("buy", BooleanType),
    StructField("amount", DoubleType),
    StructField("number_shares", IntegerType)
  ))

  /** Kafka-shaped decode: a string/binary JSON value column → typed columns. */
  def decodeTransaction(json: Column): Column =
    from_json(json.cast("string"), stockTransactionSchema)

  /** txns DataFrame → (symbol, value-JSON) changelog shape, ready for a Kafka
    * sink (`.to(outputTopic)`, `KafkaStreamsService.java:93`).
    */
  def encodeAggregation(agg: DataFrame): DataFrame =
    agg.select(
      col("symbol").as("key"),
      to_json(struct(col("symbol"), col("buys"), col("sells"), col("number_shares"))).as("value")
    )

  /** Round-trip: encode each txn row to JSON and decode it back. Used by the
    * serde-parity query — the result must be byte-identical to the input.
    */
  def roundTripTransactions(txns: DataFrame): DataFrame = {
    val encoded = txns.select(
      to_json(struct(col("symbol"), col("buy"), col("amount"), col("number_shares"))).as("value")
    )
    encoded
      .select(decodeTransaction(col("value")).as("t"))
      .select(col("t.symbol"), col("t.buy"), col("t.amount"), col("t.number_shares"))
  }
}
