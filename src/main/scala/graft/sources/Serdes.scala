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
  *
  * Wire-format note: the reference's JSON uses camelCase `numberShares` —
  * Jackson serializes the POJO getter `getNumberShares`
  * (`model/StockTransaction.java:3-9`) and proto3 `JsonFormat.printer()`
  * camelizes the proto field `number_shares`
  * (`interactive_query_service.proto:44,50`). The wire schemas below therefore
  * say `numberShares`; the internal engine column stays `number_shares`.
  */
object Serdes {

  /** Wire schema of the input record (`model/StockTransaction.java:3-9`),
    * field names as Jackson emits them.
    */
  val stockTransactionWireSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("buy", BooleanType),
    StructField("amount", DoubleType),
    StructField("numberShares", IntegerType)
  ))

  /** Wire schema of the stored aggregate (`interactive_query_service.proto:46-51`
    * via `JsonFormat.printer()` — camelCase field names).
    *
    * Deliberate deviation: the proto declares `number_shares` as int32
    * (`interactive_query_service.proto:50`) but this engine's aggregate sums
    * shares into a Long, so the wire schema widens the field to LongType.
    * A changelog value whose sum exceeds 2^31-1 would not parse back through
    * the reference's int32 `JsonFormat.parser()` — acceptable here because the
    * reference itself would have overflowed its int accumulator long before
    * (`KafkaStreamsService.java:70`); widening is the correct engine-side fix.
    */
  val aggregationWireSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("buys", DoubleType),
    StructField("sells", DoubleType),
    StructField("numberShares", LongType)
  ))

  /** Kafka-shaped decode: a string/binary JSON value column → typed struct
    * with wire field names.
    *
    * MALFORMED-INPUT POLICY (pinned by SerdesMalformedSpec): this is the
    * PERMISSIVE decode — a value that is not valid JSON for the wire schema
    * decodes to an all-null-fields struct instead of failing the job. The
    * reference's Jackson deserializer THROWS instead
    * (`SerdeUtil.java:160-166` wraps `IOException` in `RuntimeException`),
    * tearing down the Streams thread on one bad record. At 100 TB that
    * posture is wrong for Spark — a single poison record must not kill a
    * 1000-executor job — so the engine's default is permissive with
    * [[isCorrupt]] as the quarantine predicate (route `isCorrupt` rows to a
    * dead-letter sink, decode the rest); [[decodeTransactionStrict]] is the
    * reference-parity mode for pipelines that WANT one bad byte to stop the
    * world.
    */
  def decodeTransaction(json: Column): Column =
    from_json(json.cast("string"), stockTransactionWireSchema)

  /** Reference-parity STRICT decode: FAILFAST `from_json` raises on the
    * first malformed value, like the reference's throwing Jackson
    * deserializer (`SerdeUtil.java:160-166`).
    */
  def decodeTransactionStrict(json: Column): Column =
    from_json(json.cast("string"), stockTransactionWireSchema,
      Map("mode" -> "FAILFAST"))

  /** [[decodeTransaction]] with the parser's corrupt-record channel exposed:
    * the extra `_corrupt` field carries the RAW value for rows the parser
    * rejected (invalid JSON, or a type-mismatched field — the same inputs
    * the reference's Jackson POJO reader throws on) and is null for clean
    * rows. Absent fields are absent data, not corruption.
    */
  def decodeTransactionQuarantine(json: Column): Column =
    from_json(json.cast("string"),
      stockTransactionWireSchema.add(StructField("_corrupt", StringType)),
      Map("columnNameOfCorruptRecord" -> "_corrupt"))

  /** Quarantine predicate for the permissive decode: true exactly when the
    * parser rejected the wire value. Codegen'd column expression — usable
    * as a hot-path filter feeding a dead-letter sink.
    */
  def isCorrupt(json: Column): Column =
    decodeTransactionQuarantine(json).getField("_corrupt").isNotNull

  /** Encode one txn row to its wire JSON (Jackson shape, camelCase). A plain
    * column expression over the standard txn column names — bind it by
    * selecting it on a DataFrame that has those columns.
    */
  def encodeTransaction: Column =
    to_json(struct(
      col("symbol"), col("buy"), col("amount"),
      col("number_shares").as("numberShares")
    ))

  /** agg DataFrame → (key, value-JSON) changelog shape, ready for a Kafka
    * sink (`.to(outputTopic)`, `KafkaStreamsService.java:93`). Value is the
    * proto-JSON of the aggregate (`SerdeUtil.java:97-111`, camelCase).
    */
  def encodeAggregation(agg: DataFrame): DataFrame =
    agg.select(
      col("symbol").as("key"),
      to_json(struct(
        col("symbol"), col("buys"), col("sells"),
        col("number_shares").as("numberShares")
      )).as("value")
    )

  /** Inverse of [[encodeAggregation]]: changelog (key, value-JSON) → typed
    * aggregate columns with internal names (`SerdeUtil.java:113-133`).
    */
  def decodeAggregation(changelog: DataFrame): DataFrame =
    changelog
      .select(from_json(col("value").cast("string"), aggregationWireSchema).as("a"))
      .select(
        col("a.symbol").as("symbol"), col("a.buys").as("buys"),
        col("a.sells").as("sells"), col("a.numberShares").as("number_shares")
      )

  /** The reference's `ValueAndTimestamp` binary serde (`SerdeUtil.java:53-95`,
    * built and unit-tested there but unused by the topology): an 8-byte
    * big-endian timestamp followed by the value's JSON bytes. Reproduced with
    * native binary expressions: hex/unhex give the big-endian long encoding,
    * binary concat/substring do the framing — all codegen'd, no UDF.
    */
  def encodeValueAndTimestamp(tsMillis: Column, valueJson: Column): Column =
    concat(
      unhex(lpad(hex(tsMillis), 16, "0")),
      valueJson.cast("binary"))

  /** Inverse of [[encodeValueAndTimestamp]]: (ts_millis, value-JSON string).
    * The 8-byte frame is SIGNED big-endian (the reference uses
    * `ByteBuffer.putLong`), but `conv(hex, 16, 10)` yields the UNSIGNED 2^64
    * representation — so reinterpret through DECIMAL(20,0): values above
    * Long.MaxValue are the two's-complement image of negative timestamps and
    * shift down by 2^64. Exact at every step (decimal holds 2^64; the final
    * cast is in-range), so pre-1970 timestamps round-trip correctly.
    */
  def decodeValueAndTimestamp(bin: Column): (Column, Column) = {
    val unsigned = conv(hex(substring(bin, 1, 8)), 16, 10).cast("decimal(20,0)")
    val signed = when(unsigned > lit(Long.MaxValue),
      unsigned - lit(BigDecimal("18446744073709551616"))).otherwise(unsigned)
    (signed.cast("long"),
      bin.substr(lit(9), length(bin) - 8).cast("string"))
  }

  /** Round-trip: encode each txn row to wire JSON and decode it back. Used by
    * the serde-parity query — the result must be byte-identical to the input.
    */
  def roundTripTransactions(txns: DataFrame): DataFrame =
    txns
      .select(encodeTransaction.as("value"))
      .select(decodeTransaction(col("value")).as("t"))
      .select(
        col("t.symbol").as("symbol"), col("t.buy").as("buy"),
        col("t.amount").as("amount"), col("t.numberShares").as("number_shares")
      )
}
