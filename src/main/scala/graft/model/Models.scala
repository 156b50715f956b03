package graft.model

/** Input stream record.
  *
  * Mirrors the reference's `model/StockTransaction.java:3-9` (proto twin
  * `src/main/proto/interactive_query_service.proto:39-44`): the JSON-encoded
  * record consumed from Kafka topic `input`.
  */
case class StockTransaction(
    symbol: String,
    buy: Boolean,
    amount: Double,
    numberShares: Int
)

/** Materialized aggregate (the reference's query-able "state").
  *
  * Mirrors `interactive_query_service.proto:46-51` /
  * `model/StockTransactionAggregation.java:5-9`, computed by the Aggregator in
  * `streams/KafkaStreamsService.java:62-74`: running buy/sell dollar totals and
  * share count per symbol.
  */
case class StockTransactionAggregation(
    symbol: String,
    buys: Double,
    sells: Double,
    number_shares: Long
)
