package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

/** The transport seam (S1/S4): where records enter and leave the engine.
  *
  * The reference's identity is topic-in → topic-out:
  * `builder.stream(inputTopic, Consumed.with(stringSerde, stockTransactionSerde))`
  * … `.to(outputTopic, Produced.with(stringSerde, protoSerde))`
  * (`streams/KafkaStreamsService.java:78-93`). This engine expresses the same
  * seam as a config-driven source/sink pair:
  *
  *   - [[SourceFormat.Kafka]] / [[SinkFormat.Kafka]] construct the literal
  *     Structured Streaming connector plan —
  *     `readStream.format("kafka").option("subscribe", topic)` and
  *     `writeStream.format("kafka").option("topic", topic)` — exactly what a
  *     deployment with brokers runs. (This sandbox ships no
  *     `spark-sql-kafka` connector jar and no broker, so `.load()` on this
  *     branch fails at provider lookup; TransportSpec pins that failure mode
  *     and the option wiring.)
  *   - [[SourceFormat.FileReplay]] / [[SinkFormat.FileChangelog]] are the
  *     hermetic stand-ins: staged parquet chunks replayed one file per
  *     micro-batch, re-encoded to the SAME wire shape Kafka would deliver
  *     (binary key = symbol bytes, binary value = the Jackson-shaped JSON,
  *     `SerdeUtil.java:151-167`), and an idempotent per-batch parquet
  *     changelog standing in for the output topic.
  *
  * Everything downstream of [[readTransactionStream]] is format-agnostic: the
  * decode ([[decodeWire]]) and the aggregation operate on the wire columns
  * (key binary, value binary), so swapping FileReplay → Kafka changes ONLY
  * the leaf of the plan. That is the whole point of the seam: the streaming
  * pipeline registered in SparkEntry runs the byte-identical wire path the
  * Kafka deployment would, brokers or not.
  */
object Transport {

  sealed trait SourceFormat
  object SourceFormat {
    /** Deterministic file replay: parquet chunks under `path` with the typed
      * txn schema, `maxFilesPerTrigger` files per micro-batch.
      */
    final case class FileReplay(
        path: String, schema: StructType, maxFilesPerTrigger: Int = 1)
      extends SourceFormat

    /** Literal Kafka topic source (`builder.stream(inputTopic, ...)` with
      * `AutoOffsetReset.EARLIEST`, `KafkaStreamsService.java:78-80`).
      */
    final case class Kafka(
        bootstrapServers: String, topic: String,
        startingOffsets: String = "earliest")
      extends SourceFormat
  }

  sealed trait SinkFormat
  object SinkFormat {
    /** Idempotent per-batch parquet changelog (the output-topic stand-in):
      * dynamic partition overwrite on a per-batch directory, so at-least-once
      * foreachBatch retries replace their own output.
      */
    final case class FileChangelog(path: String) extends SinkFormat

    /** Literal Kafka topic sink (`.to(outputTopic, ...)`,
      * `KafkaStreamsService.java:93`).
      */
    final case class Kafka(bootstrapServers: String, topic: String)
      extends SinkFormat
  }

  /** Connector options for the Kafka source branch — factored out so the
    * wiring is spec-assertable without a broker or connector jar.
    */
  def kafkaSourceOptions(cfg: SourceFormat.Kafka): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> cfg.bootstrapServers,
    "subscribe" -> cfg.topic,
    "startingOffsets" -> cfg.startingOffsets)

  /** Connector options for the Kafka sink branch. */
  def kafkaSinkOptions(cfg: SinkFormat.Kafka): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> cfg.bootstrapServers,
    "topic" -> cfg.topic)

  /** The streaming source in Kafka wire shape — (key binary, value binary) —
    * whichever transport delivers it. FileReplay re-encodes its typed rows
    * through the wire serde so the downstream plan is bit-identical to what
    * a broker would feed it.
    */
  def readTransactionStream(spark: SparkSession, source: SourceFormat): DataFrame =
    source match {
      case SourceFormat.FileReplay(path, schema, maxFiles) =>
        spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", maxFiles.toString)
          .parquet(path)
          .select(
            col("symbol").cast("binary").as("key"),
            Serdes.encodeTransaction.cast("binary").as("value"))
      case k: SourceFormat.Kafka =>
        kafkaSourceOptions(k)
          .foldLeft(spark.readStream.format("kafka")) {
            case (r, (key, v)) => r.option(key, v)
          }
          .load()
          .select(col("key"), col("value"))
    }

  /** Wire → typed txn columns; shared verbatim by every source format (the
    * reference's `stockTransactionSerde` deserializer seam,
    * `SerdeUtil.java:151-167`).
    */
  def decodeWire(wire: DataFrame): DataFrame =
    wire
      .select(Serdes.decodeTransaction(col("value")).as("t"))
      .select(
        col("t.symbol").as("symbol"), col("t.buy").as("buy"),
        col("t.amount").as("amount"), col("t.numberShares").as("number_shares"))

  /** Configure the changelog writer for the chosen sink. The aggregate is
    * wire-encoded ([[Serdes.encodeAggregation]] — key = symbol, value =
    * proto-JSON) on BOTH branches; only the transport differs. Callers still
    * own outputMode/trigger/checkpoint.
    */
  def changelogWriter(agg: DataFrame, sink: SinkFormat): DataStreamWriter[Row] =
    sink match {
      case SinkFormat.FileChangelog(path) =>
        agg.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
          writeBatchIdempotent(
            Serdes.encodeAggregation(batch).withColumn("batch_id", lit(batchId)),
            batchId, path)
        }
      case k: SinkFormat.Kafka =>
        kafkaSinkOptions(k).foldLeft(
          Serdes.encodeAggregation(agg)
            .select(col("key").cast("binary").as("key"),
              col("value").cast("binary").as("value"))
            .writeStream.format("kafka")) {
          case (w, (key, v)) => w.option(key, v)
        }
    }

  /** foreachBatch is AT-LEAST-ONCE: a batch whose sink write committed but
    * whose streaming commit log didn't records again on restart, and a blind
    * append would duplicate its rows. Dynamic partition overwrite on a
    * per-batch partition directory makes the retry replace its own output —
    * the standard idempotent-foreachBatch pattern. `batch_id` stays a regular
    * long column; the partition key `p_batch` is a separate throwaway column
    * (readers drop it — partition-column type inference would reread it as
    * int regardless of the written type).
    */
  def writeBatchIdempotent(df: DataFrame, batchId: Long, dir: String): Unit =
    df.withColumn("p_batch", lit(batchId.toString))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("p_batch")
      .parquet(dir)
}
