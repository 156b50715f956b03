package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sources.Transport
import graft.sources.Transport.{SinkFormat, SourceFormat}
import graft.util.Fs

/** The transport seam (S1/S4): file replay and the literal Kafka connector
  * must be interchangeable behind [[Transport.readTransactionStream]] /
  * [[Transport.changelogWriter]]. No broker exists in this sandbox (and no
  * `spark-sql-kafka` connector jar ships with it), so the Kafka branch is
  * pinned at the two points that don't need one: the exact connector wiring
  * it constructs, and the fact that it really does construct
  * `format("kafka")` — provider lookup is the first thing `.load()` does,
  * and its failure message names the missing source.
  */
class TransportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val txnSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("buy", BooleanType),
    StructField("amount", DoubleType),
    StructField("number_shares", IntegerType)))

  test("file replay delivers the Kafka wire shape and round-trips the txns") {
    val dir = Paths.get("target", "transport_spec", "replay").toAbsolutePath
    Fs.deleteRecursively(dir)
    Files.createDirectories(dir)
    val txns = Seq(
      ("AAA", true, 10.5, 3), ("BBB", false, 2.25, 7), ("AAA", false, 0.0, 0))
    txns.toDF("symbol", "buy", "amount", "number_shares")
      .coalesce(1).write.parquet(dir.resolve("staging").toString)

    val wire = Transport.readTransactionStream(spark,
      SourceFormat.FileReplay(dir.resolve("staging").toString, txnSchema))
    // the source is wire-shaped: binary key/value, exactly Kafka's columns
    assert(wire.schema.map(f => (f.name, f.dataType)) ==
      Seq(("key", BinaryType), ("value", BinaryType)))

    val outDir = dir.resolve("out").toString
    val q = Transport.decodeWire(wire)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()

    val got = spark.read.parquet(outDir)
      .as[(String, Boolean, Double, Int)].collect().toSet
    assert(got == txns.toSet, "wire encode→decode must be the identity")
  }

  test("kafka source branch constructs the literal connector plan") {
    val cfg = SourceFormat.Kafka("broker-1:9092,broker-2:9092", "input")
    // the wiring the connector receives, pinned exactly
    // (KafkaStreamsService.java:78-80: inputTopic, EARLIEST)
    assert(Transport.kafkaSourceOptions(cfg) == Map(
      "kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
      "subscribe" -> "input",
      "startingOffsets" -> "earliest"))
    // and the branch really asks Spark for format("kafka"): provider lookup
    // is the first step of load(), and this sandbox has no connector jar —
    // the error must name the kafka source (with a broker + connector this
    // same call returns the wire-shaped stream)
    val e = intercept[Exception] {
      Transport.readTransactionStream(spark, cfg)
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("kafka sink branch constructs the literal connector writer") {
    assert(Transport.kafkaSinkOptions(SinkFormat.Kafka("b:9092", "output")) ==
      Map("kafka.bootstrap.servers" -> "b:9092", "topic" -> "output"))
    // building the writer itself needs no provider lookup (that happens at
    // start()), so the sink branch is constructible broker-less — the writer
    // encodes (key, value) through the SAME Serdes path as FileChangelog
    val dir = Paths.get("target", "transport_spec", "sink").toAbsolutePath
    Fs.deleteRecursively(dir)
    Files.createDirectories(dir)
    Seq(("AAA", 1.0, 2.0, 3L)).toDF("symbol", "buys", "sells", "number_shares")
      .write.parquet(dir.resolve("agg").toString)
    val aggStream = spark.readStream
      .schema(StructType(Seq(
        StructField("symbol", StringType), StructField("buys", DoubleType),
        StructField("sells", DoubleType), StructField("number_shares", LongType))))
      .parquet(dir.resolve("agg").toString)
    val w = Transport.changelogWriter(aggStream, SinkFormat.Kafka("b:9092", "output"))
    assert(w != null)
  }

  test("downstream plan shape is transport-independent") {
    // decodeWire is shared code, so the plan ABOVE the source leaf is the
    // same for any transport delivering the wire shape. Feed it a static
    // kafka-wire-shaped frame and compare the decode's analyzed shape with
    // the streaming file-replay decode: same expressions, same schema.
    val staticWire = Seq(("AAA".getBytes, """{"symbol":"AAA","buy":true,"amount":1.5,"numberShares":2}""".getBytes))
      .toDF("key", "value")
    val decodedStatic = Transport.decodeWire(staticWire)

    val dir = Paths.get("target", "transport_spec", "shape").toAbsolutePath
    Fs.deleteRecursively(dir)
    Files.createDirectories(dir)
    Seq(("AAA", true, 1.5, 2)).toDF("symbol", "buy", "amount", "number_shares")
      .write.parquet(dir.resolve("staging").toString)
    val decodedReplay = Transport.decodeWire(Transport.readTransactionStream(
      spark, SourceFormat.FileReplay(dir.resolve("staging").toString, txnSchema)))

    assert(decodedStatic.schema == decodedReplay.schema,
      "transports must agree on the decoded schema")
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect {
        case n if !n.children.isEmpty || n.getClass.getSimpleName.contains("Project") =>
          n.getClass.getSimpleName
      }
    assert(shape(decodedStatic).takeWhile(_ == "Project") ==
      shape(decodedReplay).takeWhile(_ == "Project"),
      "decode must contribute identical plan nodes above the source leaf")
  }
}
