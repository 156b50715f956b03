package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Join-side skew coverage: the term-rarity query is the corpus pipeline's
  * natural hot-key join (stopwords hit nearly every document), and this spec
  * proves BOTH halves of its scale story:
  *
  *   - at test scale Catalyst broadcasts the small document-frequency side —
  *     no shuffle on the probe, skew irrelevant;
  *   - when the join IS shuffled (the 100 TB shape: the df side is a
  *     trillion-term vocabulary), AQE's skew-join mitigation detects the hot
  *     key's oversized partition and splits it — asserted on a
  *     deliberately skewed shuffled join with thresholds scaled down to
  *     test-data sizes (the detection arithmetic is size-ratio based, so
  *     engaging it at MB scale proves the same path that engages at GB
  *     scale per partition).
  */
class JoinSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("term-rarity computes df without any join — one corpus explode, " +
    "window count over the tf aggregate (r15 plan)") {
    val plan = TextAnalysis.termRarity(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan.toString
    // r15: the df side no longer exists as a join input — it's a window
    // count over tf's own term partitioning, so the exploded term stream
    // is scanned and shuffled once (OPTIMIZATION_r15.md §5)
    assert(!plan.contains("Join"),
      s"df must come from the window, never a join:\n$plan")
    assert("Generate".r.findAllIn(plan).length == 1,
      s"exactly one corpus explode may run:\n$plan")
    assert(plan.contains("windowspecdefinition(term"),
      s"df must be the term-partitioned window count:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("AQE splits the hot key's partition when the skewed join is shuffled") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // scale the byte thresholds down to test-data sizes; ratios unchanged
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 90% of 200k fact rows share key 0 (the "stopword"); dims are 100 keys
      val fact = spark.range(200000)
        .select(
          when(col("id") % 10 === 0, pmod(col("id"), lit(100))).otherwise(0L).as("k"),
          concat(lit("payload_"), lpad(col("id").cast("string"), 64, "x")).as("v"))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") * 7).as("w"))

      val joined = fact.join(dim, Seq("k"))
      val qe = joined.queryExecution
      assert(qe.toRdd.count() == 200000L) // AQE finalizes the plan on execution
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew mitigation must engage on the hot key:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
