package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Features, Versioning}

/** Rolling-history feature engineering + snapshot diff, on hand-computed
  * fixtures (the registered forms are oracle-checked against DuckDB).
  */
class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400L

  test("rolling features: idx / lag / gap / trailing-3 / cumulative") {
    val orders = Seq(
      (101L, 1L, "1993-01-01 00:00:00", 10.0),
      (102L, 1L, "1993-01-02 00:00:00", 20.0),
      (103L, 1L, "1993-01-03 00:00:00", 30.0),
      (105L, 1L, "1993-01-04 00:00:00", 50.0), // same ts as 104 —
      (104L, 1L, "1993-01-04 00:00:00", 40.0), // orderkey breaks the tie
      (201L, 2L, "1993-01-01 00:00:00", 5.0))
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
    val rows = Features.rollingOrderFeatures(orders)
      .orderBy("o_custkey", "order_idx").collect()

    assert(rows.map(_.getLong(0)).toSeq ==
      Seq(101L, 102L, 103L, 104L, 105L, 201L), "orderkey tiebreak within day")
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 1L))
    // prev_price: null, 10, 20, 30, 40, null
    assert(rows.head.isNullAt(4) && rows.last.isNullAt(4))
    assert(rows.slice(1, 5).map(_.getDouble(4)).toSeq ==
      Seq(10.0, 20.0, 30.0, 40.0))
    // gap_s: null, day, day, day, 0 (same-day pair), null
    assert(rows.head.isNullAt(5))
    assert(rows.slice(1, 5).map(_.getLong(5)).toSeq == Seq(day, day, day, 0L))
    // trailing-3 spend (current row excluded): null, 10, 30, 60, 90
    assert(rows.head.isNullAt(6), "empty trailing frame sums to null")
    assert(rows.slice(1, 5).map(_.getDouble(6)).toSeq ==
      Seq(10.0, 30.0, 60.0, 90.0))
    assert(rows.map(_.getLong(7)).toSeq == Seq(0L, 1L, 2L, 3L, 3L, 0L))
    // lifetime spend including current: 10, 30, 60, 100, 150, 5
    assert(rows.map(_.getDouble(8)).toSeq ==
      Seq(10.0, 30.0, 60.0, 100.0, 150.0, 5.0))
  }

  test("rolling features plan: one exchange, one sort, one Window") {
    val orders = Seq((1L, 1L, "1993-01-01 00:00:00", 1.0))
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
    val plan = Features.rollingOrderFeatures(orders)
      .queryExecution.executedPlan.toString
    def n(marker: String) = marker.r.findAllIn(plan).length
    assert(n("Exchange") == 1, s"every feature must share ONE shuffle:\n$plan")
    assert(n("(?i)\\bsort\\b") == 1, s"and ONE in-partition sort:\n$plan")
  }

  test("resample+fill: per-key grid to the global max, forward-filled") {
    val series = Seq(
      ("A", 0L, 5L), ("A", 20L, 7L), // A misses t=10
      ("B", 10L, 1L))                // B starts late, misses t=20
      .toDF("k", "t", "v")
    val rows = Features.resampleFill(series, "k", "t", "v", step = 10L)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.toSeq == Seq(
      ("A", 0L, 5L, false), ("A", 10L, 5L, true), ("A", 20L, 7L, false),
      ("B", 10L, 1L, false), ("B", 20L, 1L, true)))
  }

  test("resample+fill: empty input returns the declared schema, no NPE") {
    val series = Seq(("A", 0L, 5L)).toDF("k", "t", "v").limit(0)
    val out = Features.resampleFill(series, "k", "t", "v", step = 10L)
    assert(out.columns.toSeq == Seq("k", "t", "v", "is_gap"))
    assert(out.count() == 0L)
  }

  test("embedding drift: a constant shift in one dimension is reported " +
    "on exactly that dimension") {
    val v1 = Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(0.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val v2 = Seq(
      (1L, Seq(0.5f, 1.0f)), (2L, Seq(0.5f, 3.0f)))
      .toDF("vec_id", "embedding")
    val rows = Versioning.embeddingDrift(v1, v2).orderBy("dim").collect()
      .map(r => (r.getAs[Int]("dim"), r.getAs[Double]("mean_shift"),
        r.getAs[Double]("std_v1"), r.getAs[Long]("n_v2")))
    assert(rows.toSeq == Seq((0, 0.5, 0.0, 2L), (1, 0.0, 1.0, 2L)))
  }

  test("snapshot diff: null payloads get sentinels — a column-shift edit " +
    "is 'changed', not aliased to unchanged") {
    val v1 = Seq((1L, Some("a"), None: Option[String]))
      .toDF("id", "c1", "c2")
    val v2 = Seq((1L, None: Option[String], Some("a")))
      .toDF("id", "c1", "c2")
    val rows = Versioning.snapshotDiff(v1, v2, "id", Seq("c1", "c2")).collect()
    assert(rows.length == 1 && rows.head.getString(1) == "changed",
      "(a,NULL) vs (NULL,a) must fingerprint differently")
  }

  test("resample+fill islands plan: no join at all — one obs-scale window, " +
    "grid exploded map-side above it") {
    val series = Seq(("A", 0L, 5L), ("A", 20L, 7L), ("B", 10L, 1L))
      .toDF("k", "t", "v")
    val plan = Features.resampleFill(series, "k", "t", "v", step = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"fill must come from the lead() reign explode, never a grid join:\n$plan")
    assert("Exchange".r.findAllIn(plan).length <= 1,
      s"only the observation-scale window exchange may shuffle:\n$plan")
    // the explode sits ABOVE the window: grid rows are generated after the
    // shuffle, so the exchange moves observations, never the dense grid
    val gen = plan.indexOf("Generate")
    val win = plan.indexOf("Window")
    assert(gen >= 0 && win > gen,
      s"Generate (explode) must consume the Window's output:\n$plan")
  }

  test("resample+fill plan: no cartesian, no nested loop, bounded exchanges") {
    val series = Seq(("A", 0L, 5L), ("A", 20L, 7L), ("B", 10L, 1L))
      .toDF("k", "t", "v")
    val plan = Features.resampleFill(series, "k", "t", "v", step = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"grid generation must stay an explode, never a cross join:\n$plan")
    // per-key minima agg, grid⋈series join, key-partitioned window — the
    // plan may reuse exchanges but must never exceed these four
    assert("Exchange".r.findAllIn(plan).length <= 4,
      s"resample grew an unexpected shuffle:\n$plan")
  }

  test("snapshot diff classifies added / removed / changed, drops unchanged") {
    val v1 = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "en"))
      .toDF("id", "t", "lang")
    val v2 = Seq((2L, "b", "en"), (3L, "C", "en"), (4L, "d", "de"))
      .toDF("id", "t", "lang")
    val rows = Versioning.snapshotDiff(v1, v2, "id", Seq("t", "lang"))
      .orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
    // removed rows carry only the old hash, added only the new
    assert(!rows(0).isNullAt(2) && rows(0).isNullAt(3))
    assert(!rows(1).isNullAt(2) && !rows(1).isNullAt(3) &&
      rows(1).getString(2) != rows(1).getString(3))
    assert(rows(2).isNullAt(2) && !rows(2).isNullAt(3))
  }

  test("snapshot diff: identical snapshots produce an empty diff") {
    val v = Seq((1L, "a", "en"), (2L, "b", "fr")).toDF("id", "t", "lang")
    assert(Versioning.snapshotDiff(v, v, "id", Seq("t", "lang")).isEmpty)
  }

  test("drift report: counts, sums, shares, and a vanished group") {
    // v1: x has 3 docs (30 chars), y has 1 (5); v2: x has 1 (10), z appears
    val v1 = Seq(("x", 10L), ("x", 10L), ("x", 10L), ("y", 5L)).toDF("src", "n")
    val v2 = Seq(("x", 10L), ("z", 7L)).toDF("src", "n")
    val rows = Versioning.driftReport(v1, v2, "src", "n")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.toSeq == Seq(
      ("x", 3L, 1L, 30L, 10L, 0.75, 0.5, -0.25),
      ("y", 1L, 0L, 5L, 0L, 0.25, 0.0, -0.25),
      ("z", 0L, 1L, 0L, 7L, 0.0, 0.5, 0.5)))
  }
}
