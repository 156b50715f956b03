package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.operators.{InteractiveQueries, StockAggregation}
import graft.state.MaterializedState

/** Serving-path checks: the IQ functions read the materialized snapshot, the
  * snapshot equals the raw-recompute aggregate, and key predicates actually
  * reach the parquet scan (pushdown + file pruning via the sorted layout).
  */
class MaterializedStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val state = MaterializedState.read(spark, sfDir)
  private lazy val raw = StockAggregation.aggregate(Tables.transactions(spark, sfDir))

  test("snapshot equals the raw-recompute aggregate") {
    assert(state.count() == raw.count())
    assert(state.except(raw).isEmpty && raw.except(state).isEmpty)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no file scan in plan"))

  test("key query pushes the symbol predicate into the parquet scan") {
    val scan = scanOf(InteractiveQueries.keyQuery(state, "U000007"))
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("EqualTo(symbol,U000007)"), s"PushedFilters=$pushed")
  }

  test("range bounds push down, and the layout gives disjoint per-file key intervals") {
    val bounded = InteractiveQueries.rangeQuery(state, Some("U000004"), Some("U000009"))
    val pushed = scanOf(bounded).metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(symbol,U000004)") &&
      pushed.contains("LessThanOrEqual(symbol,U000009)"), s"PushedFilters=$pushed")
    // The range-partition + sort layout means every parquet file covers a
    // disjoint symbol interval — the property that lets the pushed bounds
    // skip whole row groups via column min/max statistics.
    val intervals = state
      .select(input_file_name().as("f"), col("symbol"))
      .groupBy("f").agg(min("symbol").as("lo"), max("symbol").as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
    assert(intervals.length > 1, s"snapshot should span multiple files, got ${intervals.length}")
    intervals.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file intervals overlap: $hi1 >= $lo2")
      case _ =>
    }
  }

  test("bucketed serving tables join with no shuffle on either side") {
    // At test SF the planner rightly broadcasts the small side (also
    // shuffle-free); the bucketing exists for the large-large case, so
    // disable broadcast to expose it: the sort-merge join must read both
    // bucketed layouts directly, with NO hash-partitioning exchange.
    val joined = MaterializedState.bucketedJoin(spark, sfDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val plan =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined.queryExecution.executedPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"),
      s"expected a bucketed sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed co-located join must not shuffle:\n$plan")
    // and it is the vat-join relational content
    val viaRecompute = raw.join(
      Tables.transactionsWithTs(spark, sfDir)
        .groupBy("symbol").agg(max(unix_millis(col("ts"))).as("max_ts_ms")),
      "symbol")
    assert(joined.count() == viaRecompute.count())
    assert(joined.except(viaRecompute).isEmpty && viaRecompute.except(joined).isEmpty)
  }

  test("bucketed tables rebuild cleanly in a fresh catalog over a stale directory") {
    // Simulate a new JVM run against leftover state: the in-memory catalog
    // forgets the tables but the bucketed directories persist. The build path
    // must clear the stale location before its CTAS (a blind saveAsTable
    // fails on a non-empty location since Spark 3.2).
    // materialize first's rows up front: the rebuild rewrites the underlying
    // files, invalidating the old DataFrame's resolved file listing
    val firstRows = MaterializedState.bucketedJoin(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val tables = spark.catalog.listTables()
      .collect().map(_.name).filter(_.startsWith("graft_"))
    assert(tables.nonEmpty, "expected bucketed graft_* tables in catalog")
    tables.foreach(t => spark.sql(s"DROP TABLE $t"))
    MaterializedState.bucketedBuilt.clear()
    val againRows = MaterializedState.bucketedJoin(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(againRows == firstRows)
  }

  test("filtered range collapses key bounds and compiled predicate into one scan") {
    val df = InteractiveQueries.filteredRangeQuery(
      state, Some("U000000"), Some("U000099"), "@.buys > @.sells")
    val plan = df.queryExecution.executedPlan.toString
    // exactly one scan, no shuffle: predicate evaluated inside the scan stage
    assert(!plan.contains("Exchange"), s"unexpected shuffle in serving plan:\n$plan")
  }
}
