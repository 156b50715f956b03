package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ExecutionInfo, InteractiveQueries, StockAggregation}

class ExecutionInfoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("collectWithInfo reports exact row count, latency, and the executed plan") {
    val agg = StockAggregation.aggregate(Tables.transactions(spark, sfDir))
    val q = InteractiveQueries.rangeQuery(agg, Some("U000004"), Some("U000009"))
    val (rows, info) = ExecutionInfo.collectWithInfo(q)
    assert(info.rowCount == rows.length.toLong)
    assert(rows.nonEmpty)
    assert(info.elapsedMs >= 0)
    assert(info.plan.contains("Scan parquet"), "plan should expose the physical scan")
    assert(info.render == s"retrieved ${rows.length} results in ${info.elapsedMs} ms")
  }

  test("observed count is exact for an empty result") {
    val agg = StockAggregation.aggregate(Tables.transactions(spark, sfDir))
    val (rows, info) = ExecutionInfo.collectWithInfo(
      InteractiveQueries.keyQuery(agg, "NO_SUCH_KEY"))
    assert(rows.isEmpty && info.rowCount == 0)
  }
}
