package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Olap

class OlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  test("pricingSummary: sums, averages, and the inclusive cutoff") {
    val li = Seq(
      // (flag, status, qty, price, disc, tax, shipdate)
      ("A", "F", 10.0, 100.0, 0.1, 0.05, "1999-01-01"),
      ("A", "F", 20.0, 200.0, 0.0, 0.10, "2000-01-01"), // ON the cutoff: kept
      ("A", "F", 99.0, 999.0, 0.5, 0.50, "2000-01-02")) // past it: dropped
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "sd")
      .withColumn("l_shipdate", to_timestamp(col("sd")))
    val r = Olap.pricingSummary(li, "2000-01-01").head()
    assert(r.getAs[Long]("count_order") == 2L)
    assert(r.getAs[Double]("sum_qty") == 30.0)
    assert(r.getAs[Double]("sum_base_price") == 300.0)
    // disc: 100*0.9 + 200*1.0 = 290; charge: 90*1.05 + 200*1.1 = 314.5
    assert(r.getAs[Double]("sum_disc_price") == 290.0)
    assert(r.getAs[Double]("sum_charge") == 314.5)
    assert(r.getAs[Double]("avg_qty") == 15.0)
    assert(r.getAs[Double]("avg_price") == 150.0)
  }

  test("revenueRollup: three levels in one pass, ALL sentinels") {
    val li = Seq(
      ("A", "F", 100.0, 0.0), ("A", "O", 200.0, 0.5), ("R", "F", 50.0, 0.0))
      .toDF("l_returnflag", "l_linestatus", "l_extendedprice", "l_discount")
    val r = Olap.revenueRollup(li)
      .orderBy("l_returnflag", "l_linestatus").collect()
      .map(x => (x.getAs[String]("l_returnflag"), x.getAs[String]("l_linestatus"),
        x.getAs[Double]("revenue"), x.getAs[Long]("n_items"))).toSeq
    assert(r == Seq(
      ("A", "ALL", 200.0, 2L), ("A", "F", 100.0, 1L), ("A", "O", 100.0, 1L),
      ("ALL", "ALL", 250.0, 3L),
      ("R", "ALL", 50.0, 1L), ("R", "F", 50.0, 1L)))
  }

  test("orderBacklog: daily counts and per-priority running totals") {
    val day = 86400000000L
    val ord = Seq(
      (1L, "1-URGENT", 0L), (2L, "1-URGENT", 0L), (3L, "1-URGENT", 2 * day),
      (4L, "2-HIGH", day))
      .toDF("o_orderkey", "o_orderpriority", "us")
      .withColumn("o_orderdate", timestamp_micros(col("us")))
    val r = Olap.orderBacklog(ord).orderBy("o_orderpriority", "day").collect()
    assert(r.map(x => (x.getAs[String]("o_orderpriority"), x.getAs[Int]("day"),
      x.getAs[Long]("n_orders"), x.getAs[Long]("cum_orders"))).toSeq ==
      Seq(("1-URGENT", 0, 2L, 2L), ("1-URGENT", 2, 1L, 3L), ("2-HIGH", 1, 1L, 1L)))
  }

  test("shippingPriority: segment + date filters, revenue order, top-k cap") {
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY"), (3L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val ord = Seq(
      (10L, 1L, "1998-01-01", "1-URGENT"),  // qualifies
      (11L, 3L, "1998-02-01", "2-HIGH"),    // qualifies
      (12L, 1L, "1998-07-01", "3-MEDIUM"),  // ordered after cutoff: out
      (13L, 2L, "1998-01-01", "1-URGENT"))  // wrong segment: out
      .toDF("o_orderkey", "o_custkey", "od", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("od")))
    val li = Seq(
      (10L, 100.0, 0.0, "1998-07-01"),  // rev 100
      (10L, 50.0, 0.5, "1998-08-01"),   // rev +25
      (11L, 400.0, 0.5, "1998-07-01"),  // rev 200 -> top
      (11L, 10.0, 0.0, "1998-01-01"),   // shipped before cutoff: out
      (12L, 999.0, 0.0, "1998-07-01"),  // parent order excluded
      (13L, 999.0, 0.0, "1998-07-01"))  // parent order excluded
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "sd")
      .withColumn("l_shipdate", to_timestamp(col("sd")))
    val r = Olap.shippingPriority(cust, ord, li, "BUILDING", "1998-06-01", k = 10)
      .collect()
    assert(r.map(_.getAs[Long]("o_orderkey")).toSeq == Seq(11L, 10L))
    assert(r(0).getAs[Double]("revenue") == 200.0)
    assert(r(1).getAs[Double]("revenue") == 125.0)
    // top-k cap holds
    val r1 = Olap.shippingPriority(cust, ord, li, "BUILDING", "1998-06-01", k = 1)
    assert(r1.count() == 1L)
  }
}
