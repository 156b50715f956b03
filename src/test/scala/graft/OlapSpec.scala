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

  test("notInAnti == literal NOT IN on all three null legs, and dodges the BNL plan") {
    // nullable fixture: the left has a null key, the right variants cover
    // (plain, contains-null, empty) — the three SQL NOT IN legs
    val left = Seq((Some(1L), "a"), (Some(2L), "b"), (Some(3L), "c"), (None, "d"))
      .toDF("k", "v")
    val rPlain = Seq(Some(2L), Some(9L)).toDF("rk")
    val rNull = Seq(Some(2L), None).toDF("rk")
    val rEmpty = rPlain.filter(lit(false))
    left.createOrReplaceTempView("nin_left")

    def literal(right: org.apache.spark.sql.DataFrame): Set[(Option[Long], String)] = {
      right.createOrReplaceTempView("nin_right")
      spark.sql("SELECT k, v FROM nin_left WHERE k NOT IN (SELECT rk FROM nin_right)")
        .as[(Option[Long], String)].collect().toSet
    }
    def rewrite(right: org.apache.spark.sql.DataFrame): Set[(Option[Long], String)] =
      Olap.notInAnti(left, "k", right, "rk")
        .as[(Option[Long], String)].collect().toSet

    assert(rewrite(rPlain) == literal(rPlain) &&
      rewrite(rPlain) == Set((Some(1L), "a"), (Some(3L), "c")))
    assert(rewrite(rNull) == literal(rNull) && rewrite(rNull).isEmpty)
    assert(rewrite(rEmpty) == literal(rEmpty) && rewrite(rEmpty).size == 4)

    // the trap, pinned in both of its forms. Spark's single-column
    // null-aware rewrite plans the literal NOT IN as a FORCED broadcast hash
    // join — it ignores autoBroadcastJoinThreshold because broadcast is the
    // only hash strategy for null-aware anti semantics, so a large subquery
    // side gets shipped to every executor (or OOMs the driver) at scale;
    // with that rewrite unavailable (its guard conf off — or any multi-
    // column/correlated variant) the plan degrades to the nested loop.
    rPlain.createOrReplaceTempView("nin_right")
    def naivePlan = spark.sql(
      "SELECT k, v FROM nin_left WHERE k NOT IN (SELECT rk FROM nin_right)")
      .queryExecution.executedPlan.toString
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val nullAware = "spark.sql.optimizeNullAwareAntiJoin"
    spark.conf.set(threshold, "-1")
    try {
      val forced = naivePlan
      assert(forced.contains("BroadcastExchange"),
        s"literal NOT IN should force a broadcast even at threshold -1:\n$forced")
      spark.conf.set(nullAware, "false")
      try {
        val bnl = naivePlan
        assert(bnl.contains("BroadcastNestedLoopJoin"),
          s"without the single-column rewrite, NOT IN is a nested loop:\n$bnl")
      } finally spark.conf.set(nullAware, "true")
      // the rewrite under the same no-broadcast constraint: a SHUFFLED hash
      // anti join — no forced broadcast, no nested loop, partitionable
      val fixed = Olap.notInAnti(left, "k", rPlain, "rk")
        .queryExecution.executedPlan.toString
      assert(!fixed.contains("BroadcastNestedLoopJoin") &&
        !fixed.contains("CartesianProduct") &&
        !fixed.contains("BroadcastExchange"),
        s"rewrite must shuffle, not broadcast or loop:\n$fixed")
      assert(fixed.contains("LeftAnti"),
        s"rewrite should plan an ANTI join:\n$fixed")
    } finally spark.conf.unset(threshold)
  }
}
