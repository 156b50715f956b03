package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classic OLAP reporting over the TPC-H-shaped tables — the warehouse
  * queries (pricing rollup, revenue top-k) a lakehouse serves next to the
  * reference's interactive key/range lookups. Written with the same
  * engine-portability discipline as everything else: per-row money
  * arithmetic happens in double (identical IEEE sequence in any engine),
  * rounds to 6dp, and accumulates as DECIMAL so shuffle order can't move a
  * ULP.
  */
object Olap {

  /** TPC-H Q1-shaped pricing summary: per (returnflag, linestatus) over
    * lineitems shipped up to `cutoff` (inclusive, 'YYYY-MM-DD'), the
    * quantity/price/discounted/charged sums, averages, and row count.
    *
    * One predicate-pushed scan + one hash aggregate (map-side combined) —
    * the canonical "is the engine's scan-agg path healthy" query; the group
    * count is tiny (|flags|×|statuses|) at any scale.
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) =
      round(c, 6).cast("decimal(18,6)")
    val dp = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    // cast the LITERAL to the column's own type (not the column to the
    // literal's): a cast wrapped around l_shipdate would block predicate
    // pushdown, and at 100 TB a post-scan cutoff reads the whole fact table
    val cut = lit(cutoff).cast(lineitem.schema("l_shipdate").dataType)
    val rows = lineitem
      .filter(col("l_shipdate") <= cut)
      .select(col("l_returnflag"), col("l_linestatus"),
        dec(col("l_quantity")).as("qty"),
        dec(col("l_extendedprice")).as("price"),
        dec(dp).as("disc_price"),
        dec(dp * (lit(1.0) + col("l_tax"))).as("charge"))
    rows
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("qty")).as("sq"), sum(col("price")).as("sp"),
        sum(col("disc_price")).as("sd"), sum(col("charge")).as("sc"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sq").cast("double").as("sum_qty"),
        col("sp").cast("double").as("sum_base_price"),
        col("sd").cast("double").as("sum_disc_price"),
        col("sc").cast("double").as("sum_charge"),
        round(col("sq").cast("double") / col("count_order"), 6).as("avg_qty"),
        round(col("sp").cast("double") / col("count_order"), 6).as("avg_price"),
        col("count_order"))
  }

  /** Multi-level revenue rollup: discounted revenue at (returnflag,
    * linestatus), per-flag subtotal, and grand total in ONE pass —
    * Spark's `rollup` plans a single Expand + hash aggregate, so the
    * three levels cost one scan instead of three unioned queries. Subtotal
    * rows surface with the 'ALL' sentinel (not NULL) so the result is
    * join- and sort-friendly downstream.
    *
    * Returns (l_returnflag, l_linestatus, revenue, n_items) — revenue is
    * the DECIMAL-accumulated discounted price, cast back to double.
    */
  def revenueRollup(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("dp"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(col("dp")).as("rev"), count(lit(1)).as("n_items"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("rev").cast("double").as("revenue"),
        col("n_items"))

  /** Order-intake running totals: per priority, daily order counts and the
    * cumulative count to date — the backlog board. The running total is the
    * textbook case for the TWO-PHASE shape: aggregate the fact table down
    * to (priority × day) first (one map-side-combined hash aggregate over
    * the only full-size input), THEN window over the aggregate — the
    * cumulative sort touches |priorities| × |days| rows, a constant next to
    * the fact table, where a direct row-level window would sort the world.
    *
    * Returns (o_orderpriority, day, n_orders, cum_orders).
    */
  def orderBacklog(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = expr(
      "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000 AS INT)")
    val daily = orders
      .select(col("o_orderpriority"), day.as("day"))
      .groupBy("o_orderpriority", "day")
      .agg(count(lit(1)).as("n_orders"))
    val w = Window.partitionBy("o_orderpriority").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_orders", sum(col("n_orders")).over(w))
  }

  /** TPC-H Q3-shaped shipping priority: the `k` highest-revenue orders from
    * customers in `segment`, ordered before `cutoff`, with at least one
    * lineitem shipped after it.
    *
    * Shape: the customer filter broadcasts onto orders; lineitem (the big
    * side) is filtered BEFORE its one shuffle join; revenue is one hash
    * aggregate keyed by order; and the global top-k is `orderBy + limit`,
    * which Spark plans as TakeOrderedAndProject — a per-partition bounded
    * heap merged at the driver, never a full sort. The order is totalized
    * by (revenue desc, orderdate, orderkey).
    *
    * Returns (o_orderkey, revenue, o_orderdate_s, o_orderpriority).
    */
  def shippingPriority(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      segment: String, cutoff: String, k: Int = 10): DataFrame = {
    val ordCut = lit(cutoff).cast(orders.schema("o_orderdate").dataType)
    val liCut = lit(cutoff).cast(lineitem.schema("l_shipdate").dataType)
    val cust = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val ord = orders
      .filter(col("o_orderdate") < ordCut)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_orderpriority"))
    val li = lineitem
      .filter(col("l_shipdate") > liCut)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("dp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate_us"), col("o_orderpriority"))
      .agg(sum(col("dp")).as("rev"))
      .select(col("o_orderkey"), col("rev").cast("double").as("revenue"),
        (col("o_orderdate_us") / 1000000L).cast("long").as("o_orderdate_s"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderdate_s"), col("o_orderkey"))
      .limit(k)
  }

  /** TPC-H Q5-shaped local supplier volume: per nation in `region`, the
    * discounted revenue of lineitems where the supplier and the ordering
    * customer sit in the SAME nation, over orders placed in
    * [`from`, `until`).
    *
    * Shape — the canonical star-join plan: every dimension chain
    * (region→nation, supplier+nation, customer) is tiny relative to the
    * facts and broadcasts, so the ONLY shuffled join is
    * lineitem ⋈ orders on orderkey — and orders arrives at it already cut
    * by the pushed date range and the broadcast customer side. The
    * same-nation constraint is an equi-condition (c_nationkey =
    * s_nationkey) applied where both keys are in scope, never a
    * post-cartesian filter. Output is ≤ |nations| rows.
    *
    * Returns (n_name, revenue) — DECIMAL-accumulated, cast to double.
    */
  def localSupplierVolume(
      region: DataFrame, nation: DataFrame, supplier: DataFrame,
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      regionName: String, from: String, until: String): DataFrame = {
    val lo = lit(from).cast(orders.schema("o_orderdate").dataType)
    val hi = lit(until).cast(orders.schema("o_orderdate").dataType)
    // region ⋈ nation collapses to the in-region nation list (≤ |nations|)
    val nat = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = supplier
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = orders
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("dp"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("dp")).as("rev"))
      .select(col("n_name"), col("rev").cast("double").as("revenue"))
  }

  /** TPC-H Q18-shaped large-volume orders: every order whose total lineitem
    * quantity exceeds `minQty`, with its customer and the quantity total.
    *
    * Shape — aggregate-then-join: lineitem reduces to (orderkey, sum_qty)
    * in one map-side-combined hash aggregate BEFORE any join, the HAVING
    * filter cuts that aggregate to the rare heavy orders, and only those
    * few rows join back to orders/customer. The fact table is never
    * carried through a join; at 100 TB the post-having side is small
    * enough to broadcast onto orders.
    *
    * Returns (c_custkey, c_name, o_orderkey, o_orderdate_s, o_totalprice,
    * sum_qty).
    */
  def largeOrderCustomers(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      minQty: Double): DataFrame = {
    val heavy = lineitem
      .select(col("l_orderkey"),
        round(col("l_quantity"), 6).cast("decimal(18,6)").as("q"))
      .groupBy("l_orderkey")
      .agg(sum(col("q")).as("sq"))
      .filter(col("sq") > lit(minQty).cast("decimal(18,6)"))
    orders
      .join(heavy, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp"))
          .divide(lit(1000000L)).cast("long").as("o_orderdate_s"),
        round(col("o_totalprice"), 6).as("o_totalprice"),
        col("sq").cast("double").as("sum_qty"))
  }

  /** TPC-H Q10-shaped returned-item report: the `k` customers who generated
    * the most revenue on RETURNED lineitems (returnflag `flag`) for orders
    * placed in [`from`, `until`), with their nation.
    *
    * Shape: both fact filters (returnflag, date range) are pushed into the
    * scans; the one shuffled join is lineitem ⋈ orders; customer arrives
    * via its key join after the per-customer aggregate (few rows by then),
    * nation broadcasts, and the global top-k plans as
    * TakeOrderedAndProject (bounded per-partition heaps), never a full
    * sort. Totalized by (revenue desc, c_custkey).
    *
    * Returns (c_custkey, c_name, revenue, c_acctbal, n_name).
    */
  /** Scale-safe `NOT IN (subquery)` — the null-aware anti-join rewrite.
    *
    * Spark plans a `NOT IN` over NULLABLE columns as a null-aware anti join,
    * whose only physical strategy is BroadcastNestedLoopJoin: every left row
    * streams against the ENTIRE right side — no hash, no partitioning, the
    * classic 100×-scale trap (and parquet columns are nullable by default,
    * so the trap fires on ordinary warehouse tables). SQL `NOT IN` three-
    * valued semantics force that plan in general: if the subquery yields ANY
    * null the predicate is never true, and a null left key qualifies only
    * when the subquery is EMPTY. This rewrite evaluates those two null legs
    * once via a bounded 1-row aggregate (a driver-side artifact, like the
    * trained-index scalars) and plans the remaining work as a plain HASH
    * anti join on non-null keys — equi-join, partitionable, broadcastable.
    * Differential-tested against the literal `NOT IN` (all three legs) in
    * OlapSpec; the BNL-vs-hash plan contrast is pinned there too.
    */
  def notInAnti(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val stats = right
      .agg(count(lit(1)).as("n"),
        sum(when(col(rightKey).isNull, lit(1L)).otherwise(lit(0L))).as("nulls"))
      .head()
    if (stats.getLong(0) == 0L) left // NOT IN (empty) is TRUE for every row
    else if (stats.getLong(1) > 0L) left.limit(0) // any null → never TRUE
    else left.filter(col(leftKey).isNotNull)
      .join(right.filter(col(rightKey).isNotNull)
        .select(col(rightKey).as(leftKey)), Seq(leftKey), "left_anti")
  }

  def returnedItemReport(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      nation: DataFrame, flag: String, from: String, until: String,
      k: Int = 20): DataFrame = {
    val lo = lit(from).cast(orders.schema("o_orderdate").dataType)
    val hi = lit(until).cast(orders.schema("o_orderdate").dataType)
    val ord = orders
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val perCust = lineitem
      .filter(col("l_returnflag") === flag)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(18,6)").as("dp"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("dp")).as("rev"))
    perCust
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        col("rev").cast("double").as("revenue"),
        round(col("c_acctbal"), 6).as("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }
}
