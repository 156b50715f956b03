package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key rolling-history feature engineering — the classic training-data
  * "featurize an entity's event history" shape (lag features, bounded
  * trailing-window aggregates, lifetime accumulators) that every tabular
  * ML pipeline derives before model training.
  *
  * Scale shape: ALL features come from ONE window specification —
  * a single hash exchange on the entity key plus one in-partition sort
  * feeds every lag/rolling/cumulative column (Catalyst plans the whole set
  * as one Window operator; no per-feature shuffles). Trailing frames are
  * ROW-bounded, so per-row state during the sweep is O(frame), and the
  * cumulative sum is a running accumulator — nothing rescans the partition.
  * At 100 TB this is exactly the plan you want: shuffle once by key, sort
  * once by time, stream every feature out of the same sorted pass. Keys are
  * entities (customers), so per-partition data is bounded by the busiest
  * entity, not the table; a pathological hot entity would be the one reason
  * to salt, and these frames (lag/trailing-k/cumulative) all decompose over
  * a salted two-level sweep if that day comes.
  *
  * Money stays decimal(18,6) through every fold (engine-portable, order-
  * independent) and is emitted as double, the repo's standard move.
  */
object Features {

  /** Order-history features per customer, ordered by (order time, orderkey):
    * sequence index, previous-order price, seconds since previous order, the
    * trailing-`histLen`-order spend sum/count (current row excluded — these
    * are "as of just before this order" features, no label leakage), and
    * cumulative lifetime spend including this order.
    *
    * Returns (o_orderkey, o_custkey, order_s, order_idx, prev_price, gap_s,
    * hist_sum, hist_cnt, cum_spend).
    */
  def rollingOrderFeatures(orders: DataFrame, histLen: Int = 3): DataFrame = {
    val price: Column = round(col("o_totalprice"), 6).cast("decimal(18,6)")
    val base = orders.select(
      col("o_orderkey"), col("o_custkey"),
      (unix_micros(col("o_orderdate").cast("timestamp")) / lit(1000000L))
        .cast("long").as("order_s"),
      price.as("p"))
    val w = Window.partitionBy("o_custkey").orderBy(col("order_s"), col("o_orderkey"))
    val trailing = w.rowsBetween(-histLen, -1)
    val lifetime = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.select(
      col("o_orderkey"), col("o_custkey"), col("order_s"),
      row_number().over(w).cast("long").as("order_idx"),
      lag(col("p"), 1).over(w).cast("double").as("prev_price"),
      (col("order_s") - lag(col("order_s"), 1).over(w)).as("gap_s"),
      sum(col("p")).over(trailing).cast("double").as("hist_sum"),
      count(col("p")).over(trailing).as("hist_cnt"),
      sum(col("p")).over(lifetime).cast("double").as("cum_spend"))
  }

  /** Resample a sparse per-key time series onto a regular grid with
    * forward-fill — the serving-table / feature-store shape ("what was the
    * symbol's last known hourly volume at hour t, for EVERY t"), where the
    * raw aggregate only has rows for hours with activity.
    *
    * Each key's grid runs from its own first observation to the GLOBAL last
    * grid point (once an entity exists it has a row every step), so the
    * first row per key is never null and the fill is total. The global max
    * is one bounded scalar aggregate (a driver artifact, the repo's
    * trained-model move).
    *
    * Plan shape (r15, guide §2.3/§2.4 — shuffle the sparse proxy, explode
    * after): the islands formulation. ONE window over the OBSERVATIONS
    * (lead(time) per key) finds each observation's reign [t, next_t), and a
    * map-side `sequence` explode emits that reign's grid points carrying
    * the observation's value — fill needs no grid⋈observations join and no
    * grid-sized shuffle at all. The only exchange after the input
    * aggregate moves the sparse observations once (keys × observations,
    * not keys × steps); everything grid-sized is generated map-side
    * AFTER the shuffle. (The previous shape — grid explode off per-key
    * minima, (key,time) equi-join against the observations, then a second
    * grid-sized window exchange for last(ignoreNulls) — shuffled the dense
    * grid twice to attach the same sparse values.)
    *
    * Contract (unchanged, now load-bearing for the plan): observation times
    * lie ON the step grid (t ≡ min(t) mod step per key — true for any
    * bucketed/windowed aggregate input) and are unique per (key, time).
    * Misaligned rows were silently invisible to the old fill; here they
    * would seed their own grid offsets, so the precondition is enforced AT
    * RUNTIME (r16): a per-row assert_true (alignment + per-key uniqueness)
    * rides the same window operator and fails the job with a named
    * key/time/step message instead of emitting shifted grids. Values may be
    * NULL only if callers accept the island semantics: a null-valued
    * observation propagates null (is_gap=false) over its whole reign, where
    * the old join+last(ignoreNulls) form forward-filled past it.
    *
    * Returns (keyCol, timeCol, <valueCol> filled, is_gap).
    */
  def resampleFill(
      series: DataFrame, keyCol: String, timeCol: String, valueCol: String,
      step: Long): DataFrame = {
    // the scalar aggregate returns one row with a NULL max on empty input —
    // read it nullably and return the declared (empty) schema rather than NPE
    val gmaxRow = series.agg(max(col(timeCol))).head()
    if (gmaxRow.isNullAt(0)) {
      val spark = series.sparkSession
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          series.schema(keyCol),
          series.schema(timeCol),
          series.schema(valueCol).copy(name = valueCol),
          org.apache.spark.sql.types.StructField(
            "is_gap", org.apache.spark.sql.types.BooleanType, nullable = true))))
    }
    val gmax = gmaxRow.getLong(0)
    // each observation reigns over [t, next observation) — or to the global
    // grid end for a key's last observation; its reign's grid points are a
    // map-side sequence explode, value carried along, gap = every generated
    // point except the observation's own
    val w = Window.partitionBy(keyCol).orderBy(timeCol)
    // LOUD precondition guard (r15 verdict #8): out-of-contract inputs must
    // fail with a named cause, not emit shifted grids. Both checks ride the
    // SAME window operator (no extra exchange or sort): alignment = every
    // observation sits on its key's step grid (t ≡ first(t) mod step);
    // uniqueness = strictly increasing times per key (a duplicate (key,time)
    // makes lead(t) == t). assert_true returns NULL when the row passes, so
    // coalescing it into `_end` keeps the check alive under column pruning.
    val nextT = lead(col(timeCol), 1).over(w)
    val contractOk =
      ((col(timeCol) - first(col(timeCol)).over(w)) % lit(step) === 0) &&
        (nextT.isNull || nextT > col(timeCol))
    val guard = assert_true(contractOk, concat(
      lit(s"resampleFill contract violation on key="), col(keyCol).cast("string"),
      lit(s" t="), col(timeCol).cast("string"),
      lit(s": observation times must be unique per key and step-aligned (step=$step)")))
    series
      .select(col(keyCol), col(timeCol), col(valueCol).as("_v"))
      .withColumn("_end",
        coalesce(guard.cast("long"), nextT - lit(step), lit(gmax)))
      .select(col(keyCol), col(timeCol).as("_t"), col("_v"),
        explode(sequence(col(timeCol), col("_end"), lit(step))).as(timeCol))
      .select(col(keyCol), col(timeCol), col("_v").as(valueCol),
        (col(timeCol) =!= col("_t")).as("is_gap"))
  }
}
