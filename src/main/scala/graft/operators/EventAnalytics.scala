package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the raw `events` table (user_id, ts,
  * event_type, props) — the product-analytics operator family next to the
  * reference's keyed financial aggregation: conversion funnels, cohort
  * retention, and JSON-property accounting.
  *
  * Scale shapes: everything is hash aggregates and per-user equi-joins —
  * per-USER rows after the first aggregate (150 users here, millions at
  * 100 TB, either way a tiny fraction of the event count), so the joins are
  * broadcastable and nothing ever collects or re-sorts the raw event log.
  * Event times stay in exact epoch MICROSECONDS (`unix_micros`) — floats or
  * truncated seconds would merge distinct events.
  */
object EventAnalytics {

  private def withUs(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))

  /** Strict-sequence conversion funnel: per user, the earliest `stage1`
    * event, the earliest `stage2` event strictly after it, and the earliest
    * `stage3` event strictly after THAT — the standard "did the user
    * view → click → purchase in order" question, which conditional
    * aggregation alone cannot answer (stage n's window depends on stage
    * n-1's result).
    *
    * Three stage aggregates chained by per-user joins: stage n's candidate
    * events join the (user, t_{n-1}) table, filter `us > t_{n-1}`, and
    * re-minimize — each join is keyed by user_id against an
    * already-aggregated (hence small) side. Users who never reach `stage1`
    * are excluded; unreached later stages carry the -1 sentinel (not NULL,
    * for join- and comparison-friendliness downstream).
    *
    * Returns (user_id, stage1_us, stage2_us, stage3_us).
    */
  def funnel(events: DataFrame, stage1: String, stage2: String, stage3: String): DataFrame = {
    val e = withUs(events)
    val t1 = e.filter(col("event_type") === stage1)
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val t2 = e.filter(col("event_type") === stage2)
      .join(t1, "user_id").filter(col("us") > col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val t3 = e.filter(col("event_type") === stage3)
      .join(t2, "user_id").filter(col("us") > col("t2"))
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    t1.join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("t1").as("stage1_us"),
        coalesce(col("t2"), lit(-1L)).as("stage2_us"),
        coalesce(col("t3"), lit(-1L)).as("stage3_us"))
  }

  /** Cohort retention matrix: users are cohorted by their first active epoch
    * DAY; each (cohort_day, day_offset) cell counts the distinct cohort
    * members active that many days later. Two hash aggregates (first-day per
    * user, distinct activity days) + one per-user join + a final count —
    * the raw event log is touched twice, map-side combined both times.
    *
    * Returns (cohort_day, day_offset, n_users), day 0 = the cohort itself.
    */
  def retention(events: DataFrame): DataFrame = {
    // exact LONG FLOOR division to the epoch day: subtracting the
    // (always-non-negative) pmod remainder before DIV floors for negative
    // epochs too — `DIV` alone truncates toward zero, which would make
    // pre-1970 day 0 two days wide; a double `/` + floor would instead ride
    // within a few ulps of the midnight boundaries
    val e = events.select(
      col("user_id"),
      expr("CAST((unix_micros(ts) - pmod(unix_micros(ts), 86400000000))" +
        " DIV 86400000000 AS INT)").as("day"))
    val cohorts = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    e.distinct()
      .join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Per-user value-anomaly detection: flag events whose `value` deviates
    * from that user's own mean by more than `zThreshold` population standard
    * deviations — the metering/abuse-detection primitive (a user suddenly
    * emitting 100× their usual spend) that a per-corpus global threshold
    * would miss entirely.
    *
    * Exactness discipline: raw doubles summed in shuffle order are
    * run-dependent, so the moments are accumulated as DECIMAL — `value`
    * rounds to DECIMAL(18,6) per row, Σv and Σv² sum exactly (v² is
    * DECIMAL(37,12); no precision loss, overflow far out of range), and only
    * the final mean/variance division drops to double, an identical IEEE
    * op sequence in any engine. Variance clamps at 0 before the sqrt —
    * `E[v²]−mean²` can land a few ulps negative for a constant series.
    *
    * Scale shape: one hash aggregate over the event log (map-side combined)
    * produces per-USER moments — a tiny table at any corpus size — which
    * broadcast-joins back onto the log; no window sort, no second shuffle of
    * the raw events.
    *
    * Returns (event_id, user_id, value, z) for flagged events only, value
    * rounded to 6, z rounded to 6 after the threshold test on the unrounded
    * quotient.
    */
  def valueAnomalies(events: DataFrame, zThreshold: Double = 2.5): DataFrame = {
    val e = events.select(
      col("event_id"), col("user_id"),
      round(col("value"), 6).cast("decimal(18,6)").as("v"))
    val stats = e.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      sum(col("v")).as("s"),
      sum(col("v") * col("v")).as("ss"))
    val mean = col("s").cast("double") / col("n")
    val std = sqrt(greatest(
      col("ss").cast("double") / col("n") - mean * mean, lit(0.0)))
    val withZ = e.join(broadcast(stats), "user_id")
      .withColumn("zraw", (col("v").cast("double") - mean) / std)
      .filter(std > 0 && abs(col("zraw")) >= zThreshold)
    withZ.select(
      col("event_id"), col("user_id"),
      col("v").cast("double").as("value"),
      round(col("zraw"), 6).as("z"))
  }

  /** Ingest rate limiting / throttle sampling: keep only the first `perDay`
    * events per (user, epoch day), in exact arrival order — the standard
    * "cap any single producer's contribution" curation gate (a runaway bot
    * or bulk importer otherwise dominates a training corpus).
    *
    * Exactly `row_number() OVER (PARTITION BY user, day ORDER BY ts,
    * event_id) <= perDay`, but computed as ONE bounded hash aggregate
    * ([[Ranking.topKPerKey]]) — O(perDay) state per open group and no
    * partition-wide sorts, where the window form would sort every
    * partition twice just to discard everything past rank `perDay`.
    *
    * Returns (event_id, user_id, day, us, rank), rank 1-based within the
    * (user, day) group.
    */
  def rateLimit(events: DataFrame, perDay: Int = 5): DataFrame = {
    val e = events.select(
      col("event_id"), col("user_id"),
      expr("CAST((unix_micros(ts) - pmod(unix_micros(ts), 86400000000))" +
        " DIV 86400000000 AS INT)").as("day"),
      unix_micros(col("ts")).as("us"))
    Ranking.topKPerKey(e, Seq("user_id", "day"),
      Seq(col("us"), col("event_id")), perDay)
  }

  /** Trending event types: per tumbling window, the top `k` event types by
    * count (ties broken by name for determinism) — the "what moved this
    * hour" board. Two-stage: one hash aggregate to (window, type) counts
    * (map-side combined — the only pass over the raw log), then
    * [[Ranking.topKPerKey]] takes the per-window top k with O(k) state
    * instead of a window sort. Descending count is encoded as its negation
    * in the ranking struct (the bounded heap orders ascending).
    *
    * Returns (window_start_s, event_type, n_events, rank).
    */
  def trendingTypes(events: DataFrame, windowDur: String = "1 hour", k: Int = 3): DataFrame = {
    val counts = events
      .select(window(col("ts"), windowDur).as("w"), col("event_type"))
      .groupBy(col("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("window_start_s"),
        col("event_type"), col("n_events"))
    Ranking.topKPerKey(counts, Seq("window_start_s"),
      Seq(-col("n_events"), col("event_type")), k)
  }

  /** Behavioral transition matrix: for each consecutive pair of events in a
    * user's timeline, count the (from_type → to_type) transition and
    * row-normalize into the first-order Markov matrix — the
    * next-action-model / anomalous-flow signal.
    *
    * Adjacency needs per-user event ORDER, so this is the one event
    * operator that legitimately uses a window (`lead` over user_id) — the
    * sort is per-user, after a shuffle on user_id, and each user's slice is
    * tiny relative to the log. The transition counts then hash-aggregate
    * map-side; probabilities join the per-from totals back via broadcast
    * (rows = |type|², a constant).
    *
    * Returns (from_type, to_type, n, n_from, p) with p = n/n_from at 6dp.
    */
  def typeTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = pairs
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        round(col("n").cast("double") / col("n_from"), 6).as("p"))
  }

  /** Fixed-width value histogram per event type: integer-cent bucketing
    * (`value` → cents → bucket = cents DIV width, capped at the last
    * bucket) — the distribution profile a metering pipeline keeps per
    * metric. All arithmetic after the one `round(value*100)` is integer,
    * so the histogram is bit-identical in any engine; the whole thing is a
    * map-side projection plus one hash aggregate, no bounds pre-scan.
    *
    * Returns (event_type, bucket, bucket_lo, n_events); `bucket_lo` is the
    * bucket's inclusive lower bound in value units.
    */
  def valueHistogram(
      events: DataFrame, bucketWidth: Double = 50.0, nBuckets: Int = 10): DataFrame = {
    val widthCents = math.round(bucketWidth * 100)
    val rawBucket =
      expr(s"CAST(CAST(round(value * 100) AS BIGINT) DIV $widthCents AS INT)")
    events
      .select(col("event_type"),
        least(rawBucket, lit(nBuckets - 1)).as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"), col("bucket"),
        round(col("bucket") * lit(bucketWidth), 6).as("bucket_lo"),
        col("n_events"))
  }

  /** Activity heatmap: event counts per (day-of-week, hour-of-day) — the
    * weekly-rhythm matrix behind every ops dashboard. Pure integer epoch
    * math (1970-01-01 was a Thursday = day 3 of a Monday-zero week, hence
    * the +3 rotation), map-side projection + one hash aggregate into at
    * most 7×24 rows.
    *
    * Returns (dow, hour, n_events), dow 0 = Monday.
    */
  def activityHeatmap(events: DataFrame): DataFrame =
    events
      .select(
        expr("CAST(pmod(unix_micros(ts) DIV 86400000000 + 3, 7) AS INT)").as("dow"),
        expr("CAST(pmod(unix_micros(ts) DIV 3600000000, 24) AS INT)").as("hour"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"))

  /** Seasonality correlation: per event type, the Pearson correlation
    * between the event's value and its hour-of-day — "does this metric
    * follow the daily cycle". Every accumulated term is INTEGER (value →
    * cents, hour ∈ 0..23, so Σx, Σy, Σxy, Σx², Σy² are exact longs far past
    * this corpus's size), the n·Σ−Σ·Σ cross terms widen to DECIMAL(38,0)
    * (n·Σx² alone would overflow int64 around 10⁷ rows per group), and only
    * the final Pearson quotient drops to double — one identical IEEE
    * expression in any engine, with the zero-variance guard emitting 0
    * rather than NaN.
    *
    * One map-side projection + one hash aggregate into |event_type| rows.
    *
    * Returns (event_type, n_events, r) with r rounded to 6dp.
    */
  def valueHourCorrelation(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("x"),
      expr("CAST(pmod(unix_micros(ts) DIV 3600000000, 24) AS BIGINT)").as("y"))
    val m = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    def d38(c: Column) = c.cast("decimal(38,0)")
    val num = (d38(col("n")) * d38(col("sxy")) - d38(col("sx")) * d38(col("sy")))
      .cast("double")
    val den =
      sqrt((d38(col("n")) * d38(col("sxx")) - d38(col("sx")) * d38(col("sx")))
        .cast("double")) *
      sqrt((d38(col("n")) * d38(col("syy")) - d38(col("sy")) * d38(col("sy")))
        .cast("double"))
    m.select(col("event_type"), col("n").as("n_events"),
      round(when(den > 0, num / den).otherwise(lit(0.0)), 6).as("r"))
  }

  /** JSON-property accounting: extract `$.k` from the props JSON per event
    * (the reference's JSONPath heritage applied to the raw stream) and
    * aggregate exactly per event type — long arithmetic only, one hash
    * aggregate. Events whose props lack `$.k` are counted in `n_missing`
    * and excluded from the sums.
    *
    * Returns (event_type, n_events, n_missing, k_sum, k_min, k_max).
    */
  def propsAccounting(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"),
        coalesce(sum(col("k")), lit(0L)).as("k_sum"),
        coalesce(min(col("k")), lit(-1L)).as("k_min"),
        coalesce(max(col("k")), lit(-1L)).as("k_max"))

  /** Market-basket co-occurrence over event types: for every unordered type
    * pair, how many (user, day) baskets contain BOTH, with each type's own
    * basket count and the lift n_both·N/(n_a·n_b) — the association-mining
    * primitive ("users who view also purchase, same day?").
    *
    * Shape: the basket inventory is one distinct aggregate; the pair
    * expansion is MAP-SIDE — each basket's sorted type set (≤ |types|,
    * a handful) explodes into its C(m,2) ordered pairs via nested
    * array transforms, never a self-join of the event log — followed by one
    * hash aggregate keyed by pair. Per-type basket counts are a ≤|types|-row
    * aggregate broadcast back; the basket total is a bounded driver total
    * (one long, the collocation-normalizer move). All counts are exact
    * longs; lift is one final double quotient rounded to 6 dp.
    *
    * Returns (t1, t2, n_both, n_t1, n_t2, lift), t1 < t2.
    */
  def typeCooccurrence(events: DataFrame): DataFrame = {
    val baskets = events
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"), col("event_type"))
      .distinct()
    val nBaskets = baskets.select("user_id", "day").distinct().count()
    val perType = baskets.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val sets = baskets
      .groupBy("user_id", "day")
      .agg(sort_array(collect_set(col("event_type"))).as("ts_"))
    val pairCol = flatten(transform(col("ts_"), (x, i) =>
      transform(slice(col("ts_"), i + lit(2), size(col("ts_"))),
        y => struct(x.as("t1"), y.as("t2")))))
    sets
      .select(explode(pairCol).as("p"))
      .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(perType.select(
        col("event_type").as("t1"), col("n_t").as("n_t1"))), Seq("t1"))
      .join(broadcast(perType.select(
        col("event_type").as("t2"), col("n_t").as("n_t2"))), Seq("t2"))
      .select(col("t1"), col("t2"), col("n_both"), col("n_t1"), col("n_t2"),
        round(col("n_both").cast("double") * nBaskets /
          (col("n_t1") * col("n_t2")), 6).as("lift"))
  }

  /** SCD Type-2 interval derivation from the event log — the lakehouse
    * dimension-history move: treat each user's event_type as a
    * slowly-changing attribute and emit one VALIDITY INTERVAL per
    * consecutive run of the same value, [valid_from, valid_to) with the
    * open current interval marked — what a MERGE-into-dimension job
    * materializes from a CDC changelog.
    *
    * Shape: both window passes (lag to find change points, lead over the
    * surviving change rows to close intervals) share the user_id partition
    * key, so the plan carries ONE hash exchange; per-user partitions sort
    * locally by (ts, event_id) — the total order that makes duplicate
    * timestamps deterministic. No joins; state per user is its event list,
    * spillable.
    *
    * Returns (user_id, event_type, valid_from_us, valid_to_us, is_current)
    * with valid_to_us = −1 on the open interval.
    */
  def scd2TypeIntervals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val changes = events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("vt", lead(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("event_type"),
        col("ts_us").as("valid_from_us"),
        coalesce(col("vt"), lit(-1L)).as("valid_to_us"),
        col("vt").isNull.as("is_current"))
  }

  /** Per-(user, week) activity bitmap — the roaring-bitmap-lite presence
    * accounting: one int64 whose bit d is set iff the user was active on
    * weekday d, built by `bit_or(1 << dow)`. The mask is the mergeable
    * artifact (OR-combine across shards/partials — the map-side combine IS
    * the merge), `bit_count` reads distinct active days off it without a
    * distinct aggregate, and downstream rollups (monthly, per-cohort) OR
    * masks instead of re-touching the event log. Integer epoch math only —
    * DuckDB computes the identical masks.
    *
    * Returns (user_id, week, mask, n_days_active, n_events).
    */
  def weeklyActivityBitmap(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000 DIV 7").as("week"),
        expr("CAST(pmod(unix_micros(ts) DIV 86400000000, 7) AS INT)").as("dow"))
      .groupBy("user_id", "week")
      .agg(
        bit_or(expr("shiftleft(CAST(1 AS BIGINT), dow)")).as("mask"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("week"), col("mask"),
        bit_count(col("mask")).as("n_days_active"), col("n_events"))

  /** CDC changelog compaction — the MERGE/upsert move that turns an
    * append-only change log into the current snapshot: every event upserts
    * its user's state, events of `tombstoneType` are deletes, and last
    * writer wins under the total order (ts, event_id) (the same
    * duplicate-timestamp tiebreak as [[scd2TypeIntervals]] — SCD2 keeps the
    * history this operator discards). A key whose LATEST change is a
    * tombstone is absent from the snapshot; a tombstone followed by a later
    * upsert resurrects the key (specs pin both).
    *
    * Shape: ONE hash aggregate — `max_by(payload, (ts, event_id))` has
    * map-side partials (each partition keeps one candidate row per key), so
    * the shuffle carries ≤ keys × partitions rows of fixed-width state, not
    * the change log; no window sort, no join. That is the compaction a
    * lakehouse MERGE job runs over a 100 TB changelog: the per-key state is
    * one row regardless of how hot the key is, and the tombstone filter
    * happens AFTER last-writer-wins (filtering tombstones first would
    * wrongly resurrect the previous upsert).
    *
    * Payload doubles pass through untouched (no arithmetic → engine-exact).
    *
    * Returns (user_id, n_ops, last_ts_us, last_type, last_value) for keys
    * live in the snapshot; n_ops counts ALL change records for the key,
    * tombstones included.
    */
  def cdcCompact(events: DataFrame, tombstoneType: String = "error"): DataFrame =
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_ops"),
        max_by(
          struct(col("ts_us"), col("event_type"), col("value")),
          struct(col("ts_us"), col("event_id"))).as("last"))
      .filter(col("last.event_type") =!= lit(tombstoneType))
      .select(col("user_id"), col("n_ops"),
        col("last.ts_us").as("last_ts_us"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"))
}
