package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"), lit("""{"k": 1}""").as("props"))

  test("funnel: stages must occur strictly in sequence") {
    val df = ev(
      // user 1 completes the funnel in order
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // user 2: click BEFORE the first view never counts; purchase without a
      // qualifying click never counts
      (2L, 500L, "click"), (2L, 600L, "view"), (2L, 700L, "purchase"),
      // user 3: no view at all -> excluded entirely
      (3L, 100L, "click"), (3L, 200L, "purchase"))
    val r = EventAnalytics.funnel(df, "view", "click", "purchase")
      .orderBy("user_id").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("stage1_us") == 100L)
    assert(r(0).getAs[Long]("stage2_us") == 200L)
    assert(r(0).getAs[Long]("stage3_us") == 300L)
    assert(r(1).getAs[Long]("stage1_us") == 600L)
    assert(r(1).getAs[Long]("stage2_us") == -1L)
    assert(r(1).getAs[Long]("stage3_us") == -1L)
  }

  test("funnel: a same-instant next stage does not count (strictly after)") {
    val df = ev((1L, 100L, "view"), (1L, 100L, "click"), (1L, 101L, "click"))
    val r = EventAnalytics.funnel(df, "view", "click", "purchase").head()
    assert(r.getAs[Long]("stage2_us") == 101L)
  }

  test("retention: cohort by first day, offsets count distinct users") {
    val day = 86400000000L
    val df = ev(
      (1L, 0L, "view"), (1L, day + 1, "view"), (1L, day + 2, "view"), // d0 + d1
      (2L, 1L, "view"), (2L, 2 * day, "view"),                       // d0 + d2
      (3L, day, "view"))                                             // cohort d1
    val r = EventAnalytics.retention(df)
      .orderBy("cohort_day", "day_offset")
      .as[(Int, Int, Long)].collect().toSeq
    assert(r == Seq((0, 0, 2L), (0, 1, 1L), (0, 2, 1L), (1, 0, 1L)))
  }

  test("valueAnomalies: flags only the per-user outlier, exact z") {
    // user 1: nine 10s and one 100 -> mean 19, var 729, std 27,
    // z(100) = 3.0 (>= 2.5, flagged), z(10) = -1/3 (not flagged);
    // user 2: constant series -> std 0 -> clamp path, never flagged
    val rows = (1L to 9L).map(i => (i, 1L, 10.0)) :+ (10L, 1L, 100.0)
    val df = (rows ++ Seq((11L, 2L, 5.0), (12L, 2L, 5.0)))
      .toDF("event_id", "user_id", "value")
    val r = EventAnalytics.valueAnomalies(df, zThreshold = 2.5).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("event_id") == 10L)
    assert(r(0).getAs[Double]("value") == 100.0)
    assert(r(0).getAs[Double]("z") == 3.0)
  }

  test("valueAnomalies: threshold is inclusive and two-sided") {
    // symmetric pair around the mean: both tails flag at |z| = threshold
    val df = Seq((1L, 1L, 0.0), (2L, 1L, 10.0), (3L, 1L, 5.0), (4L, 1L, 5.0))
      .toDF("event_id", "user_id", "value")
    // mean 5, var = (25+25)/4 = 12.5, std ~3.5355; z(0) ~= -1.414
    val flagged = EventAnalytics.valueAnomalies(df, zThreshold = 1.414)
      .collect().map(_.getAs[Long]("event_id")).sorted
    assert(flagged.toSeq == Seq(1L, 2L))
  }

  test("rateLimit: caps each (user, day) at k events in arrival order") {
    val day = 86400000000L
    // user 1: seven same-day events (ids shuffled vs time), two next-day
    val rows = Seq(
      (107L, 1L, 700L), (101L, 1L, 100L), (105L, 1L, 500L), (102L, 1L, 200L),
      (104L, 1L, 400L), (106L, 1L, 600L), (103L, 1L, 300L),
      (201L, 1L, day + 10), (202L, 1L, day + 20),
      (301L, 2L, 50L))
    val df = rows.toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"))
    val r = EventAnalytics.rateLimit(df, perDay = 5)
      .orderBy("user_id", "day", "rank").collect()
    assert(r.length == 8) // 5 + 2 + 1
    val day0 = r.filter(x => x.getAs[Long]("user_id") == 1L && x.getAs[Int]("day") == 0)
    assert(day0.map(_.getAs[Long]("event_id")).toSeq ==
      Seq(101L, 102L, 103L, 104L, 105L))
    assert(day0.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("rateLimit: ties on ts break by event_id, deterministically") {
    val df = Seq((9L, 1L, 100L), (3L, 1L, 100L), (5L, 1L, 100L))
      .toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"))
    val kept = EventAnalytics.rateLimit(df, perDay = 2)
      .orderBy("rank").collect().map(_.getAs[Long]("event_id")).toSeq
    assert(kept == Seq(3L, 5L))
  }

  test("trendingTypes: top-k by count desc, name-asc ties, per window") {
    // h0: a=3, b=2, c=2, d=1 -> top3 = a, b, c (b before c on the tie)
    val rows = Seq(
      ("a", 0L), ("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L), ("d", 7L),
      ("z", 3600L * 1000000L)) // h1: z alone
    val df = rows.zipWithIndex.map { case ((t, us), i) => (i.toLong, 1L, t, us) }
      .toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val r = EventAnalytics.trendingTypes(df, "1 hour", k = 3)
      .orderBy("window_start_s", "rank").collect()
    assert(r.map(x => (x.getAs[Long]("window_start_s"), x.getAs[String]("event_type"),
      x.getAs[Long]("n_events"), x.getAs[Int]("rank"))).toSeq ==
      Seq((0L, "a", 3L, 1), (0L, "b", 2L, 2), (0L, "c", 2L, 3),
        (3600L, "z", 1L, 1)))
  }

  test("typeTransitions: counts follow per-user order, rows normalize") {
    // user 1: a -> b -> a ; user 2: a -> b   => a->b: 2, b->a: 1
    val rows = Seq(
      (1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "a", 30L),
      (4L, 2L, "a", 10L), (5L, 2L, "b", 20L))
    val df = rows.toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val r = EventAnalytics.typeTransitions(df)
      .orderBy("from_type", "to_type").collect()
    assert(r.map(x => (x.getAs[String]("from_type"), x.getAs[String]("to_type"),
      x.getAs[Long]("n"), x.getAs[Long]("n_from"), x.getAs[Double]("p"))).toSeq ==
      Seq(("a", "b", 2L, 2L, 1.0), ("b", "a", 1L, 1L, 1.0)))
  }

  test("activityHeatmap: Monday-zero day-of-week, UTC hour") {
    // 1970-01-01 (epoch 0) was a Thursday -> dow 3; epoch 4 days = Monday
    val df = Seq(
      0L,                       // Thu 00:00 -> (3, 0)
      4L * 86400000000L + 3600000000L * 5) // Mon 05:00 -> (0, 5)
      .toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val r = EventAnalytics.activityHeatmap(df).orderBy("dow", "hour").collect()
    assert(r.map(x => (x.getAs[Int]("dow"), x.getAs[Int]("hour"),
      x.getAs[Long]("n_events"))).toSeq == Seq((0, 5, 1L), (3, 0, 1L)))
  }

  test("valueHourCorrelation: perfect linear r=1, zero-variance guard r=0") {
    val hr = 3600000000L
    val df = Seq(
      // type "lin": value = 100 * hour -> r = 1 exactly
      ("lin", 0.0, 0L), ("lin", 100.0, hr), ("lin", 200.0, 2 * hr),
      // type "flat": constant value -> zero variance -> r = 0, not NaN
      ("flat", 5.0, 0L), ("flat", 5.0, hr))
      .toDF("event_type", "value", "us")
      .select(col("event_type"), col("value"), timestamp_micros(col("us")).as("ts"))
    val r = EventAnalytics.valueHourCorrelation(df).orderBy("event_type").collect()
    assert(r(0).getAs[String]("event_type") == "flat")
    assert(r(0).getAs[Double]("r") == 0.0)
    assert(r(1).getAs[Double]("r") == 1.0)
    assert(r(1).getAs[Long]("n_events") == 3L)
  }

  test("valueHistogram: integer-cent buckets, top bucket capped") {
    val df = Seq(
      (1L, "m", 0.01),   // bucket 0
      (2L, "m", 49.99),  // bucket 0 (4999 // 5000)
      (3L, "m", 50.0),   // bucket 1
      (4L, "m", 9999.0)) // bucket 199 -> capped at 9
      .toDF("event_id", "event_type", "value")
    val r = EventAnalytics.valueHistogram(df, bucketWidth = 50.0, nBuckets = 10)
      .orderBy("bucket").collect()
    assert(r.map(x => (x.getAs[Int]("bucket"), x.getAs[Double]("bucket_lo"),
      x.getAs[Long]("n_events"))).toSeq ==
      Seq((0, 0.0, 2L), (1, 50.0, 1L), (9, 450.0, 1L)))
  }

  test("propsAccounting: missing keys counted, excluded from the sums") {
    val df = Seq(
      (1L, 10L, "view", """{"k": 5}"""),
      (2L, 20L, "view", """{"j": 9}"""),
      (3L, 30L, "error", """{"k": 2}"""))
      .toDF("user_id", "us", "event_type", "props")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"), col("props"))
    val r = EventAnalytics.propsAccounting(df).orderBy("event_type").collect()
    assert(r(0).getAs[String]("event_type") == "error")
    assert(r(0).getAs[Long]("k_sum") == 2L)
    assert(r(1).getAs[Long]("n_events") == 2L)
    assert(r(1).getAs[Long]("n_missing") == 1L)
    assert(r(1).getAs[Long]("k_sum") == 5L)
    assert(r(1).getAs[Long]("k_min") == 5L && r(1).getAs[Long]("k_max") == 5L)
  }

  private def cdcEvents(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))

  test("cdcCompact: last writer wins, tombstoned keys absent") {
    val df = cdcEvents(
      (1L, 10L, 1L, "view", 1.0), (2L, 20L, 1L, "click", 2.0),
      (3L, 10L, 2L, "view", 3.0), (4L, 30L, 2L, "error", 0.0))
    val r = EventAnalytics.cdcCompact(df).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("user_id") == 1L)
    assert(row.getAs[Long]("n_ops") == 2L)
    assert(row.getAs[Long]("last_ts_us") == 20L)
    assert(row.getAs[String]("last_type") == "click")
    assert(row.getAs[Double]("last_value") == 2.0)
  }

  test("cdcCompact: tombstone-then-upsert resurrects; n_ops counts the tombstone") {
    val df = cdcEvents(
      (1L, 10L, 3L, "error", 0.0), (2L, 20L, 3L, "purchase", 7.5))
    val r = EventAnalytics.cdcCompact(df).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_ops") == 2L)
    assert(r.head.getAs[String]("last_type") == "purchase")
    assert(r.head.getAs[Double]("last_value") == 7.5)
  }

  test("cdcCompact: duplicate timestamps break on event_id (same order as SCD2)") {
    val df = cdcEvents(
      (100L, 50L, 4L, "view", 1.0), (101L, 50L, 4L, "click", 9.0))
    val r = EventAnalytics.cdcCompact(df).collect()
    assert(r.head.getAs[String]("last_type") == "click")
    assert(r.head.getAs[Double]("last_value") == 9.0)
  }
}
