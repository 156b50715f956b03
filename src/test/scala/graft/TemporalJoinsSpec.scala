package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{StockAggregation, TemporalJoins}

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join picks the latest dim at or before each fact, null when none") {
    val facts = Seq(
      (1L, "A", 5L),   // dims at 3, 10 → picks 3
      (2L, "A", 10L),  // dim exactly AT fact ts counts → picks 10
      (3L, "A", 2L),   // before any dim → null
      (4L, "B", 100L)  // key with no dims at all → null
    ).toDF("event_id", "symbol", "ts_s")
    val dims = Seq(
      ("A", 3L, 30L), ("A", 10L, 100L), ("A", 20L, 200L)
    ).toDF("symbol", "pub_s", "payload")

    val out = TemporalJoins.asOfJoin(facts, dims, "symbol", "ts_s", "pub_s")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(1L -> Some(30L), 2L -> Some(100L), 3L -> None, 4L -> None))
  }

  test("as-of join output is one row per fact (no fan-out from many dims)") {
    val facts = (0 until 50).map(i => (i.toLong, "K", i.toLong * 2)).toDF("event_id", "symbol", "ts_s")
    val dims = (0 until 40).map(i => ("K", i.toLong * 3, i.toLong)).toDF("symbol", "pub_s", "v")
    val out = TemporalJoins.asOfJoin(facts, dims, "symbol", "ts_s", "pub_s")
    assert(out.count() == 50)
    // spot-check: fact at ts 98 → latest dim pub <= 98 is 96 (v=32)
    assert(out.filter(col("event_id") === 49).head().getLong(3) == 32L)
  }

  test("as-of join adds exactly one shuffle (merge shape), not a per-key cross product") {
    val facts = (0 until 100).map(i => (i.toLong, s"K${i % 5}", i.toLong)).toDF("event_id", "symbol", "ts_s")
    val dims = (0 until 50).map(i => (s"K${i % 5}", i.toLong, i.toLong)).toDF("symbol", "pub_s", "v")
    val qe = TemporalJoins.asOfJoin(facts, dims, "symbol", "ts_s", "pub_s").queryExecution
    qe.toRdd.count() // AQE finalizes the executed plan
    // the AdaptiveSparkPlan string appends the pre-AQE "Initial Plan" — count
    // operators in the final section only
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"as-of join must shuffle exactly once (by join key):\n$plan")
    assert(!plan.contains("Join"), s"the merge shape has no join operator at all:\n$plan")
  }

  test("as-of join rejects payload/fact column collisions loudly") {
    val facts = Seq((1L, "A", 5L)).toDF("event_id", "symbol", "ts_s")
    val dims = Seq(("A", 3L, 1L)).toDF("symbol", "pub_s", "event_id")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(facts, dims, "symbol", "ts_s", "pub_s")
    }
    assert(e.getMessage.contains("collision"))
  }

  test("range join: start inclusive, end exclusive, cross-bucket intervals emit once") {
    val facts = Seq(
      (1L, 100L), (2L, 199L), (3L, 200L), (4L, 99L), (5L, 5000L)
    ).toDF("event_id", "ts_s")
    // [100, 200) spans buckets 1..3 at width 64 — pair (1,..) must appear once
    val iv = Seq((100L, 200L), (4000L, 6000L)).toDF("start_s", "end_s")
    val out = TemporalJoins.rangeJoin(facts, iv, "ts_s", "start_s", "end_s", bucketWidth = 64L)
      .select("event_id", "start_s").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 100L), (2L, 100L), (5L, 4000L)))
  }

  test("range join plans an equi join, not a nested loop") {
    val facts = Seq((1L, 100L)).toDF("event_id", "ts_s")
    val iv = Seq((100L, 200L)).toDF("start_s", "end_s")
    val plan = TemporalJoins.rangeJoin(facts, iv, "ts_s", "start_s", "end_s", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join must not plan all-pairs:\n$plan")
  }

  test("range join treats empty intervals as matching nothing (no descending explode)") {
    val facts = Seq((1L, 100L)).toDF("event_id", "ts_s")
    // end <= start: empty by definition — must produce zero matches, not a
    // huge descending bucket sequence
    val iv = Seq((200L, 100L), (0L, 0L), (100L, 200L)).toDF("start_s", "end_s")
    val out = TemporalJoins.rangeJoin(facts, iv, "ts_s", "start_s", "end_s", 64L)
    assert(out.count() == 1 && out.head().getLong(2) == 100L)
  }

  test("reserved internal column names are rejected loudly") {
    val factsB = Seq((1L, 100L, 0L)).toDF("event_id", "ts_s", "__b")
    val iv = Seq((100L, 200L)).toDF("start_s", "end_s")
    val e1 = intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoin(factsB, iv, "ts_s", "start_s", "end_s", 64L)
    }
    assert(e1.getMessage.contains("__b"))

    val factsT = Seq((1L, "A", 5L, 9L)).toDF("event_id", "symbol", "ts_s", "__t")
    val dims = Seq(("A", 3L, 30L)).toDF("symbol", "pub_s", "payload")
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(factsT, dims, "symbol", "ts_s", "pub_s")
    }
    assert(e2.getMessage.contains("__t"))
  }

  test("session windows merge at exactly the gap and split strictly beyond it") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val txns = Seq(
      // 0, 59 merge (diff < gap); 119 ALSO merges — Spark's session merge is
      // inclusive (event start == previous session end), so diff == gap chains
      ("A", ts(0), true, 1.0, 1),
      ("A", ts(59), true, 1.0, 1),
      ("A", ts(119), false, 2.0, 2),
      // diff 121 > 60 → new session
      ("A", ts(240), false, 2.0, 2),
      // other key unaffected
      ("B", ts(5), true, 3.0, 3)
    ).toDF("symbol", "ts", "buy", "amount", "number_shares")
    val out = StockAggregation.aggregateSessions(txns, gap = "60 seconds")
      .orderBy("symbol", "session_start_s")
      .collect()
      .map(r => (r.getString(2), r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("A", 0L, 179L, 3L),     // 0,59,119 chained; end = 119 + 60
      ("A", 240L, 300L, 1L),   // strictly-beyond-gap event opens a new session
      ("B", 5L, 65L, 1L)))
  }
}
