package graft.operators

import java.sql.Timestamp

import graft.functions.JsonPathPredicate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's interactive-query surface (SURVEY §2.4) as pure
  * `DataFrame => DataFrame` functions over the materialized aggregate.
  *
  * Each query is a logical plan: Catalyst's predicate pushdown + partition
  * pruning subsume the reference's murmur2 key→partition routing
  * (`controller/StockController.java:364-375`) and its scatter-gather across
  * hosts (`:102-139`) — a filter over a partitioned table touches exactly the
  * partitions that can match, and the union of scan tasks IS the gather.
  */
object InteractiveQueries {

  /** Q1 — point lookup (`KeyQuery`), REST `GET /keyquery/{symbol}`
    * (`StockController.java:186-206`).
    */
  def keyQuery(agg: DataFrame, symbol: String): DataFrame =
    agg.filter(col("symbol") === lit(symbol))

  /** Q2 — multi-point lookup (`MultiKeyQuery`, `query/MultiKeyQuery.java:9-51`).
    * `isin` stays a scan predicate (no shuffle); for very large key sets a
    * broadcast left-semi join is the scale path — see [[multiKeyQueryLarge]].
    */
  def multiKeyQuery(agg: DataFrame, symbols: Seq[String]): DataFrame =
    agg.filter(col("symbol").isin(symbols: _*))

  /** Q2 at scale: the key set as a broadcast semi-join (used when the set is
    * too large to inline into an IN-list literal).
    */
  def multiKeyQueryLarge(agg: DataFrame, keys: DataFrame): DataFrame =
    agg.join(broadcast(keys.select(col("symbol")).distinct()), Seq("symbol"), "left_semi")

  /** Q3 — key-range scan (`RangeQuery`) with the reference's 4 bound modes
    * (no bounds / lower / upper / both — `query/QueryUtils.java:15-29`).
    * String `>=`/`<=` on UTF8 matches the store's byte-lexicographic key
    * order for ASCII keys (SURVEY §1.3).
    */
  def rangeQuery(agg: DataFrame, lower: Option[String], upper: Option[String]): DataFrame = {
    val lowered = lower.map(l => agg.filter(col("symbol") >= lit(l))).getOrElse(agg)
    upper.map(u => lowered.filter(col("symbol") <= lit(u))).getOrElse(lowered)
  }

  /** Q4 — range + JSONPath value predicate (`FilteredRangeQuery`,
    * `query/FilteredRangeQuery.java:8-70`; executed filter-after-materialize at
    * `store/CustomQueryStore.java:68-97`). Here both predicates collapse into
    * one scan filter — strictly better than the reference's post-scan filter.
    */
  def filteredRangeQuery(
      agg: DataFrame,
      lower: Option[String],
      upper: Option[String],
      predicate: String
  ): DataFrame =
    rangeQuery(agg, lower, upper).filter(JsonPathPredicate.compile(predicate))

  /** Q5 — time-bounded windowed range + predicate
    * (`FilteredWindowRangeQuery.java:11-74`, declared but never wired in the
    * reference; implemented here over the tumbling-window aggregate).
    */
  def filteredWindowRangeQuery(
      windowedAgg: DataFrame,
      from: Option[Timestamp],
      to: Option[Timestamp],
      predicate: Option[String]
  ): DataFrame = {
    val f = from.map(t => windowedAgg.filter(col("window_start") >= lit(t))).getOrElse(windowedAgg)
    val g = to.map(t => f.filter(col("window_start") < lit(t))).getOrElse(f)
    predicate.map(p => g.filter(JsonPathPredicate.compile(p))).getOrElse(g)
  }
}
