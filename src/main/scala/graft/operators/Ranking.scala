package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedTopKRowsAgg.boundedTopKRows

/** Bounded per-key ranking: the exact result of
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k`, computed as
  * one hash aggregate over [[graft.functions.BoundedTopKRowsAgg]] instead of
  * a window.
  *
  * Why it matters at 100 TB: the window form exchanges EVERY row of every
  * key and fully sorts each partition before discarding all but k rows per
  * key; the bounded-aggregate form keeps at most k rows per (key, partition)
  * in map-side partials, so the exchange carries keys × partitions × k rows
  * and nothing is ever globally sorted. A dominant key costs k rows per
  * partition instead of a partition-sized sort.
  */
object Ranking {

  /** Per key, the `k` smallest rows under `orderCols` (ascending,
    * left-to-right), with their 1-based `rank`. `orderCols` must include a
    * unique tiebreaker so the order is total — the payload (all input
    * columns) is carried BEHIND the order fields inside the ranking struct
    * and must never decide a comparison.
    *
    * Output: the input columns plus `rank` (int).
    */
  def topKPerKey(
      df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    require(keyCols.nonEmpty, "topKPerKey: no key columns")
    require(orderCols.nonEmpty, "topKPerKey: no order columns")
    val item = struct(
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"_o$i") } :+
        struct(df.columns.map(col): _*).as("_p"): _*)
    df
      .groupBy(keyCols.map(col): _*)
      .agg(boundedTopKRows(item, k).as("_top"))
      .select(posexplode(col("_top")).as(Seq("_i", "_t")))
      .select(col("_t._p.*") +: Seq((col("_i") + 1).cast("int").as("rank")): _*)
  }
}
