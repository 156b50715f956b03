package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregations next to their exact twins — the
  * shapes that keep corpus accounting viable at 100 TB, where the exact
  * forms' costs concentrate in one place: exact distinct counting shuffles
  * every distinct term once, exact percentiles sort every group. The sketch
  * forms (HyperLogLog++ distinct counts, Greenwald-Khanna quantiles) are
  * map-side mergeable: each partition emits one small sketch and the shuffle
  * carries sketches, not values.
  *
  * Both exact forms are registered with DuckDB oracles; the sketch twins are
  * engine-specific estimates (not SQL-portable bit-for-bit), so they are
  * rows-only queries whose ERROR vs the exact twin is pinned by
  * `SketchesSpec` — the spec is the contract that the estimate stays inside
  * its advertised bound on the real corpus.
  */
object Sketches {

  /** Exact per-source vocabulary accounting: distinct terms and total term
    * occurrences. The distinct count is the expensive path at scale — every
    * (source, term) pair crosses the wire once before counting.
    */
  def vocabBySource(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source")
      .agg(
        countDistinct(col("term")).as("n_distinct_terms"),
        count(lit(1)).as("n_terms"))

  /** HyperLogLog++ twin of [[vocabBySource]]: one bounded sketch per
    * (partition, source) partial — the shuffle carries sketches instead of
    * the term dictionary. `rsd` is the advertised relative standard
    * deviation (default 5%); SketchesSpec pins the real error against the
    * exact twin.
    */
  def vocabBySourceApprox(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source")
      .agg(
        approx_count_distinct(col("term"), rsd).as("n_distinct_terms"),
        count(lit(1)).as("n_terms"))

  /** Approximate-quantile twin of [[TextAnalysis.tokenDistribution]]:
    * `approx_percentile` (Greenwald-Khanna, `accuracy` inverse-epsilon)
    * instead of the exact interpolating `percentile` — same call shape, same
    * output schema, group-size-independent state. SketchesSpec pins the
    * rank-error bound against the exact form.
    */
  def tokenDistributionApprox(docs: DataFrame, accuracy: Int = 10000): DataFrame = {
    def q(p: Double, name: String) =
      approx_percentile(col("n_tokens"), lit(p), lit(accuracy)).cast("double").as(name)
    docs
      .select(col("source"), size(split(col("text"), " ")).as("n_tokens"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("n_tokens")).cast("double") / count(lit(1)), 6).as("avg_tokens"),
        q(0.25, "p25"), q(0.5, "p50"), q(0.75, "p75"), q(0.9, "p90"))
  }
}
