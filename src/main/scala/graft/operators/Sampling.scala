package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation (beyond-reference
  * extension, SURVEY §2.5 north star). Randomness comes from a cryptographic
  * hash of the row key, never from `rand()`: results are identical across
  * runs, retries, partitionings, and ENGINES (md5 is everywhere), so a sample
  * is reproducible and each query's DuckDB oracle recomputes it exactly.
  *
  * The hash is compared LEXICOGRAPHICALLY on a hex prefix instead of being
  * converted to an integer — string comparison of lowercase hex is the same
  * total order as the numeric value, and it sidesteps engine-specific
  * hex→int casts (Spark's `conv` is unsigned-only; DuckDB's differs again).
  */
object Sampling {

  /** md5 of `salt:key` — the per-row sampling coordinate. */
  private def keyHash(salt: String, key: Column): Column =
    md5(concat(lit(salt + ":"), key.cast("string")))

  /** Deterministic Bernoulli sample: keep rows whose hash prefix falls below
    * `rateHex` (4 hex digits → rate = 0x`rateHex` / 65536, e.g. "1999" ≈ 10%).
    * A pure map-side filter — the predicate is codegen'd and sits in the scan,
    * no shuffle, no state; the sample of a 100 TB corpus costs one pass.
    */
  def hashSample(df: DataFrame, keyCol: String, rateHex: String,
      salt: String = "s5"): DataFrame = {
    require(rateHex.matches("[0-9a-f]{4}"),
      s"rateHex must be 4 lowercase hex digits, got '$rateHex'")
    df.filter(substring(keyHash(salt, col(keyCol)), 1, 4) < rateHex)
  }

  /** Deterministic epoch shuffle-and-shard: assign every row a shard (first
    * hex digit of an epoch-salted key hash → 16 shards; widen the prefix for
    * 256/4096 shards at larger scale) and a 1-based position within its shard
    * (rank by an INDEPENDENT epoch-salted hash, ties by key). This is the
    * training-data ordering step: each epoch gets a different but fully
    * reproducible global permutation, with no `rand()` and no single-partition
    * global sort — the only wide operations are the shard hash partitioning
    * and a per-shard sort, both embarrassingly parallel across shards.
    *
    * Returns the input columns plus `shard` and `pos`.
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salt = s"e$epoch"
    val w = Window.partitionBy(col("shard"))
      .orderBy(keyHash(s"$salt-pos", col(keyCol)), col(keyCol))
    df.withColumn("shard", substring(keyHash(s"$salt-shard", col(keyCol)), 1, 1))
      .withColumn("pos", row_number().over(w).cast("int"))
  }

  /** Stratified quota sample: the `quota` hash-smallest rows per stratum —
    * every stratum is represented (unlike Bernoulli, which drowns small
    * strata), and within a stratum membership is uniform. Implemented as a
    * window `row_number` over (hash, key) per stratum: one shuffle keyed by
    * the stratum column, per-stratum sort.
    *
    * Scale note: a single dominant stratum makes its sort heavy; at 100 TB
    * replace the window with a two-pass threshold (count per stratum → keep
    * hash < quantile cutoff) at the same call shape — the window form is the
    * exact-quota reference semantics.
    *
    * Returns the input columns plus `rk` (1-based rank within the stratum).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      quota: Int, salt: String = "s5"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(keyHash(salt, col(keyCol)), col(keyCol))
    df.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= quota)
  }

  /** The 100 TB twin of [[stratifiedSample]] — identical output (same
    * oracle), computed via [[Ranking.topKPerKey]]'s bounded per-key heaps
    * instead of a window. Spark 4's own WindowGroupLimit already bounds the
    * window form's SHUFFLE to quota rows per (stratum, map partition); what
    * this form removes is the two partition-wide sorts around it — a
    * dominant stratum costs an O(quota)-memory heap per task instead of a
    * fully materialized, spillable partition sort (see [[Ranking]]).
    */
  def stratifiedSampleBounded(df: DataFrame, stratumCol: String, keyCol: String,
      quota: Int, salt: String = "s5"): DataFrame =
    Ranking.topKPerKey(df, Seq(stratumCol),
      Seq(keyHash(salt, col(keyCol)), col(keyCol)), quota)
      .withColumnRenamed("rank", "rk")
}
