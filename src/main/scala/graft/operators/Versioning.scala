package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — "what changed between dataset v1 and v2", the
  * audit every retraining run starts from (which documents were added,
  * which were removed, which were edited in place).
  *
  * Scale shape: each snapshot is reduced AT THE SCAN to (key, md5(payload))
  * — 100 TB of text becomes ~tens of GB of fingerprints before anything
  * shuffles — then one key-partitioned full-outer hash join classifies
  * every key. Unchanged keys (the overwhelming majority between adjacent
  * snapshots) are dropped straight out of the join's output; nothing ever
  * materializes the payload twice. The fingerprint is md5 so any engine
  * (and the DuckDB oracle) reproduces it bit-for-bit.
  */
object Versioning {

  /** Classify every key across two snapshots as added / removed / changed,
    * dropping unchanged keys. `payload` columns are fingerprinted with
    * md5(concat_ws(|, ...)) — the repo's portable content hash — with
    * explicit '<null>' sentinels per column (concat_ws silently SKIPS
    * nulls, which would alias (a,NULL,b) with (a,b,NULL) and misclassify a
    * column-shift edit as unchanged).
    *
    * Returns (<key>, status, old_hash, new_hash).
    */
  def snapshotDiff(
      v1: DataFrame, v2: DataFrame, key: String,
      payload: Seq[String]): DataFrame = {
    def fp(df: DataFrame) =
      df.select(col(key),
        md5(concat_ws("|", payload.map(c =>
          coalesce(col(c).cast("string"), lit("<null>"))): _*)).as("h"))
    val a = fp(v1).withColumnRenamed("h", "old_hash")
    val b = fp(v2).withColumnRenamed("h", "new_hash")
      .withColumnRenamed(key, "k2")
    a.join(b, col(key) === col("k2"), "full_outer")
      .select(
        coalesce(col(key), col("k2")).as(key),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .otherwise(lit("changed")).as("status"),
        col("old_hash"), col("new_hash"))
      .filter(col("old_hash").isNull || col("new_hash").isNull ||
        col("old_hash") =!= col("new_hash"))
  }

  /** Distribution drift between two snapshots, grouped by `groupCol` —
    * the "did the source/language mix move" report a retraining run reads
    * next to the row-level diff: per group, doc counts and size sums on
    * each side plus the group's SHARE of its snapshot and the share delta
    * (mixture drift, the quantity data-mixing recipes are written in).
    *
    * Scale shape: each snapshot collapses to one bounded per-group
    * aggregate at the scan (rows = |groups|); the two aggregates meet in a
    * full-outer group-keyed join (appeared/vanished groups included, counts
    * coalesced to 0); snapshot totals are one bounded scalar aggregate
    * injected as literals (the driver-artifact move). Counts and sums stay
    * exact integers; shares are single IEEE divisions rounded at 6 dp.
    *
    * Returns (groupCol, n_v1, n_v2, size_v1, size_v2, share_v1, share_v2,
    * share_delta).
    */
  def driftReport(
      v1: DataFrame, v2: DataFrame, groupCol: String,
      sizeCol: String): DataFrame = {
    def side(df: DataFrame, n: String, sz: String) =
      df.groupBy(col(groupCol))
        .agg(count(lit(1)).as(n), sum(col(sizeCol)).as(sz))
    val a = side(v1, "n_v1", "size_v1")
    val b = side(v2, "n_v2", "size_v2").withColumnRenamed(groupCol, "g2")
    val t1 = v1.agg(count(lit(1))).head().getLong(0)
    val t2 = v2.agg(count(lit(1))).head().getLong(0)
    val s1 = round(coalesce(col("n_v1"), lit(0L)).cast("double") / lit(t1.toDouble), 6)
    val s2 = round(coalesce(col("n_v2"), lit(0L)).cast("double") / lit(t2.toDouble), 6)
    a.join(b, col(groupCol) === col("g2"), "full_outer")
      .select(
        coalesce(col(groupCol), col("g2")).as(groupCol),
        coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        coalesce(col("n_v2"), lit(0L)).as("n_v2"),
        coalesce(col("size_v1"), lit(0L)).as("size_v1"),
        coalesce(col("size_v2"), lit(0L)).as("size_v2"),
        s1.as("share_v1"), s2.as("share_v2"),
        round(coalesce(col("n_v2"), lit(0L)).cast("double") / lit(t2.toDouble)
          - coalesce(col("n_v1"), lit(0L)).cast("double") / lit(t1.toDouble), 6)
          .as("share_delta"))
  }

  /** Embedding-space drift between two snapshots of a vector table: the
    * per-dimension mean/std of each snapshot ([[Similarity.dimStats]] run
    * on both sides — decimal-exact moment accumulation, so both engines and
    * both snapshots reduce identically) joined on the dimension index, with
    * the mean shift and std ratio per dimension. This is the vector-column
    * counterpart of [[driftReport]]'s categorical mixture drift: a training
    * pipeline watches it across embedding-model upgrades and re-ingests,
    * where a handful of drifting dimensions signals a changed encoder or a
    * corrupted batch.
    *
    * Scale shape: each side is one narrow posexplode + one hash aggregate
    * onto |dims| keys (constant-size result); the two bounded profiles meet
    * in one inner join on the dimension index — at any corpus size the join
    * touches |dims| rows. Shifts subtract the 6-dp-rounded means, so the
    * output is engine-portable (no unrounded double subtraction).
    *
    * Returns (dim, mean_v1, mean_v2, mean_shift, std_v1, std_v2, n_v1,
    * n_v2).
    */
  def embeddingDrift(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = Similarity.dimStats(v1)
      .select(col("dim"), col("n_vectors").as("n_v1"),
        col("mean").as("mean_v1"), col("std").as("std_v1"))
    val b = Similarity.dimStats(v2)
      .select(col("dim"), col("n_vectors").as("n_v2"),
        col("mean").as("mean_v2"), col("std").as("std_v2"))
    a.join(b, Seq("dim"))
      .select(col("dim"), col("mean_v1"), col("mean_v2"),
        round(col("mean_v2") - col("mean_v1"), 6).as("mean_shift"),
        col("std_v1"), col("std_v2"), col("n_v1"), col("n_v2"))
  }
}
