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
    * md5(concat_ws(|, ...)) — the repo's portable content hash.
    *
    * Returns (<key>, status, old_hash, new_hash).
    */
  def snapshotDiff(
      v1: DataFrame, v2: DataFrame, key: String,
      payload: Seq[String]): DataFrame = {
    def fp(df: DataFrame) =
      df.select(col(key),
        md5(concat_ws("|", payload.map(col): _*)).as("h"))
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
}
