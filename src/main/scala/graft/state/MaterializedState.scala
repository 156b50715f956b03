package graft.state

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.StockAggregation
import graft.util.Fs

/** The serving-side materialized state table (S5's read half): the aggregate
  * snapshot written ONCE, which the interactive-query functions then read —
  * mirroring the reference, where IQ queries hit the pre-materialized RocksDB
  * store (`streams/KafkaStreamsService.java:84-90`) rather than re-consuming
  * the input topic. Re-computing the aggregation from raw events on every key
  * lookup (rounds 1–2 here) would re-scan the raw table at 100 TB; serving
  * from the snapshot makes a key query O(matching row-groups).
  *
  * Layout chosen for the serving patterns (key point lookup, key-range scan,
  * multi-key): range-partitioned by `symbol` and sorted within partitions, so
  * every parquet file covers a disjoint key interval and carries tight
  * min/max symbol statistics. Catalyst then prunes:
  *   - KeyQuery / MultiKeyQuery → `PushedFilters: [EqualTo/In(symbol,...)]`
  *     + row-group skip via column min/max;
  *   - RangeQuery → only the files whose [min,max] intersects the bounds.
  * At cluster scale the same layout is a bucketed/sorted table (or liquid
  * clustering); the number of range partitions is sized to target file size,
  * not hardcoded — here 8 keeps files non-trivial at the test SFs.
  *
  * The raw-recompute plan remains the ORACLE (the DuckDB SQL recomputes from
  * events); the engine path reads the snapshot.
  */
object MaterializedState {

  private val built = new ConcurrentHashMap[String, String]()

  private def stateDir(sfDir: String): Path =
    Paths.get("target", "state", sfDir.replaceAll("[^A-Za-z0-9.]+", "_"))
      .toAbsolutePath

  /** Write the snapshot for this scale factor (once per JVM); returns its
    * path.
    */
  def ensure(spark: SparkSession, sfDir: String): String =
    built.computeIfAbsent(sfDir, _ => {
      val dir = stateDir(sfDir)
      StockAggregation.aggregate(Tables.transactions(spark, sfDir))
        .repartitionByRange(8, col("symbol"))
        .sortWithinPartitions("symbol")
        .write.mode("overwrite").parquet(dir.toString)
      dir.toString
    })

  /** The serving table. Filters over `symbol` push into the scan and prune
    * files/row-groups via the sorted layout's min/max statistics.
    */
  def read(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(ensure(spark, sfDir))

  // private[graft] so the fresh-JVM rerun spec can clear the memo and
  // re-enter the build path against a pre-existing on-disk layout
  private[graft] val bucketedBuilt = new ConcurrentHashMap[String, (String, String)]()

  /** Co-located serving tables: the aggregate snapshot AND a per-symbol
    * latest-event-time table, both written once as parquet tables BUCKETED by
    * `symbol` into the same bucket count. A join between them then needs NO
    * exchange on either side — the bucket layout IS the join partitioning,
    * which is the storage-level answer to "minimize shuffles" for repeated
    * large-large keyed joins (broadcast covers small-large;
    * `q_multi_key_large`). At cluster scale this is a bucketed warehouse
    * table; the bucket count is sized to data volume, not hardcoded — 8 keeps
    * files non-trivial at the test SFs.
    */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (aggT, mtsT) = bucketedBuilt.computeIfAbsent(sfDir, _ => {
      // sanitized name + exact-dir hash: sanitization alone (and the
      // catalog's case folding) would collide distinct dirs onto one table
      // name, and the tableExists guard would then serve the wrong data
      val suffix = sfDir.replaceAll("[^A-Za-z0-9]+", "_").toLowerCase +
        "_" + java.lang.Integer.toHexString(sfDir.hashCode)
      val aggT = s"graft_agg$suffix"
      val mtsT = s"graft_maxts$suffix"
      val base = stateDir(sfDir).resolveSibling(
        stateDir(sfDir).getFileName.toString + "_bucketed")
      if (!spark.catalog.tableExists(aggT)) {
        // catalog is per-JVM but the external path persists: a fresh JVM with
        // a stale directory would fail the CTAS (non-empty location) — clear
        // it first, mirroring how ensure() tolerates leftover state
        Fs.deleteRecursively(base.resolve("agg"))
        StockAggregation.aggregate(Tables.transactions(spark, sfDir))
          .write.bucketBy(8, "symbol").sortBy("symbol")
          .option("path", base.resolve("agg").toString)
          .mode("overwrite").format("parquet").saveAsTable(aggT)
      }
      if (!spark.catalog.tableExists(mtsT)) {
        Fs.deleteRecursively(base.resolve("mts"))
        Tables.transactionsWithTs(spark, sfDir)
          .groupBy("symbol")
          .agg(max(unix_millis(col("ts"))).as("max_ts_ms"))
          .write.bucketBy(8, "symbol").sortBy("symbol")
          .option("path", base.resolve("mts").toString)
          .mode("overwrite").format("parquet").saveAsTable(mtsT)
      }
      (aggT, mtsT)
    })
    spark.table(aggT).join(spark.table(mtsT), "symbol")
  }

}
