package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measures the containment output wall's documented mitigation instead of
  * just asserting it: `Dedup.containmentPairs` scaladoc (and the r14
  * SCALING.md study) pin the sf10-replica failure on true-pair output ∝
  * duplicate-group-size² — the full-registry warm-up's shuffle spill
  * exhausted the disk because the substrate gives every base document 100
  * mutual near-duplicates. The prescribed deployment order is "run near-dup
  * dedup FIRST so containment sees bounded duplicate groups". This main
  * times exactly that pipeline on the same substrate the registered query
  * died on:
  *
  *   phase A — near-dup pair graph + min-label survivor selection
  *             ([[Dedup.nearDuplicatePairs]] → [[Dedup.nearDedupLabels]],
  *             the `q_dedup_survivors` plan), then keep only canonical rows;
  *   phase B — [[Dedup.containmentPairs]] over the survivors (same n=3,
  *             threshold=0.6 as the registered `q_dedup_containment`).
  *
  * Since r15 this pipeline is ALSO the registered, oracle-backed
  * `q_dedup_containment_guarded` — this main remains the solo timing
  * harness for it on staged substrates.
  *
  * Output: ONE JSON line `{"metric":"containment_after_dedup", "value":
  * totalSec, "phases":{"dedup":s,"containment":s}, "rows":{"docs":N,
  * "survivors":N,"pairs":N}, "config":{...}, "sf":...}` — same config tag
  * as `graft.Bench` so the artifact self-declares its protocol. Single cold
  * pass: the point is feasibility-with-headroom on the substrate where the
  * unguarded plan hit the disk wall, not a decade estimate.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.ContainmentWallBench
  */
object ContainmentWallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
      .config("spark.sql.ui.retainedExecutions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()

    val t0 = System.nanoTime()
    val labels = Dedup.nearDedupLabels(
      docs, Dedup.nearDuplicatePairs(docs, n = 3, threshold = 0.7))
    val survivors = Dedup.survivorsOf(docs, labels)
      // labels are localCheckpointed; pin the joined survivor set too so
      // phase B's timing doesn't re-pay the survivor join per shuffle read
      .localCheckpoint(true)
    val nSurvivors = survivors.count()
    val t1 = System.nanoTime()

    // eager localCheckpoint = ONE full materialization of the containment
    // plan (all columns); the count then reads the checkpointed blocks.
    // (ADVICE r14: the previous noop-write + uncached count executed the
    // plan twice inside the timed window, doubling the reported phase.)
    val pairs = Dedup.containmentPairs(survivors, n = 3, threshold = 0.6)
      .localCheckpoint(true)
    val nPairs = pairs.count()
    val t2 = System.nanoTime()

    val dedupS = (t1 - t0) / 1e9
    val contS = (t2 - t1) / 1e9
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    val config = s"""{"cpus":"$cpus","shuffle_partitions":"$shufflePartitions",""" +
      f""""max_heap_gb":$heapGb%.1f,"passes":1,"estimator":"cold-single-pass"}"""
    println(
      s"""{"metric":"containment_after_dedup","value":${dedupS + contS},""" +
        s""""unit":"sec","phases":{"dedup":$dedupS,"containment":$contS},""" +
        s""""rows":{"docs":$nDocs,"survivors":$nSurvivors,"pairs":$nPairs},""" +
        s""""config":$config,"sf":"$sfDir"}""")
    spark.stop()
  }
}
