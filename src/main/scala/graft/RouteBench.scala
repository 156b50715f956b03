package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions
import graft.operators.Similarity

/** Two-level centroid routing at a PRODUCTION-shaped k (r11 verdict task 4):
  * the k>64 branch of [[NativeExpressions.DoubleCentroidIndex]] exists for
  * the k ≈ N/250 serving regime (sf10 → k ≈ 2000, ~45 coarse cells), but
  * through r11 it was only ever exercised at k=80 (oracle gate) and k=100
  * (kernel spec). This main pins, on the real scaled corpora:
  *
  *   (a) the per-row cost claim — ~2√k vs k distance evaluations — as
  *       ALTERNATING same-JVM samples (two_level, flat, two_level, flat, …)
  *       so the A/B is like-for-like (the r11 protocol: block-ordered pairs
  *       measure machine drift, not code), and
  *   (b) two-level vs flat-exact assignment agreement: exact-match rate,
  *       the impossible-better row count (two-level d2 strictly below the
  *       exact argmin ⇒ a routing bug), and the mean relative d2 excess on
  *       the rows that do disagree.
  *
  * Centroids are Lloyd-trained ([[Similarity.trainKmeans]], iters=2) so the
  * geometry is the serving regime's, not a synthetic grid. The flat side
  * runs the SAME compiled kernel with `forceFlat = true` — one boolean away
  * from the production path, so the A/B isolates the routing.
  *
  * Prints one JSON line per timed pass plus one agreement line (jsonl).
  * Usage: SPARK_GRAFT_SF_DIR=… [SPARK_GRAFT_ROUTE_K=1024]
  * [SPARK_GRAFT_ROUTE_PASSES=3] runMain graft.RouteBench
  */
object RouteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/benchdata/sf1")
    val k = sys.env.getOrElse("SPARK_GRAFT_ROUTE_K", "1024").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_ROUTE_PASSES", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()
    val coarse = math.ceil(math.sqrt(k.toDouble)).toInt

    val t0 = System.nanoTime()
    val cents = Similarity.trainKmeans(emb, k, iters = 2)
    val trainSec = (System.nanoTime() - t0) / 1e9
    val two = new NativeExpressions.DoubleCentroidIndex(cents)
    val flat = new NativeExpressions.DoubleCentroidIndex(cents, forceFlat = true)

    def assign(idx: NativeExpressions.DoubleCentroidIndex) =
      NativeExpressions.nearestCentroidDist(col("embedding"), idx)

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // untimed JIT/page-cache warm-up of BOTH kernels on a small slice, so
    // the first timed sample is not the one paying compilation
    force(emb.limit(2000).select(assign(two).getField("cell").as("c")))
    force(emb.limit(2000).select(assign(flat).getField("cell").as("c")))

    (1 to passes).foreach { _ =>
      Seq("two_level" -> two, "flat" -> flat).foreach { case (variant, idx) =>
        System.gc()
        val t = System.nanoTime()
        force(emb.select(assign(idx).getField("cell").as("cell"))
          .groupBy("cell").count())
        val sec = (System.nanoTime() - t) / 1e9
        println(s"""{"metric":"route_assign","variant":"$variant",""" +
          s""""value":$sec,"unit":"sec","k":$k,"coarse":$coarse,"n":$n,""" +
          s""""train_sec":$trainSec,"sf":"$sfDir"}""")
      }
    }

    // one joint pass: both assignments per row, exact agreement accounting
    val both = emb
      .select(assign(two).as("t"), assign(flat).as("f"))
      .select(col("t.cell").as("tc"), col("t.d2").as("td"),
        col("f.cell").as("fc"), col("f.d2").as("fd"))
    val r = both.agg(
      count(lit(1)).as("n"),
      sum(when(col("tc") === col("fc"), 1L).otherwise(0L)).as("matches"),
      // two-level strictly closer than the exact flat argmin is impossible;
      // any such row is a kernel bug, not an approximation artifact
      sum(when(col("td") < col("fd") - lit(1e-9), 1L).otherwise(0L))
        .as("impossible"),
      avg(when(col("tc") =!= col("fc"),
        col("td") / greatest(col("fd"), lit(1e-300)) - 1.0)).as("excess"))
      .collect()(0)
    val matches = r.getLong(1)
    val excess = if (r.isNullAt(3)) 0.0 else r.getDouble(3)
    println(s"""{"metric":"route_agreement","k":$k,"coarse":$coarse,""" +
      s""""n":${r.getLong(0)},"match_rate":${matches.toDouble / r.getLong(0)},""" +
      s""""impossible_better":${r.getLong(2)},""" +
      s""""mean_rel_d2_excess_on_disagree":$excess,"sf":"$sfDir"}""")
    spark.stop()
  }
}
