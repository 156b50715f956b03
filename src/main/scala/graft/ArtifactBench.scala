package graft
import org.apache.spark.sql.SparkSession

/** Artifact-store win quantification (r10 verdict task 7): time the FIRST
  * invocation of each artifact-backed registered query with the per-JVM L1
  * caches cleared — exactly a fresh session's cost, which includes the
  * load-or-train seam. Run once with an EMPTY artifact store (a first
  * session: trains + publishes) and once against the POPULATED store (a
  * second session: loads the bounded parquet instead of re-scanning the
  * corpus); the difference is the persistence win the store exists for.
  *
  * `trains` in the output records `ArtifactStore.trainsThisJvm` per query,
  * so the JSON self-documents which mode each measurement ran in (> 0 ⇒
  * train path; 0 ⇒ pure load path). One JSON line, Bench conventions.
  */
object ArtifactBench {
  private val DefaultQueries = Seq(
    "q_similarity_knn_bounded", // √N-cell KNN index (centroids + radii)
    "q_pipeline_semdedup",      // k ∝ N/250 k-means centroids
    "q_embed_pq",               // PQ codebooks (m=4 × k=16 Lloyd)
    "q_similarity_topk",        // 16-cell IVF index + radii + seed floors
    "q_text_bpe_encode")        // BPE merge table + type→tokens memo

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq).getOrElse(DefaultQueries)

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val results = names.map { name =>
      // a fresh session has no L1 entries: the first invocation pays the
      // full load-or-train seam (that cost is the measurand — no warm-up)
      SparkEntry.clearModelCachesForTest()
      System.gc()
      val t0 = graft.state.ArtifactStore.trainsThisJvm.get()
      val n0 = System.nanoTime()
      force(SparkEntry.queries(name)(spark, sfDir))
      val sec = (System.nanoTime() - n0) / 1e9
      (name, sec, graft.state.ArtifactStore.trainsThisJvm.get() - t0)
    }
    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val tr = results.map { case (k, _, t) => s""""$k":$t""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"artifact_first_touch","value":$total,"unit":"sec",""" +
      s""""queries":$qs,"trains":$tr,"sf":"$sfDir","artifacts":"${
        graft.state.ArtifactStore.root(spark)}"}""")
    spark.stop()
  }
}
