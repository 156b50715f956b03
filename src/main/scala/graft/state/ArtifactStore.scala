package graft.state

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.Bpe

/** Parquet-backed persistence for trained model artifacts (IVF centroids /
  * radii / seed floors, k-means centroids, PQ codebooks, language profiles,
  * vocabularies, the BPE model) — the load-or-train seam the per-JVM caches
  * in SparkEntry sit in front of.
  *
  * Why: at 100 TB these artifacts are real indexes — retraining them per
  * session re-reads the corpus, exactly the cost an index exists to avoid.
  * The reference persists its store via RocksDB + changelog restore
  * (KafkaStreamsService.java:84-87); this is the batch-engine analogue: the
  * artifact is written once per (corpus, artifact-name) and every later
  * session loads the bounded parquet instead of re-scanning the corpus.
  *
  * Layout: `<root>/<md5(corpusKey)>/<name>` where root resolves from the
  * session conf `spark.graft.artifacts.dir`, then the env
  * `SPARK_GRAFT_ARTIFACTS`, then `target/artifacts`. Artifact NAMES embed
  * their training parameters (k, iters, query ids), so a parameter change
  * trains a NEW artifact rather than silently serving a stale one.
  *
  * Publish is ATOMIC: write to a `.tmp-*` sibling, then filesystem rename
  * into place — a reader never sees a half-written artifact (it sees either
  * nothing, and trains, or the complete rename target). If two sessions race,
  * the rename loser deletes its tmp copy and serves its own in-memory value —
  * training is deterministic, so both copies are identical anyway.
  *
  * Every decode sorts by the persisted `ord` column, so row order is exact
  * regardless of parquet task layout. `trainsThisJvm` counts actual
  * train-path executions — the spec's witness that a second session LOADS
  * instead of retraining.
  */
object ArtifactStore {

  /** Number of train-path executions in this JVM (loads don't count) —
    * observability for specs and scale studies, not a correctness knob.
    */
  val trainsThisJvm = new java.util.concurrent.atomic.AtomicLong(0)

  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.artifacts.dir")
      .orElse(sys.env.get("SPARK_GRAFT_ARTIFACTS"))
      .getOrElse("target/artifacts")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def artifactPath(spark: SparkSession, corpusKey: String, name: String): String =
    s"${root(spark)}/${md5hex(corpusKey)}/$name"

  /** Generic load-or-train over a DataFrame codec (see object doc for the
    * atomic-publish and race semantics).
    */
  def loadOrTrain[T](spark: SparkSession, corpusKey: String, name: String)(
      encode: T => DataFrame, decode: DataFrame => T)(train: => T): T = {
    val p = artifactPath(spark, corpusKey, name)
    val dst = new org.apache.hadoop.fs.Path(p)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(p + "/_SUCCESS")))
      decode(spark.read.parquet(p))
    else {
      val t = train
      trainsThisJvm.incrementAndGet()
      val tmp = new org.apache.hadoop.fs.Path(
        p + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      encode(t).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      fs.mkdirs(dst.getParent)
      // Re-probe before touching dst: a CONCURRENT session may have
      // published a complete artifact between our initial _SUCCESS probe and
      // now. A complete dst must be LEFT IN PLACE — deleting it would yank
      // files out from under any reader that passed its own _SUCCESS check
      // (training is deterministic, so theirs == ours; serve our in-memory
      // value). Only a dst WITHOUT _SUCCESS — a crashed writer's debris by
      // definition — is removed, else the rename would nest tmp INSIDE it
      // (HDFS/posix mv-into-dir semantics) and the artifact never publishes.
      if (fs.exists(new org.apache.hadoop.fs.Path(p + "/_SUCCESS")))
        fs.delete(tmp, true)
      else {
        if (fs.exists(dst)) fs.delete(dst, true)
        if (!fs.rename(tmp, dst)) fs.delete(tmp, true) // race loser: theirs == ours
      }
      t
    }
  }

  private def df(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  def floatMatrix(spark: SparkSession, corpusKey: String, name: String)(
      train: => Array[Array[Float]]): Array[Array[Float]] =
    loadOrTrain[Array[Array[Float]]](spark, corpusKey, name)(
      m => df(spark,
        m.toIndexedSeq.zipWithIndex.map { case (v, i) => Row(i, v.toSeq) },
        StructType(Seq(
          StructField("ord", IntegerType, nullable = false),
          StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))),
      d => d.orderBy("ord").collect().map(_.getSeq[Float](1).toArray))(train)

  def doubleMatrix(spark: SparkSession, corpusKey: String, name: String)(
      train: => Array[Array[Double]]): Array[Array[Double]] =
    loadOrTrain[Array[Array[Double]]](spark, corpusKey, name)(
      m => df(spark,
        m.toIndexedSeq.zipWithIndex.map { case (v, i) => Row(i, v.toSeq) },
        StructType(Seq(
          StructField("ord", IntegerType, nullable = false),
          StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false)))),
      d => d.orderBy("ord").collect().map(_.getSeq[Double](1).toArray))(train)

  /** 3-D double tensor (PQ codebooks: subspace → code → sub-vector). */
  def doubleTensor3(spark: SparkSession, corpusKey: String, name: String)(
      train: => Array[Array[Array[Double]]]): Array[Array[Array[Double]]] =
    loadOrTrain[Array[Array[Array[Double]]]](spark, corpusKey, name)(
      m => df(spark,
        (for {
          (sub, s) <- m.toIndexedSeq.zipWithIndex
          (code, c) <- sub.toIndexedSeq.zipWithIndex
        } yield Row(s, c, code.toSeq)),
        StructType(Seq(
          StructField("sub", IntegerType, nullable = false),
          StructField("code", IntegerType, nullable = false),
          StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false)))),
      d => d.orderBy("sub", "code").collect()
        .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray).toArray)
        .toArray)(train)

  def intDoubleMap(spark: SparkSession, corpusKey: String, name: String)(
      train: => Map[Int, Double]): Map[Int, Double] =
    loadOrTrain[Map[Int, Double]](spark, corpusKey, name)(
      m => df(spark,
        m.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) },
        StructType(Seq(
          StructField("k", IntegerType, nullable = false),
          StructField("v", DoubleType, nullable = false)))),
      d => d.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap)(train)

  def longDoubleMap(spark: SparkSession, corpusKey: String, name: String)(
      train: => Map[Long, Double]): Map[Long, Double] =
    loadOrTrain[Map[Long, Double]](spark, corpusKey, name)(
      m => df(spark,
        m.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) },
        StructType(Seq(
          StructField("k", LongType, nullable = false),
          StructField("v", DoubleType, nullable = false)))),
      d => d.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)(train)

  /** (id, float-vector) rows in id order — the |q|-row query-vector probe
    * set the similarity audits share (the seed floors derive from the same
    * rows and are already persisted beside it).
    */
  def longFloatVecs(spark: SparkSession, corpusKey: String, name: String)(
      train: => Seq[(Long, Array[Float])]): Seq[(Long, Array[Float])] =
    loadOrTrain[Seq[(Long, Array[Float])]](spark, corpusKey, name)(
      v => df(spark,
        v.map { case (k, vec) => Row(k, vec.toSeq) },
        StructType(Seq(
          StructField("k", LongType, nullable = false),
          StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))),
      d => d.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
        .sortBy(_._1).toSeq)(train)

  def stringSeq(spark: SparkSession, corpusKey: String, name: String)(
      train: => Seq[String]): Seq[String] =
    loadOrTrain[Seq[String]](spark, corpusKey, name)(
      v => df(spark,
        v.toIndexedSeq.zipWithIndex.map { case (s, i) => Row(i, s) },
        StructType(Seq(
          StructField("ord", IntegerType, nullable = false),
          StructField("term", StringType, nullable = false)))),
      d => d.orderBy("ord").collect().map(_.getString(1)).toSeq)(train)

  /** Ordered language profiles: (lang, top-grams) pairs. */
  def langProfiles(spark: SparkSession, corpusKey: String, name: String)(
      train: => Seq[(String, Seq[String])]): Seq[(String, Seq[String])] =
    loadOrTrain[Seq[(String, Seq[String])]](spark, corpusKey, name)(
      v => df(spark,
        v.toIndexedSeq.zipWithIndex.map { case ((lang, grams), i) => Row(i, lang, grams) },
        StructType(Seq(
          StructField("ord", IntegerType, nullable = false),
          StructField("lang", StringType, nullable = false),
          StructField("grams", ArrayType(StringType, containsNull = false), nullable = false)))),
      d => d.orderBy("ord").collect()
        .map(r => r.getString(1) -> r.getSeq[String](2)).toSeq)(train)

  /** The trained BPE model as ONE atomically-published table: kind 'm' rows
    * carry the ranked merge table, kind 'w' rows the type→tokens memo.
    */
  def bpeModel(spark: SparkSession, corpusKey: String, name: String)(
      train: => Bpe.Model): Bpe.Model =
    loadOrTrain[Bpe.Model](spark, corpusKey, name)(
      m => df(spark,
        m.merges.toIndexedSeq.map(x =>
          Row("m", x.rank, x.left, x.right, x.pairCount, null, null)) ++
          m.memo.toIndexedSeq.sortBy(_._1).map { case (w, toks) =>
            Row("w", 0, null, null, 0L, w, toks)
          },
        StructType(Seq(
          StructField("kind", StringType, nullable = false),
          StructField("rank", IntegerType, nullable = false),
          StructField("left", StringType, nullable = true),
          StructField("right", StringType, nullable = true),
          StructField("pair_count", LongType, nullable = false),
          StructField("word", StringType, nullable = true),
          StructField("toks", ArrayType(StringType, containsNull = false), nullable = true)))),
      d => {
        val rows = d.collect()
        Bpe.Model(
          rows.filter(_.getString(0) == "m").sortBy(_.getInt(1)).toIndexedSeq
            .map(r => Bpe.Merge(r.getInt(1), r.getString(2), r.getString(3), r.getLong(4))),
          rows.filter(_.getString(0) == "w")
            .map(r => r.getString(5) -> (r.getSeq[String](6): Seq[String])).toMap)
      })(train)
}
