package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Similarity, TextAnalysis}
import graft.state.ArtifactStore

/** The load-or-train seam: artifacts persist as parquet, a second lookup
  * (standing in for a second session — the persistent store is exactly what
  * outlives the JVM) LOADS instead of retraining, and every codec
  * round-trips its artifact bit-for-bit.
  */
class ArtifactStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def withTempRoot[T](body: => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-artifacts-").toString
    spark.conf.set("spark.graft.artifacts.dir", tmp)
    try body
    finally {
      spark.conf.unset("spark.graft.artifacts.dir")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("second lookup loads from parquet without retraining (train counter)") {
    withTempRoot {
      val emb = Tables.embeddings(spark, sfDir)
      var trains = 0
      def trained(): Array[Array[Float]] = {
        trains += 1
        Similarity.trainIvfCentroids(emb, k = 4, iters = 1)
      }
      val first = ArtifactStore.floatMatrix(spark, "corpusA", "ivf_test_k4")(trained())
      assert(trains == 1)
      val storeTrains = ArtifactStore.trainsThisJvm.get()
      // "second session": the L1 map in SparkEntry is gone, only parquet
      // remains — the store must serve the load path, not re-run the thunk
      val second = ArtifactStore.floatMatrix(spark, "corpusA", "ivf_test_k4")(trained())
      assert(trains == 1, "second lookup retrained instead of loading")
      assert(ArtifactStore.trainsThisJvm.get() == storeTrains)
      assert(first.length == second.length)
      first.zip(second).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    }
  }

  test("a parameter change trains a NEW artifact (name embeds the params)") {
    withTempRoot {
      val emb = Tables.embeddings(spark, sfDir)
      var trains = 0
      def trained(k: Int): Array[Array[Float]] = {
        trains += 1
        Similarity.trainIvfCentroids(emb, k = k, iters = 1)
      }
      ArtifactStore.floatMatrix(spark, "corpusA", "ivf_test_k4")(trained(4))
      ArtifactStore.floatMatrix(spark, "corpusA", "ivf_test_k5")(trained(5))
      assert(trains == 2, "different params must not share an artifact")
    }
  }

  test("codec round-trips: matrices, tensor3, maps, strings, profiles, bpe") {
    withTempRoot {
      val docs = Tables.documents(spark, sfDir)
      val emb = Tables.embeddings(spark, sfDir)

      val fm = Similarity.trainIvfCentroids(emb, k = 5, iters = 2)
      ArtifactStore.floatMatrix(spark, "c", "fm")(fm)
      val fmL = ArtifactStore.floatMatrix(spark, "c", "fm")(sys.error("must load"))
      assert(fmL.map(_.toSeq).toSeq == fm.map(_.toSeq).toSeq)

      val dm = Similarity.trainKmeans(emb, k = 3, iters = 1)
      ArtifactStore.doubleMatrix(spark, "c", "dm")(dm)
      val dmL = ArtifactStore.doubleMatrix(spark, "c", "dm")(sys.error("must load"))
      assert(dmL.map(_.toSeq).toSeq == dm.map(_.toSeq).toSeq)

      val t3 = Similarity.trainPqCodebooks(emb, m = 2, k = 4, iters = 1)
      ArtifactStore.doubleTensor3(spark, "c", "t3")(t3)
      val t3L = ArtifactStore.doubleTensor3(spark, "c", "t3")(sys.error("must load"))
      assert(t3L.map(_.map(_.toSeq).toSeq).toSeq == t3.map(_.map(_.toSeq).toSeq).toSeq)

      val im = Map(0 -> 1.5, 3 -> -2.25, 7 -> 0.0)
      ArtifactStore.intDoubleMap(spark, "c", "im")(im)
      assert(ArtifactStore.intDoubleMap(spark, "c", "im")(sys.error("must load")) == im)

      val lm = Map(0L -> 1.5, 99L -> -2.0)
      ArtifactStore.longDoubleMap(spark, "c", "lm")(lm)
      assert(ArtifactStore.longDoubleMap(spark, "c", "lm")(sys.error("must load")) == lm)

      val vocab = TextAnalysis.trainVocab(docs, 10)
      ArtifactStore.stringSeq(spark, "c", "vocab")(vocab)
      assert(ArtifactStore.stringSeq(spark, "c", "vocab")(sys.error("must load")) == vocab)

      val profiles = TextAnalysis.trainLanguageProfiles(docs)
      ArtifactStore.langProfiles(spark, "c", "profiles")(profiles)
      assert(ArtifactStore.langProfiles(spark, "c", "profiles")(sys.error("must load"))
        == profiles)

      val model = Bpe.train(docs, "text", numMerges = 8)
      ArtifactStore.bpeModel(spark, "c", "bpe")(model)
      val mL = ArtifactStore.bpeModel(spark, "c", "bpe")(sys.error("must load"))
      assert(mL.merges == model.merges)
      assert(mL.memo == model.memo)
    }
  }

  test("end-to-end: a second session loads every artifact instead of retraining") {
    // first "session": run registered queries that train IVF centroids,
    // radii, seed floors, k-means, PQ codebooks, profiles, vocab and BPE —
    // each lookup writes its parquet artifact under the temp root
    withTempRoot {
      def runAll(): Seq[Long] = Seq(
        SparkEntry.queries("q_similarity_topk")(spark, sfDir).count(),
        SparkEntry.queries("q_pipeline_semdedup")(spark, sfDir).count(),
        SparkEntry.queries("q_embed_pq")(spark, sfDir).count(),
        SparkEntry.queries("q_text_langid")(spark, sfDir).count(),
        SparkEntry.queries("q_text_oov")(spark, sfDir).count(),
        SparkEntry.queries("q_text_bpe_vocab")(spark, sfDir).count())
      SparkEntry.clearModelCachesForTest()
      val first = runAll()
      val trainsAfterFirst = ArtifactStore.trainsThisJvm.get()
      assert(trainsAfterFirst > 0, "first session trained nothing?")
      // "second session": the L1 caches are gone, only the parquet store
      // remains — every artifact must LOAD (train counter frozen), and the
      // query outputs must be unchanged
      SparkEntry.clearModelCachesForTest()
      val second = runAll()
      assert(ArtifactStore.trainsThisJvm.get() == trainsAfterFirst,
        "second session retrained instead of loading from the artifact store")
      assert(second == first)
      SparkEntry.clearModelCachesForTest() // leave no temp-rooted artifacts cached
    }
  }

  test("a concurrent complete publish is left in place — a reader holding " +
    "the artifact open across our publish never loses its files") {
    withTempRoot {
      val im = Map(1 -> 1.0, 2 -> 2.5)
      val p = ArtifactStore.artifactPath(spark, "corpusR", "im")
      def listing(): Seq[(String, Long)] = {
        val d = new java.io.File(p)
        d.listFiles().toSeq.map(f => f.getName -> f.lastModified).sorted
      }
      // The race, deterministically: OUR train thunk runs after the initial
      // _SUCCESS probe missed, and while it runs a CONCURRENT session
      // publishes a complete artifact at the same path (the nested
      // loadOrTrain below) and a reader binds to those files. Our publish
      // step must then leave dst untouched (delete only our tmp) — with the
      // delete-before-rename behavior, the reader's files vanish mid-read
      // and the re-published part files have different names.
      var concurrentFiles: Seq[(String, Long)] = Nil
      var readerDf: org.apache.spark.sql.DataFrame = null
      val got = ArtifactStore.intDoubleMap(spark, "corpusR", "im") {
        ArtifactStore.intDoubleMap(spark, "corpusR", "im")(im) // their publish
        concurrentFiles = listing()
        readerDf = spark.read.parquet(p) // reader binds to THEIR files
        im
      }
      assert(got == im) // we served our in-memory value
      assert(listing() == concurrentFiles,
        "publish replaced a complete concurrent artifact; a mid-read reader would fail")
      assert(readerDf.count() == im.size) // the open reader still resolves
      // and no tmp debris was left behind
      val parent = new java.io.File(p).getParentFile
      assert(!parent.listFiles().exists(_.getName.contains(".tmp-")),
        "loser's tmp dir not cleaned up")
    }
  }

  test("a half-written artifact (no _SUCCESS) is ignored and retrained") {
    withTempRoot {
      val p = ArtifactStore.artifactPath(spark, "corpusB", "im")
      // simulate a crashed writer: directory exists, no _SUCCESS marker
      new java.io.File(p).mkdirs()
      val im = Map(1 -> 1.0)
      assert(ArtifactStore.intDoubleMap(spark, "corpusB", "im")(im) == im)
      // and the retrain PUBLISHED over it: now it loads
      assert(ArtifactStore.intDoubleMap(spark, "corpusB", "im")(
        sys.error("must load")) == im)
    }
  }
}
