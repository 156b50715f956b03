package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("asset metadata: mime cycling, byte length, frame count") {
    val docs = corpus(
      (0L, "x" * 100), (1L, "y" * 256), (2L, "z" * 257), (3L, "w" * 1000))
    val m = Multimodal.metadata(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(m(0L) == (("image/png", 100, 1)))
    assert(m(1L) == (("audio/wav", 256, 1)))
    assert(m(2L) == (("video/mp4", 257, 2)))
    assert(m(3L) == (("image/png", 1000, 4)))
  }

  test("frame features: counts, stride sampling, determinism") {
    val docs = corpus((1L, "a" * 1000)) // 4 frames of 256 (last short)
    val r = Multimodal.frameFeatures(docs, stride = 2).head()
    assert(r.getAs[Int]("n_frames") == 4)
    assert(r.getAs[Int]("n_sampled") == 2) // frames 0 and 2
    val again = Multimodal.frameFeatures(docs, stride = 2).head()
    assert(r.getAs[Long]("first_frame_feature") == again.getAs[Long]("first_frame_feature"))
  }

  test("identical payload prefixes share the first frame feature") {
    val shared = "s" * 300
    val docs = corpus((1L, shared + "tail one"), (2L, shared + "other ending"))
    val feats = Multimodal.frameFeatures(docs)
      .select("doc_id", "first_frame_feature").as[(Long, Long)].collect().toMap
    assert(feats(1L) == feats(2L)) // first 256 bytes identical
  }

  test("stub decode via mapPartitions matches the native frame math") {
    val docs = corpus((1L, "q" * 600), (2L, "r" * 100))
    val decoded = Multimodal.decodeWithStub(docs).collect()
      .map(d => d.docId -> d).toMap
    assert(decoded(1L).nFrames == 3)
    assert(decoded(2L).nFrames == 1)
    assert(decoded(1L).mime == "audio/wav")
    // deterministic: same payload -> same features
    val again = Multimodal.decodeWithStub(docs).collect().map(d => d.docId -> d).toMap
    assert(decoded(1L).features.sameElements(again(1L).features))
    // frame counts agree with the native expression path
    val native = Multimodal.frameFeatures(docs)
      .select("doc_id", "n_frames").as[(Long, Int)].collect().toMap
    assert(decoded.forall { case (id, d) => d.nFrames == native(id) })
  }

  test("empty payload yields zero frames, not phantom ones") {
    // sequence(0, -1) defaults to a descending step and yields [0, -1]; the
    // guard must keep n_frames == n_sampled == 0 with a null first feature
    val docs = Seq((0L, ""), (1L, "x")).toDF("doc_id", "text")
    val rows = Multimodal.frameFeatures(docs).orderBy("doc_id").collect()
    assert(rows(0).getInt(1) == 0 && rows(0).getInt(2) == 0 && rows(0).isNullAt(3))
    assert(rows(1).getInt(1) == 1 && rows(1).getInt(2) == 1 && !rows(1).isNullAt(3))
  }

  test("resize through the decoder seam: content decimated, lengths honor the contract") {
    val docs = Seq((0L, "abcdefghij")).toDF("doc_id", "text")
    val r = Multimodal.resizeWithStub(docs, factor = 4).collect().head
    assert(r.byteLen == 10 && r.byteLenResized == 3)
    assert(r.resized.sameElements("aei".getBytes)) // every 4th byte
    // whole corpus: ceil contract holds for every mime
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = Multimodal.resizeWithStub(corpus, factor = 4)
      .filter(a => a.byteLenResized != (a.byteLen + 3) / 4).count()
    assert(bad == 0)
  }

  test("the seam carries a REAL codec: ImageIO PNG fixtures decode and resize") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // deterministic gradient images, PNG-encoded via the JDK codec
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for { y <- 0 until h; x <- 0 until w }
        img.setRGB(x, y, (x * 2027 + y * 1823 + seed * 65537) & 0xffffff)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val fixtures = Seq(
      (1L, "image/png", png(8, 5, 1)),
      (2L, "image/png", png(3, 3, 7)),
      (3L, "image/png", png(16, 2, 42)))
    val df = fixtures.toDF("doc_id", "mime", "payload")

    // decode: one feature per pixel row, identical to a driver-side decode
    // of the same bytes — the seam preserves payloads losslessly
    val out = Multimodal.decodeAssets(df, Multimodal.ImageIoDecoder)
      .collect().map(d => d.docId -> d).toMap
    assert(out(1L).nFrames == 5 && out(2L).nFrames == 3 && out(3L).nFrames == 2)
    fixtures.foreach { case (id, mime, bytes) =>
      assert(out(id).features.sameElements(
        Multimodal.ImageIoDecoder.decode(mime, bytes)),
        s"doc $id: features through the seam differ from a local decode")
    }

    // resize halves the pixel dimensions and re-encodes a VALID image
    val resized = Multimodal.resizeAssets(df, factor = 2, Multimodal.ImageIoDecoder)
      .collect().map(r => r.docId -> r).toMap
    val r1 = ImageIO.read(new java.io.ByteArrayInputStream(resized(1L).resized))
    assert(r1.getWidth == 4 && r1.getHeight == 2)
    val r2 = ImageIO.read(new java.io.ByteArrayInputStream(resized(2L).resized))
    assert(r2.getWidth == 1 && r2.getHeight == 1)
    // a non-image payload is rejected loudly, per the repo's edge policy
    val junk = Seq((9L, "image/png", "not a png".getBytes)).toDF("doc_id", "mime", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAssets(junk, Multimodal.ImageIoDecoder).collect()
    }
    assert(e.getMessage != null)
  }

  test("real corpus: every doc decodes, features align with metadata") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val joined = Multimodal.metadata(docs).as("m")
      .join(Multimodal.frameFeatures(docs).as("f"), "doc_id")
      .filter(col("m.n_frames") =!= col("f.n_frames"))
    assert(joined.count() == 0)
  }
}
