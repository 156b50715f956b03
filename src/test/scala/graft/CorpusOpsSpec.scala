package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Round-6 corpus operators: repetition signals, regex redaction, vocabulary
  * coverage, epoch shuffle, incremental near-dedup.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // ------------------------------------------------------------ repetition

  test("repetitionStats: mode fractions computed over token/2-gram/3-gram multisets") {
    // "b b b a c": top unigram b=3/5; bigrams [b b, b b, b a, a c] → "b b"=2/4;
    // trigrams [b b b, b b a, b a c] → each once → 1/3
    val r = TextAnalysis.repetitionStats(docs((1L, "b b b a c"))).head()
    assert(r.getAs[Int]("n_tokens") == 5)
    assert(r.getAs[Double]("top_unigram_ratio") == 0.6)
    assert(r.getAs[Double]("top_bigram_ratio") == 0.5)
    assert(r.getAs[Double]("top_trigram_ratio") == math.rint(1.0 / 3 * 1e6) / 1e6)
  }

  test("repetitionStats: short documents get 0.0 for undefined gram orders") {
    val rows = TextAnalysis.repetitionStats(docs((1L, "x"), (2L, "x y")))
      .orderBy("doc_id").collect()
    // one token: unigram ratio 1.0, no bigrams/trigrams
    assert(rows(0).getAs[Double]("top_unigram_ratio") == 1.0)
    assert(rows(0).getAs[Double]("top_bigram_ratio") == 0.0)
    assert(rows(0).getAs[Double]("top_trigram_ratio") == 0.0)
    // two tokens: one bigram (ratio 1.0), no trigrams
    assert(rows(1).getAs[Double]("top_bigram_ratio") == 1.0)
    assert(rows(1).getAs[Double]("top_trigram_ratio") == 0.0)
  }

  test("repetitionStats: keep thresholds compare unrounded ratios") {
    // 30 distinct tokens: ratios 1/30, 1/29, 1/28 — all under the default
    // thresholds → keep; "a a a a" → reject. (A short all-distinct doc still
    // rejects: 1/(n-1) exceeds the bigram threshold for n < 16 — by design,
    // repetition fractions are only meaningful on long-enough documents.)
    val rows = TextAnalysis.repetitionStats(
      docs((1L, (1 to 30).map(i => s"t$i").mkString(" ")), (2L, "a a a a")))
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Boolean]("keep"))
    assert(!rows(1).getAs[Boolean]("keep"))
  }

  // --------------------------------------------------------------- redact

  test("redact replaces every match and counts them") {
    val r = TextAnalysis.redact(
      docs((1L, "mail me at bob now bob"), (2L, "nothing here")),
      pattern = "bob", replacement = "<x>")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_matches") == 2)
    assert(r(0).getAs[String]("redacted") == "mail me at <x> now <x>")
    assert(r(1).getAs[Int]("n_matches") == 0)
    assert(r(1).getAs[String]("redacted") == "nothing here")
  }

  test("redact with an email-shaped PII pattern") {
    val r = TextAnalysis.redact(
      docs((1L, "contact bob@corp.example or sue@dev.example today")),
      pattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
      replacement = "<email>").head()
    assert(r.getAs[Int]("n_matches") == 2)
    assert(r.getAs[String]("redacted") == "contact <email> or <email> today")
  }

  // -------------------------------------------------------- vocab coverage

  test("vocabCoverage: OOV counts against an explicit vocab") {
    val r = TextAnalysis.vocabCoverage(
      docs((1L, "a b c d"), (2L, "a a a a"), (3L, "z z z z")),
      vocab = Seq("a", "b"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_oov") == 2 && r(0).getAs[Double]("oov_rate") == 0.5)
    assert(r(1).getAs[Int]("n_oov") == 0 && r(1).getAs[Double]("oov_rate") == 0.0)
    assert(r(2).getAs[Int]("n_oov") == 4 && r(2).getAs[Double]("oov_rate") == 1.0)
  }

  test("vocabCoverage rejects an empty vocabulary loudly") {
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabCoverage(docs((1L, "a")), vocab = Seq.empty)
    }
  }

  test("trainVocab returns the top-k terms with deterministic ties") {
    val v = TextAnalysis.trainVocab(
      docs((1L, "b b b a a c"), (2L, "d a")), k = 2)
    assert(v == Seq("a", "b")) // a=3, b=3 → tie broken by term asc
  }

  // ---------------------------------------------------------- epoch shuffle

  private val ids = (0L until 64L).map(i => (i, s"t$i")).toDF("doc_id", "text")

  test("epochShuffle: positions are a contiguous 1..n ranking per shard") {
    val out = Sampling.epochShuffle(ids, "doc_id", epoch = 1)
    assert(out.count() == 64)
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"),
        countDistinct(col("pos")).as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
    assert(bad.isEmpty, "positions must be exactly 1..n within every shard")
  }

  test("epochShuffle is deterministic per epoch and differs across epochs") {
    def run(e: Int): Seq[(Long, String, Int)] =
      Sampling.epochShuffle(ids, "doc_id", epoch = e)
        .select("doc_id", "shard", "pos").as[(Long, String, Int)]
        .collect().sortBy(_._1).toSeq
    assert(run(1) == run(1))
    assert(run(1) != run(2), "different epochs must permute differently")
  }

  // ------------------------------------------------------ full curation

  test("fullCurationProfile: adding gates only ever shrinks each language's count") {
    import graft.operators.{Curation, Dedup, TextAnalysis}
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val labels = Dedup.nearDedupLabels(corpus,
      Dedup.nearDuplicatePairs(corpus, n = 3, threshold = 0.7))
    val profiles = TextAnalysis.trainLanguageProfiles(corpus)
    val v1 = Curation.curatedLanguageProfile(corpus, labels, profiles)
      .select(col("predicted_lang"), col("n_docs").as("n_v1"))
    val full = Curation.fullCurationProfile(corpus, labels, profiles)
      .select(col("predicted_lang"), col("n_docs").as("n_full"))
    // quality keep implies the v1 minTokens gate, and the repetition gate
    // only removes more — so per language: 0 < n_full <= n_v1
    val joined = full.join(v1, "predicted_lang").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_full") > 0 &&
        r.getAs[Long]("n_full") <= r.getAs[Long]("n_v1"),
        s"gate monotonicity violated for ${r.getAs[String]("predicted_lang")}")
    }
  }

  // ------------------------------------------------------------ norm stats

  test("normStats: per-label norm accounting with decimal-exact average") {
    val emb = Seq(
      (1L, Array(3f, 4f), 0),   // norm 5
      (2L, Array(6f, 8f), 0),   // norm 10
      (3L, Array(0f, 0f), 1))   // norm 0
      .toDF("vec_id", "embedding", "label")
    val r = graft.operators.Similarity.normStats(emb)
      .orderBy("label").collect()
    assert(r(0).getAs[Long]("n_vecs") == 2L)
    assert(r(0).getAs[Double]("min_norm") == 5.0)
    assert(r(0).getAs[Double]("max_norm") == 10.0)
    assert(r(0).getAs[Double]("avg_norm") == 7.5)
    assert(r(1).getAs[Double]("avg_norm") == 0.0)
  }

  // ----------------------------------------------------- incremental dedup

  // A/B near-identical long docs; C unrelated. Word-3-gram Jaccard of
  // base vs mut is high (one token changed); vs C is 0.
  private val base = (1 to 40).map(i => s"w$i").mkString(" ")
  private val mut = (("x" +: (2 to 40).map(i => s"w$i"))).mkString(" ")
  private val unrelated = (1 to 40).map(i => s"z$i").mkString(" ")

  test("incrementalNearDedup: best existing match, sentinels for new docs") {
    val existing = docs((10L, base), (20L, base), (30L, unrelated))
    val incoming = docs((101L, mut), (102L, "q r s t u v w x y z a b c d e f"))
    val out = Dedup.incrementalNearDedup(existing, incoming, threshold = 0.5)
      .orderBy("doc_id").collect()
    // 101 matches BOTH 10 and 20 at the same jaccard → tie to the lowest id
    assert(out(0).getAs[Long]("doc_id") == 101L)
    assert(out(0).getAs[Long]("matched_id") == 10L)
    assert(out(0).getAs[Double]("jaccard") > 0.9)
    // 102 matches nothing → sentinel row, still present
    assert(out(1).getAs[Long]("doc_id") == 102L)
    assert(out(1).getAs[Long]("matched_id") == -1L)
    assert(out(1).getAs[Double]("jaccard") == 0.0)
  }

  test("incrementalNearDedup picks the HIGHEST-jaccard match, not the lowest id") {
    // existing 10 = one-token mutation of mut (high J); 20 = exact text (J=1)
    val existing = docs((10L, base), (20L, mut))
    val incoming = docs((101L, mut))
    val r = Dedup.incrementalNearDedup(existing, incoming, threshold = 0.5).head()
    assert(r.getAs[Long]("matched_id") == 20L)
    assert(r.getAs[Double]("jaccard") == 1.0)
  }

  test("incrementalNearDedup: docs without shingles surface as new") {
    val existing = docs((10L, base))
    val incoming = docs((101L, "just two")) // < 3 tokens → no 3-gram shingles
    val r = Dedup.incrementalNearDedup(existing, incoming).head()
    assert(r.getAs[Long]("matched_id") == -1L && r.getAs[Double]("jaccard") == 0.0)
  }

  test("incrementalNearDedup never compares corpus rows to each other") {
    // two identical EXISTING docs and an unrelated incoming doc: no pair
    // may surface — candidates are cross-side only
    val existing = docs((10L, base), (20L, base))
    val incoming = docs((101L, unrelated))
    val r = Dedup.incrementalNearDedup(existing, incoming).head()
    assert(r.getAs[Long]("matched_id") == -1L)
  }

  // --------------------------------------------------------- erasure sweep

  test("forgetUsers: every tombstoned user's events vanish, others all survive") {
    val events = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L))
      .toDF("event_id", "user_id")
    val tombstones = Seq(10L, 10L, 99L).toDF("user_id") // dupes + unknown ok
    val r = graft.operators.Curation.forgetUsers(events, tombstones)
      .orderBy("event_id").collect()
    assert(r.map(_.getAs[Long]("event_id")).toSeq == Seq(3L, 4L))
    assert(r.map(_.getAs[Long]("user_id")).toSeq == Seq(20L, 30L))
  }
}
