package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.operators.Quality

class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rules(text: String): Row =
    Quality.qualityRules(
      Seq((1L, text)).toDF("doc_id", "text"),
      minTokens = 3, maxTokens = 10, minMeanLen = 2.0, maxMeanLen = 5.0,
      maxSymbolRatio = 0.2, stopwords = Seq("a", "the"))
      .head()

  private def flag(r: Row, name: String): Boolean = r.getAs[Boolean](name)

  test("a clean document passes every rule") {
    val r = rules("the cat sat on mats")
    assert(flag(r, "r_tokens") && flag(r, "r_mean_len") &&
      flag(r, "r_symbol") && flag(r, "r_stopword") && flag(r, "keep"))
  }

  test("each rule fails independently for its own reason") {
    // too few tokens (2 < 3); other rules may pass
    val short = rules("the cat")
    assert(!flag(short, "r_tokens") && !flag(short, "keep"))

    // mean token length too high: 3 tokens of len 8 → mean 8 > 5
    val longTokens = rules("abcdefgh abcdefgh the")
    assert(!flag(longTokens, "r_mean_len") && !flag(longTokens, "keep"))

    // symbol-heavy: over 20% of chars outside [a-z0-9 ]
    val symbols = rules("the !!! ### cat $$$")
    assert(!flag(symbols, "r_symbol") && !flag(symbols, "keep"))

    // no stopword present
    val noStop = rules("cat sat mat dog log")
    assert(!flag(noStop, "r_stopword") && !flag(noStop, "keep"))
  }

  test("mean token length uses the separator identity (exact under repeats)") {
    // 4 tokens, lengths 3+3+3+5 = 14 chars, text len = 14 + 3 separators
    val r = rules("the cat sat mouse")
    assert(math.abs(r.getAs[Double]("mean_token_len") - 14.0 / 4) < 1e-9)
    assert(r.getAs[Int]("n_tokens") == 4)
  }

  test("rankBlend: per-source percentile ranks, blend is their mean") {
    // source A: three docs with strictly increasing token counts; ttr and
    // mlen constant -> pr_ttr/pr_mlen rank purely by doc_id
    val docs = Seq(
      (1L, "a b", "A"), (2L, "a b c d", "A"), (3L, "a b c d e f", "A"),
      (4L, "x", "B"))
      .toDF("doc_id", "text", "source")
    val r = Quality.rankBlend(docs).orderBy("doc_id").collect()
    // A: n=3, denom=2 -> pr_tokens = 0, 0.5, 1
    assert(r(0).getAs[Double]("pr_tokens") == 0.0)
    assert(r(1).getAs[Double]("pr_tokens") == 0.5)
    assert(r(2).getAs[Double]("pr_tokens") == 1.0)
    // ttr = 1.0 and mlen = 1.0 for all of A -> ties resolved by doc_id
    assert(r(0).getAs[Double]("pr_ttr") == 0.0 && r(2).getAs[Double]("pr_ttr") == 1.0)
    // blend is the mean of the three prs
    assert(r(1).getAs[Double]("blend") ==
      math.rint((0.5 + 0.5 + 0.5) / 3 * 1e6) / 1e6)
    // singleton source: denom clamps to 1, all prs 0
    assert(r(3).getAs[Double]("blend") == 0.0)
  }

  test("referentialAudit: orphan counts per relation, zeros emitted") {
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "fk")
    val parent = Seq((10L, "a"), (11L, "b")).toDF("pk", "v")
    val r = Quality.referentialAudit(Seq(
      ("child->parent", child, "fk", parent, "pk"),
      ("parent->parent", parent, "pk", parent, "pk")))
      .orderBy("relation").collect()
    assert(r.length == 2)
    assert(r(0).getAs[String]("relation") == "child->parent")
    assert(r(0).getAs[Long]("n_child") == 3L)
    assert(r(0).getAs[Long]("n_orphans") == 1L) // fk=99 has no parent
    assert(r(1).getAs[Long]("n_orphans") == 0L) // the zero is data too
  }

  test("percentileGate: per-source interpolated quantile, inclusive at the cut") {
    // source A token counts: 1,2,3,4 → p25 = 1 + 0.75·(2−1) = 1.75
    // source B token counts: 10,20   → p25 = 10 + 0.25·(20−10) = 12.5
    val docs = Seq(
      (0L, "x", "A"), (1L, "x y", "A"), (2L, "x y z", "A"), (3L, "w x y z", "A"),
      (10L, Seq.fill(10)("t").mkString(" "), "B"),
      (11L, Seq.fill(20)("t").mkString(" "), "B")
    ).toDF("doc_id", "text", "source")
    val got = Quality.percentileGate(docs, q = 0.25)
      .select("doc_id", "n_tokens", "thr", "keep")
      .as[(Long, Int, Double, Boolean)].collect()
      .map { case (id, n, t, k) => id -> (n, t, k) }.toMap
    assert(got(0L) == ((1, 1.75, false)))  // below the source-A cut
    assert(got(1L) == ((2, 1.75, true)))   // above it
    assert(got(3L) == ((4, 1.75, true)))
    assert(got(10L) == ((10, 12.5, false))) // source B has its own cut
    assert(got(11L) == ((20, 12.5, true)))
  }

  test("percentileGate: exact quantile value is inclusive (>= thr keeps)") {
    // counts 1,3 → p50 = 2; count exactly 2 must be kept (>=, not >)
    val docs = Seq(
      (0L, "x", "S"), (1L, "x y", "S"), (2L, "x y z", "S")
    ).toDF("doc_id", "text", "source")
    val got = Quality.percentileGate(docs, q = 0.5)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(!got(0L) && got(1L) && got(2L))
  }

  test("table fingerprint: partitioning-invariant, byte-sensitive, null-safe") {
    import org.apache.spark.sql.functions.desc
    val df = Seq((1L, "aaa", "x"), (2L, "bbb", "x"), (3L, "ccc", "y"))
      .toDF("id", "payload", "grp")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Quality.tableFingerprint(d, "grp", Seq("id", "payload"))
        .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_rows"),
          r.getAs[String]("fp_sum"))).toSet
    val base = fp(df)
    // commutative sum ⇒ any repartitioning/ordering yields the same artifact
    assert(fp(df.repartition(7).sortWithinPartitions(desc("payload"))) == base)
    // one flipped byte in one row changes that group's sum, not the other's
    val corrupt = fp(Seq((1L, "aab", "x"), (2L, "bbb", "x"), (3L, "ccc", "y"))
      .toDF("id", "payload", "grp"))
    assert(corrupt.find(_._1 == "x") != base.find(_._1 == "x"))
    assert(corrupt.find(_._1 == "y") == base.find(_._1 == "y"))
    // the '<null>' sentinel keeps a NULL column from aliasing field shifts:
    // (a, NULL) and (NULL, a) must fingerprint differently
    val a = fp(Seq((1L, null.asInstanceOf[String], "x")).toDF("id", "payload", "grp"))
    val b = Quality.tableFingerprint(
      Seq((null.asInstanceOf[java.lang.Long], "1", "x")).toDF("id", "payload", "grp"),
      "grp", Seq("id", "payload"))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_rows"),
        r.getAs[String]("fp_sum"))).toSet
    assert(a != b)
  }

  test("skew profile: top-k shares and count distribution, hand-computed") {
    // key h: 6 rows, m: 3, a/b/c: 1 each -> n_keys=5, n_rows=12
    val df = (Seq.fill(6)("h") ++ Seq.fill(3)("m") ++ Seq("a", "b", "c"))
      .toDF("k")
    val rows = Quality.skewProfile(df, "k", k = 3).orderBy("rank").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "h", 6L), (2, "m", 3L), (3, "a", 1L)),
      "count-desc order with key tiebreak")
    assert(rows.head.getDouble(3) == 0.5)
    assert(rows.head.getLong(4) == 5L && rows.head.getLong(5) == 12L)
    // counts sorted: 1,1,1,3,6 -> p50 = 1.0, max = 6
    assert(rows.head.getDouble(6) == 1.0)
    assert(rows.head.getLong(8) == 6L)
  }

  test("skew profile: empty input returns the declared schema, no NPE") {
    val df = Seq("h").toDF("k").limit(0)
    val out = Quality.skewProfile(df, "k", k = 3)
    assert(out.columns.toSeq == Seq("rank", "k", "cnt", "share", "n_keys",
      "n_rows", "p50_cnt", "p99_cnt", "max_cnt"))
    assert(out.count() == 0L)
  }
}
