package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Sampling}

/** Subword tokenizer + mixture rebalancing on hand-computed fixtures (the
  * registered forms re-train and re-encode inside the DuckDB oracle).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("train: most-frequent pair first, lexicographic tie-break") {
    // "abab" ×3: pairs (a,b)=2·3=6 (overlap-free positions 1,3),
    // (b,a)=1·3=3; "cd" ×2: (c,d)=2. First merge must be (a,b).
    val docs = Seq("abab abab abab cd cd").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 2)
    assert(m.merges.head.left == "a" && m.merges.head.right == "b")
    assert(m.merges.head.pairCount == 6L)
    // after (a,b): "abab" -> [ab, ab] giving (ab,ab)=3; "cd" stays (c,d)=2
    assert(m.merges(1).left == "ab" && m.merges(1).right == "ab")
  }

  test("train: ties go to the lexicographically least (left, right) pair") {
    // words "xy" and "xz" with equal frequency: (x,y)=1, (x,z)=1 -> (x,y)
    val docs = Seq("xy xz").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 1)
    assert((m.merges.head.left, m.merges.head.right) == ("x", "y"))
  }

  test("encodeWord: left-to-right non-overlapping merge, matches memo") {
    val docs = Seq("aaa aaa").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 1)
    // (a,a) merges left-to-right: aaa -> [aa, a], never [a, aa]
    assert(m.encodeWord("aaa") == Seq("aa", "a"))
    assert(m.memo("aaa") == Seq("aa", "a"))
    assert(m.encodeWord("aaaa") == Seq("aa", "aa"))
  }

  test("training stops when no adjacent pair remains") {
    val docs = Seq("ab ab").toDF("text")
    val m = Bpe.train(docs, "text", numMerges = 10)
    assert(m.merges.length == 1, "one merge exhausts a 2-char vocabulary")
    assert(m.memo("ab") == Seq("ab"))
  }

  test("encode: OOV words take <unk>, token stream hashed in word order") {
    val train = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val m = Bpe.train(train, "text", numMerges = 10)
    val out = Bpe.encode(
      Seq((7L, "cd zz ab")).toDF("doc_id", "text"), "text", m).collect().head
    assert(out.getLong(1) == 3L)          // n_words
    // cd -> [cd], zz -> [<unk>], ab -> [ab]
    assert(out.getLong(2) == 3L)          // n_tokens
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("cd <unk> ab".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.getString(3) == expect)
  }

  test("tokenCounts agrees with encode's n_tokens") {
    val docs = Seq((1L, "ab ab cd"), (2L, "cd cd")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 4)
    val enc = Bpe.encode(docs, "text", m).select("doc_id", "n_tokens")
      .as[(Long, Long)].collect().toMap
    val cnt = Bpe.tokenCounts(docs, "text", m).as[(Long, Int)].collect().toMap
    assert(cnt.view.mapValues(_.toLong).toMap == enc)
  }

  test("rebalance: output mixture hits the target at the max servable total") {
    // current mix 80/20, target 50/50 -> the minority source binds:
    // T = 20/0.5 = 40, fracs: a = 0.5*40/80 = 0.25, b = 1.0 (threshold 'g')
    val rows = (1 to 80).map(i => (i.toLong, "a")) ++
      (81 to 100).map(i => (i.toLong, "b"))
    val df = rows.toDF("doc_id", "source")
    val out = Sampling.rebalanceSample(df, "source", "doc_id",
      Seq(("a", 0.5), ("b", 0.5))).collect()
    val bySrc = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(bySrc("b") == 20, "the binding source keeps everything")
    // source a admits by hash threshold 0x4000/0x10000 = exactly 25%
    assert(bySrc("a") > 0 && bySrc("a") < 80)
  }

  test("weighted sample: min-of-w ticket race, deterministic and partition-invariant") {
    val df = (1L to 50L).map(i => (i, 1 + (i % 4).toInt)).toDF("doc_id", "w")
    val a = Sampling.weightedSample(df.repartition(1), "doc_id", "w", k = 10)
      .select("rank", "doc_id", "ticket").collect().toSeq
    val b = Sampling.weightedSample(df.repartition(13), "doc_id", "w", k = 10)
      .select("rank", "doc_id", "ticket").collect().toSeq
    assert(a == b, "the race must not depend on partitioning")
    assert(a.map(_.getInt(0)) == (1 to 10), "dense 1-based ranks")
    // the min ticket equals the brute-force min over the w salted hashes
    val row = a.head
    val id = row.getLong(1)
    val w = 1 + (id % 4).toInt
    val brute = (1 to w).map { j =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"wt:$id:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.min
    assert(row.getString(2) == brute)
  }

  test("weighted sample: higher weight wins proportionally more often") {
    // two rows, weights 9 and 1: row A's min over 9 tickets beats row B's
    // single ticket ~90% of the time across independent salts
    val df = Seq((1L, 9), (2L, 1)).toDF("doc_id", "w")
    val wins = (0 until 40).count { s =>
      Sampling.weightedSample(df, "doc_id", "w", k = 1, salt = s"p$s")
        .collect().head.getLong(0) == 1L
    }
    assert(wins > 28, s"weight-9 row won only $wins/40 races")
  }

  test("rebalance: zero-share and absent sources are dropped/ignored") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val out = Sampling.rebalanceSample(df, "source", "doc_id",
      Seq(("a", 1.0), ("b", 0.0), ("ghost", 0.0))).collect()
    assert(out.forall(_.getString(0) == "a"))
    assert(out.length == 2, "share 1.0 with T = n_a keeps all of a")
  }

  test("compression stats: integer sums exact, ratios from those sums") {
    // model trained on the same corpus; 'aaaa aa' style docs compress well
    val docs = Seq(
      (1L, "aaaa aaaa", "x", 9L),
      (2L, "aaaa bb", "x", 7L),
      (3L, "cd cd cd", "y", 8L))
      .toDF("doc_id", "text", "source", "n_chars")
    val model = Bpe.train(docs, "text", numMerges = 3)
    val byDoc = Bpe.tokenCounts(docs, "text", model).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Bpe.compressionStats(docs, "text", model).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val x = rows("x")
    assert(x.getAs[Long]("n_docs") == 2L)
    assert(x.getAs[Long]("sum_chars") == 16L)
    assert(x.getAs[Long]("sum_words") == 4L)
    assert(x.getAs[Long]("sum_tokens") == byDoc(1L).toLong + byDoc(2L).toLong)
    val expected = math.rint(16.0 / x.getAs[Long]("sum_tokens") * 1e6) / 1e6
    assert(math.abs(x.getAs[Double]("chars_per_token") - expected) < 1e-9)
  }

  test("incremental trainer == rescan trainer on real corpus (merge table + memo)") {
    // the incremental pair-count/heap trainer must reproduce the original
    // rescan-everything trajectory EXACTLY — same winners, same counts, same
    // final memo — on the actual documents table (sf0.001), deep enough that
    // stale-heap-entry and delta-update paths are genuinely exercised
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val inc = Bpe.train(docs, "text", numMerges = 64)
    val base = Bpe.trainRescan(docs, "text", numMerges = 64)
    assert(inc.merges == base.merges)
    assert(inc.memo == base.memo)
  }

  test("incremental trainer == rescan trainer on adversarial repeats") {
    // overlapping self-pairs ("aaaa"), counts that fall and RETURN to an
    // earlier value (stale-entry revalidation), multi-occurrence words
    val docs = Seq(
      "aaaa aaaa aa baab abab baba bbbb",
      "abcabc abc cabca aabb ccaa",
      "xyxyxy yxyxyx xyx yxy").toDF("text")
    val inc = Bpe.train(docs, "text", numMerges = 32)
    val base = Bpe.trainRescan(docs, "text", numMerges = 32)
    assert(inc.merges == base.merges)
    assert(inc.memo == base.memo)
  }

  test("k-fold assignment: folds in range, deterministic, near-balanced") {
    val df = (0L until 1000L).map(i => (i, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val once = Sampling.kFoldAssign(df, "doc_id", k = 5)
    val again = Sampling.kFoldAssign(df.repartition(7), "doc_id", k = 5)
    assert(once.except(again).isEmpty && again.except(once).isEmpty)
    val counts = once.groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2, 3, 4))
    assert(counts.values.forall(c => c > 120 && c < 280),
      s"fold sizes far from balanced: $counts")
  }
}
