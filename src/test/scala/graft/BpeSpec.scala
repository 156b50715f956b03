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

  test("rebalance: zero-share and absent sources are dropped/ignored") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val out = Sampling.rebalanceSample(df, "source", "doc_id",
      Seq(("a", 1.0), ("b", 0.0), ("ghost", 0.0))).collect()
    assert(out.forall(_.getString(0) == "a"))
    assert(out.length == 2, "share 1.0 with T = n_a keeps all of a")
  }
}
