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
}
