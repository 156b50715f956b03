package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, TextAnalysis}

/** Pins the sketch estimates' error against their exact twins on the real
  * corpus — the rows-only contract for the approximate queries.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sfDir)

  test("HLL distinct-term counts stay within 3x the advertised rsd of exact") {
    val exact = Sketches.vocabBySource(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Sketches.vocabBySourceApprox(docs, rsd = 0.05).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, (exDistinct, exTotal)) =>
      val (apDistinct, apTotal) = approx(src)
      assert(apTotal == exTotal, s"plain counts must be exact ($src)")
      val relErr = math.abs(apDistinct - exDistinct).toDouble / exDistinct
      assert(relErr <= 0.15,
        s"$src: HLL estimate $apDistinct vs exact $exDistinct (relErr $relErr)")
    }
  }

  test("approximate quantiles stay within one token-count step of exact") {
    val exact = TextAnalysis.tokenDistribution(docs).collect()
      .map(r => r.getString(0) -> Seq("p25", "p50", "p75", "p90").map(r.getAs[Double])).toMap
    val approx = Sketches.tokenDistributionApprox(docs).collect()
      .map(r => r.getString(0) -> Seq("p25", "p50", "p75", "p90").map(r.getAs[Double])).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, ex) =>
      approx(src).zip(ex).zipWithIndex.foreach { case ((a, e), i) =>
        // GK returns an ACTUAL element at rank-error <= n/accuracy; the exact
        // form interpolates BETWEEN elements — on small groups the nearest
        // element can sit a full inter-element gap away, so the contract is
        // 5% relative (floor 3 tokens), which holds at every group size
        assert(math.abs(a - e) <= math.max(3.0, 0.05 * e),
          s"$src quantile #$i: approx $a vs exact $e")
      }
    }
  }
}
