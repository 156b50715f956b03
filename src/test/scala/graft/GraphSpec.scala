package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Pins PageRank's semantics three independent ways: a hand-rolled
  * reference recursion on a tiny graph (same integer picorank arithmetic),
  * rank-mass conservation up to the documented floor-division leak, and
  * partitioning invariance (exact integer sums make the result independent
  * of physical layout — bit-for-bit, not approximately).
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** The operator's integer recursion replicated driver-side. */
  private def referencePr(
      edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val Scale = 1000000000000L
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.size
    val baseQ = (Scale * 15L / 100L) / n
    var pr = nodes.map(_ -> Scale / n).toMap
    (1 to iters).foreach { _ =>
      val sums = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (s, _, w) => pr(s) * w / outW(s) }.sum
      }.toMap
      pr = nodes.map(v => v -> (baseQ + sums(v) * 85L / 100L)).toMap
    }
    pr
  }

  test("matches the hand-rolled recursion on a small bipartite graph") {
    import spark.implicits._
    val half = Seq(("C1", "S1", 2L), ("C1", "S2", 1L), ("C2", "S2", 1L))
    val both = half ++ half.map { case (a, b, w) => (b, a, w) }
    val rows = Graph.pageRank(both.toDF("src", "dst", "w"), iters = 3)
      .collect()
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referencePr(both, 3)
    assert(got.keySet == want.keySet)
    want.foreach { case (node, prq) =>
      assert(got(node) == prq, s"$node: got ${got(node)}, want $prq")
    }
    // the double reading is exactly pr_q / 1e12
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble / 1000000000000.0)
    }
    // C1 sits on every S1 walk and half the S2 walks — it must dominate
    assert(got("C1") > got("C2") && got("C1") > got("S2"))
  }

  test("rank mass is conserved up to the floor-division leak") {
    val edges = Graph.purchaseGraph(
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
    val pr = Graph.pageRank(edges).collect().map(_.getDouble(2))
    // each of the |E| floor divisions leaks < 1e-12 per iteration
    assert(math.abs(pr.sum - 1.0) < 1e-5,
      s"rank mass drifted: ${pr.sum} over ${pr.length} nodes")
  }

  /** The DANGLING recursion replicated driver-side: nodes = src ∪ dst, sink
    * mass redistributed uniformly each sweep.
    */
  private def referencePrDangling(
      edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val Scale = 1000000000000L
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val baseQ = (Scale * 15L / 100L) / n
    var pr = nodes.map(_ -> Scale / n).toMap
    (1 to iters).foreach { _ =>
      val dShare = nodes.filterNot(outW.contains).map(pr).sum / n
      val sums = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (s, _, w) => pr(s) * w / outW(s) }.sum
      }.toMap
      pr = nodes.map(v =>
        v -> (baseQ + (sums.getOrElse(v, 0L) + dShare) * 85L / 100L)).toMap
    }
    pr
  }

  test("dangling nodes: sink mass redistributes, total mass is conserved") {
    import spark.implicits._
    // A → B → C, C is a sink (no out-edges); A has no in-edges
    val edges = Seq(("A", "B", 1L), ("B", "C", 1L))
    val rows = Graph.pageRank(edges.toDF("src", "dst", "w"), iters = 3).collect()
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referencePrDangling(edges, 3)
    assert(got.keySet == want.keySet && got.keySet == Set("A", "B", "C"))
    want.foreach { case (node, prq) =>
      assert(got(node) == prq, s"$node: got ${got(node)}, want $prq")
    }
    // the sink's mass did not vanish: total stays ~1.0 (floor leaks only)
    val total = rows.map(_.getLong(1)).sum
    assert(total > 1000000000000L - 100L && total <= 1000000000000L,
      s"mass not conserved on a sink graph: $total picoranks")
    // C accumulates the chain's mass; A holds only base + dangling share
    assert(got("C") > got("A"))
  }

  test("dangling mass recursion matches on a heavier mixed graph") {
    import spark.implicits._
    // two sinks (Z1, Z2), one source-only node (S), weighted fan-out
    val edges = Seq(
      ("S", "A", 3L), ("S", "B", 1L), ("A", "Z1", 2L), ("A", "B", 1L),
      ("B", "Z2", 5L), ("Z0", "A", 1L)) // Z0: source-only; Z1/Z2: sinks
    val rows = Graph.pageRank(edges.toDF("src", "dst", "w"), iters = 4).collect()
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referencePrDangling(edges, 4)
    assert(got == want,
      s"diff=${(got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)}")
  }

  test("triangles: lists each triangle exactly once on a constructed graph") {
    import spark.implicits._
    // 4-clique minus the (1,4) edge → exactly the triangles (1,2,3), (2,3,4)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 3L), (2L, 3L, 4L)), got)
  }

  test("result is partitioning-invariant bit-for-bit") {
    val edges = Graph.purchaseGraph(
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
    def runAt(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(df).collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    assert(runAt(edges).sameElements(runAt(edges.repartition(7))))
  }

  test("connected components: min labels and sizes on a two-component graph") {
    import spark.implicits._
    // chain 1-2-3 (component 1, size 3) and pair 10-11 (component 10, size 2)
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val rows = Graph.connectedComponents(edges).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }
}
