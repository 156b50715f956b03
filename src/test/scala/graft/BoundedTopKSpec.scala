package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.BoundedTopKAgg

/** The size-capped top-k aggregate: bit-identical to the unbounded
  * collect_list + array_sort + slice formulation, across partitionings
  * (partial/merge paths) and under ties.
  */
class BoundedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def slow(k: Int) = {
    val item = struct(col("neg"), col("id"))
    slice(array_sort(collect_list(item)), 1, k)
  }
  private def fast(k: Int) =
    BoundedTopKAgg.boundedTopK(struct(col("neg"), col("id")), k)

  test("equals the collect_list+slice form on random data, all partitionings") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      (i % 7L, -math.floor(rnd.nextDouble() * 100) / 10, rnd.nextInt(40).toLong))
    for (parts <- Seq(1, 3, 8); k <- Seq(1, 5, 64)) {
      val df = rows.toDF("query_id", "neg", "id").repartition(parts)
      val both = df.groupBy("query_id")
        .agg(slow(k).as("s"), fast(k).as("f"))
        .filter(not(col("s") === col("f")))
      assert(both.count() == 0, s"parts=$parts k=$k mismatch")
    }
  }

  test("ties keep deterministic (neg, id) order") {
    val df = Seq((1L, -1.0, 9L), (1L, -1.0, 3L), (1L, -1.0, 5L), (1L, -2.0, 7L))
      .toDF("query_id", "neg", "id")
    val top = df.groupBy("query_id").agg(fast(2).as("t"))
      .select(explode(col("t")).as("x")).select("x.id").as[Long].collect()
    assert(top.sameElements(Array(7L, 3L))) // (-2,7) then (-1,3)
  }

  test("groups smaller than k emit all their rows") {
    val df = Seq((1L, -1.0, 1L), (1L, -2.0, 2L)).toDF("query_id", "neg", "id")
    val n = df.groupBy("query_id").agg(fast(10).as("t"))
      .select(size(col("t"))).head().getInt(0)
    assert(n == 2)
  }

  test("null struct fields are rejected loudly, not ranked as 0.0") {
    // a zero-norm embedding's cosine is NULL (Divide by zero) — inside a
    // non-null struct it must not silently read as score 0.0
    val df = Seq((1L, Some(-1.0), 1L), (1L, None, 2L))
      .toDF("query_id", "neg", "id")
    val e = intercept[Exception] {
      df.groupBy("query_id").agg(fast(2).as("t")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bounded_top_k: null")), msgs(e).mkString(" | "))
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = BoundedTopKAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1), 3)
    val b = agg.createAggregationBuffer()
    b.add(-5.0, 1L); b.add(-1.0, 2L); b.add(-3.0, 3L); b.add(-9.0, 4L)
    val back = agg.deserialize(agg.serialize(b))
    assert(back.sortedItems.toSeq == Seq((-9.0, 4L), (-5.0, 1L), (-3.0, 3L)))
  }

  // ------------------------------------------------- row-generic variant

  import graft.functions.BoundedTopKRowsAgg.boundedTopKRows

  test("rows variant equals collect_list+slice on mixed string/long structs, all partitionings") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(i =>
      (i % 5L, s"h${rnd.nextInt(30)}", i.toLong))
    for (parts <- Seq(1, 3, 8); k <- Seq(1, 7, 50)) {
      val df = rows.toDF("key", "h", "id").repartition(parts)
      val item = struct(col("h"), col("id"))
      val both = df.groupBy("key")
        .agg(
          slice(array_sort(collect_list(item)), 1, k).as("s"),
          boundedTopKRows(item, k).as("f"))
        .filter(not(col("s") === col("f")))
      assert(both.count() == 0, s"parts=$parts k=$k mismatch")
    }
  }

  test("rows variant: trailing payload fields ride along without deciding order") {
    val df = Seq((1L, "b", 10L, "payB"), (1L, "a", 20L, "payA"), (1L, "c", 30L, "payC"))
      .toDF("key", "ord", "id", "pay")
    val item = struct(col("ord"), col("id"), struct(col("pay")).as("p"))
    val out = df.groupBy("key").agg(boundedTopKRows(item, 2).as("t"))
      .select(explode(col("t")).as("x")).select("x.p.pay").as[String].collect()
    assert(out.sameElements(Array("payA", "payB")))
  }

  test("rows variant rejects null order fields loudly") {
    val df = Seq((1L, Some("a"), 1L), (1L, None, 2L)).toDF("key", "ord", "id")
    val e = intercept[Exception] {
      df.groupBy("key")
        .agg(boundedTopKRows(struct(col("ord"), col("id")), 2).as("t")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bounded_top_k_rows: null")), msgs(e).mkString(" | "))
  }

  test("stratifiedSampleBounded == stratifiedSample on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source")
    for (quota <- Seq(1, 20, 10000)) {
      val w = graft.operators.Sampling.stratifiedSample(docs, "source", "doc_id", quota)
      val b = graft.operators.Sampling.stratifiedSampleBounded(docs, "source", "doc_id", quota)
      assert(w.exceptAll(b).isEmpty && b.exceptAll(w).isEmpty,
        s"quota=$quota: bounded twin diverges from the window form")
      assert(w.columns.sameElements(b.columns))
    }
  }
}
