package graft

import org.scalatest.funsuite.AnyFunSuite

/** Systematic 100×-scale plan audit over EVERY registered query: no
  * accidental cartesian products, no driver-side loops hiding in the plans.
  * Since round 7 there is NO whitelist — the exact similarity queries serve
  * from IVF-pruned equi-join plans; the brute-force all-pairs forms are
  * spec-side differential baselines only.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("no registered query plans a cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoop"))
        Some(name)
      else None
    }
    assert(offenders.isEmpty, s"unexpected all-pairs joins in: $offenders")
  }

  test("hot-path plans run inside whole-stage codegen") {
    // The kernels were made native precisely to stay codegen'd; regression
    // here (e.g. an expression losing doGenCode, or a CodegenFallback
    // slipping into the projection) would silently cost 10x at scale.
    val spark0 = spark
    val checks = Seq(
      "q_aggregate", "q_dedup_near", "q_dedup_simhash", "q_similarity_topk",
      "q_text_fingerprint", "q_text_langid")
    checks.foreach { name =>
      val qe = SparkEntry.queries(name)(spark0, sfDir).queryExecution
      qe.toRdd.count() // AQE only inserts codegen spans into the FINAL plan
      val plan = qe.executedPlan.toString
      // codegen'd stages print as "*(n) Operator" in the final plan
      assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined,
        s"$name plan has no whole-stage-codegen span:\n$plan")
    }
  }

  test("map-only queries plan no exchange at all") {
    // these operators' scale story is "embarrassingly parallel projection /
    // filter" — a shuffle appearing in any of them is a design regression
    val mapOnly = Seq(
      "q_text_quality", "q_sample_hash", "q_text_stats", "q_text_langid",
      "q_text_fingerprint", "q_multimodal_meta", "q_multimodal_frames",
      "q_embed_quantize", "q_text_repetition", "q_text_redact", "q_text_oov",
      "q_text_chunks", "q_split_dataset")
    mapOnly.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$name claims map-only but plans a shuffle:\n$plan")
    }
  }

  test("limited top-k queries plan TakeOrdered, never a global sort") {
    // a k-row answer must cost per-partition k + coordinator k; a full
    // Sort+Exchange before the limit is the scale regression this guards
    val topK = Seq("q_text_retrieval", "q_olap_priority", "q_olap_returns")
    topK.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name should plan TakeOrderedAndProject:\n$plan")
    }
  }

  test("erasure sweep plans a broadcast anti-join, not a shuffled one") {
    // the tombstone list must broadcast so the event log never shuffles
    val plan = SparkEntry.queries("q_curation_forget")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"q_curation_forget should broadcast-anti-join the tombstones:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q_curation_forget shuffled the big side:\n$plan")
  }

  test("Q5-shaped star join broadcasts every dimension chain") {
    // region/nation/supplier/customer must all arrive as broadcast builds;
    // a shuffled dim join at 100 TB moves the fact table for nothing
    val qe = SparkEntry.queries("q_olap_volume")(spark, sfDir).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 3,
      s"q_olap_volume expected ≥3 broadcast dim joins, got $nBroadcast:\n$plan")
  }

  test("pricing rollup pushes the shipdate cutoff into the parquet scan") {
    // the cutoff must reach PushedFilters — a post-scan filter reads the
    // whole fact table at 100 TB
    val qe = SparkEntry.queries("q_olap_pricing")(spark, sfDir).queryExecution
    val scan = qe.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_shipdate"),
      s"q_olap_pricing scan lost the shipdate pushdown:\n$scan")
  }

  test("every query with an oracle entry is registered, and vice versa where required") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle entries without a query: ${o -- q}")
    // every registered query is oracle-checked — the last rows-only entries
    // (simhash / winnowing / frames) graduated in round 8 via md5-portable
    // twins whose oracles replay the full pipelines in SQL
    val rowsOnly = q -- o
    assert(rowsOnly.isEmpty,
      s"unexpected rows-only queries (add an oracle or whitelist deliberately): $rowsOnly")
  }
}
