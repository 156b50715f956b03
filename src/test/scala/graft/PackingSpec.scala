package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("greedy packing matches a sequential reference implementation") {
    val sizes = (0 until 120).map(i => i.toLong -> (i % 23 + 1)).toMap
    val docs = docsOf(sizes.toSeq.sortBy(_._1).map { case (id, n) =>
      (id, Seq.fill(n)("w").mkString(" "))
    }: _*)
    val budget = 32
    val packed = Packing.packGreedy(docs, budget).collect()

    // reference: same md5 sharding, doc_id order, greedy fold — in plain Scala
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = sizes.keys.toSeq
      .groupBy(id => md5hex(s"shard:$id").substring(0, 1))
      .flatMap { case (shard, ids) =>
        var bin = 0; var cum = 0L; var first = true
        ids.sorted.map { id =>
          val n = sizes(id)
          if (first) { first = false; cum = n }
          else if (cum + n > budget) { bin += 1; cum = n }
          else cum += n
          (id, shard, bin, n)
        }
      }.toSet
    assert(packed.map(p => (p.doc_id, p.shard, p.bin_id, p.n_tokens)).toSet == expected)
    // invariant: no bin exceeds the budget unless it holds one oversized doc
    packed.groupBy(p => (p.shard, p.bin_id)).values.foreach { bin =>
      assert(bin.map(_.n_tokens).sum <= budget || bin.length == 1)
    }
  }

  test("an oversized document gets its own bin and does not stall packing") {
    val docs = docsOf(
      (0L, "w w"), (1L, Seq.fill(10)("w").mkString(" ")), (2L, "w w"))
    val packed = Packing.packGreedy(docs, budget = 5)
      .collect()
    // every doc present exactly once
    assert(packed.map(_.doc_id).sorted.toSeq == Seq(0L, 1L, 2L))
    // the oversized doc shares its bin with nobody
    val big = packed.find(_.doc_id == 1L).get
    assert(packed.count(p => p.shard == big.shard && p.bin_id == big.bin_id) == 1)
  }

  test("packing is deterministic under different input partitionings") {
    val docs = docsOf((0 until 200).map(i =>
      (i.toLong, Seq.fill(i % 17 + 1)("w").mkString(" "))): _*)
    val a = Packing.packGreedy(docs.repartition(1), budget = 64).collect().sortBy(_.doc_id)
    val b = Packing.packGreedy(docs.repartition(13), budget = 64).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq, "packing must not depend on the input partitioning")
  }

  test("bin summary accounts for every document and token") {
    val docs = docsOf((0 until 50).map(i =>
      (i.toLong, Seq.fill(i % 7 + 1)("w").mkString(" "))): _*)
    val packed = Packing.packGreedy(docs, budget = 16)
    val summary = Packing.binSummary(packed, budget = 16).collect()
    assert(summary.map(_.getAs[Long]("n_docs")).sum == 50)
    val totalTokens = (0 until 50).map(_ % 7 + 1).sum
    assert(summary.map(_.getAs[Long]("bin_tokens")).sum == totalTokens)
  }

  test("packed payloads concatenate member texts in doc_id order") {
    val docs = docsOf((0 until 40).map(i =>
      (i.toLong, Seq.fill(i % 5 + 1)(s"w$i").mkString(" "))): _*)
    val textOf = (0 until 40).map(i =>
      i.toLong -> Seq.fill(i % 5 + 1)(s"w$i").mkString(" ")).toMap
    val members = Packing.packGreedy(docs, budget = 8).collect()
      .groupBy(p => (p.shard, p.bin_id))
    val payloads = Packing.packedPayloads(docs, budget = 8).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getAs[String]("payload"))).toMap
    assert(payloads.keySet == members.keySet)
    members.foreach { case (key, ms) =>
      val (nDocs, payload) = payloads(key)
      assert(nDocs == ms.length)
      val expected = ms.map(_.doc_id).sorted.map(textOf).mkString("\n")
      assert(payload == expected, s"bin $key payload out of order or wrong")
    }
  }

  test("decontamination flags exactly the docs sharing a shingle with the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx the quick brown fox yy"),        // shares 2 shingles
      (2L, "totally different words here now"), // disjoint
      (3L, "fox jumps")                         // < 3 tokens → no shingles
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.contaminated(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L),
      s"expected only doc 1 flagged with 2 matched shingles, got $out")
  }

  test("contamination score: fraction of matched shingles, clean docs at 0") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx the quick brown fox yy"),        // 4 shingles, 2 matched
      (2L, "totally different words here now"), // 3 shingles, 0 matched
      (3L, "fox jumps")                         // < 3 tokens → absent
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.contaminationScore(corpus, bench)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      1L -> ((4L, 2L, 0.5)),
      2L -> ((3L, 0L, 0.0))))
  }

  test("mixture sampling rebalances toward small sources, deterministically") {
    // 900 docs of A, 100 of B; alpha=0.5, budget 50%:
    //   w_A=30, w_B=10, W=40 → p_A = 0.5·1000·30/40/900 ≈ 0.4167,
    //   p_B = 0.5·1000·10/40/100 = 1.25 → clamped to 1 (B kept whole)
    val docs = ((0 until 900).map(i => (i.toLong, "A")) ++
      (900 until 1000).map(i => (i.toLong, "B"))).toDF("doc_id", "source")
    val kept = Sampling.mixtureSample(docs, "source", "doc_id", budgetFraction = 0.5)
    val bySrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("B") == 100L, "a source with rate >= 1 must be kept whole")
    // Bernoulli at p≈0.4167 over 900 keys: expect ~375, allow wide slack
    assert(bySrc("A") > 280 && bySrc("A") < 470,
      s"source A should be downsampled to ~0.42, kept ${bySrc("A")}")
    // deterministic: same rows both times
    val again = Sampling.mixtureSample(docs, "source", "doc_id", budgetFraction = 0.5)
    assert(kept.except(again).isEmpty && again.except(kept).isEmpty)

    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "source", "doc_id", budgetFraction = 0.0)
    }
  }

  test("hash sampling is deterministic and stratified quotas are exact") {
    val docs = (0 until 300).map(i => (i.toLong, s"src${i % 3}")).toDF("doc_id", "source")
    val s1 = Sampling.hashSample(docs, "doc_id", "1999").collect().map(_.getLong(0)).sorted
    val s2 = Sampling.hashSample(docs, "doc_id", "1999").collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2), "hash sample must be reproducible")
    assert(s1.nonEmpty && s1.length < 300, "rate ~10% should keep some, not all")

    val strat = Sampling.stratifiedSample(docs, "source", "doc_id", quota = 20)
    val bySrc = strat.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.values.toSet == Set(20L), s"every stratum must hit its quota: $bySrc")
    // ranks are 1..quota within each stratum
    val ranks = strat.filter(col("source") === "src0")
      .select("rk").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq == (1 to 20))
  }

  test("hash sampling rejects a malformed rate loudly") {
    val docs = Seq((1L, "x")).toDF("doc_id", "source")
    val e = intercept[IllegalArgumentException] {
      Sampling.hashSample(docs, "doc_id", "ZZ")
    }
    assert(e.getMessage.contains("hex"))
  }

  test("dataset split: exhaustive, exclusive, reproducible, near the fractions") {
    val docs = (0 until 1000).map(i => (i.toLong, s"src${i % 3}")).toDF("doc_id", "source")
    val s1 = Sampling.datasetSplit(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val s2 = Sampling.datasetSplit(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s1 == s2, "split assignment must be reproducible")
    assert(s1.size == 1000, "every row lands in exactly one slice")
    val byImpl = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byImpl.keySet == Set("train", "validation", "test"))
    // hash uniformity: 80/10/10 within a loose tolerance on 1000 keys
    assert(math.abs(byImpl("train") - 800) < 60, s"train ${byImpl("train")}")
    assert(math.abs(byImpl("validation") - 100) < 40, s"val ${byImpl("validation")}")

    // a different salt reshuffles the assignment
    val salted = Sampling.datasetSplit(docs, "doc_id", salt = "split2").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(salted != s1, "salt must change the assignment")
  }

  test("dataset split rejects malformed fraction sets loudly") {
    val docs = Seq((1L, "x")).toDF("doc_id", "source")
    val e = intercept[IllegalArgumentException] {
      Sampling.datasetSplit(docs, "doc_id", splits = Seq("a" -> 0.5, "b" -> 0.4))
    }
    assert(e.getMessage.contains("sum to 1"))
  }

  test("importance weights: target-like docs score above off-target docs") {
    // target source T speaks 'alpha beta'; the raw corpus is dominated by
    // 'gamma delta' from source R; a doc echoing the target vocabulary must
    // outscore one echoing the background
    val docs = Seq(
      (1L, "alpha beta alpha beta", "T"),
      (2L, "alpha beta alpha beta", "T"),
      (3L, "gamma delta gamma delta", "R"),
      (4L, "gamma delta gamma delta", "R"),
      (5L, "gamma delta gamma delta", "R"),
      (6L, "alpha beta alpha beta", "R"),
      (7L, "gamma delta gamma delta", "R"))
      .toDF("doc_id", "text", "source")
    val r = Sampling.importanceWeights(docs, "source", "T").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        x.getAs[Double]("importance")).toMap
    assert(r(6L) > r(7L), "target-vocabulary doc must outscore background doc")
    assert(r(1L) > r(3L))
    // identical texts get identical scores regardless of their own source
    assert(r(1L) == r(6L) && r(3L) == r(7L))
  }

  test("importance weights: n_tokens counts every token; score is partition-stable") {
    val docs = Seq(
      (1L, "a b c d e", "T"), (2L, "a a a", "R"))
      .toDF("doc_id", "text", "source")
    val once = Sampling.importanceWeights(docs, "source", "T")
    val again = Sampling.importanceWeights(docs.repartition(7), "source", "T")
    assert(once.filter(col("doc_id") === 1L).head().getAs[Long]("n_tokens") == 5L)
    assert(once.except(again).isEmpty && again.except(once).isEmpty,
      "importance must be independent of input partitioning")
  }

  test("length buckets: power-of-two routing, cap truncation, exact waste") {
    def docOf(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))
    val docs = docsOf(docOf(1, 10), docOf(2, 16), docOf(3, 17),
      docOf(4, 100), docOf(5, 2000))
    val rows = Packing.lengthBuckets(docs, cap = 1024).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("kept_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Double]("waste_ratio"),
          r.getAs[Long]("truncated_docs")))).toMap
    // 10 and 16 both fit the 16-bucket; 17 spills to 32; 2000 truncates
    assert(rows(16L) == ((2L, 26L, 32L, 1.0 - 26.0 / 32, 0L)))
    assert(rows(32L) == ((1L, 17L, 32L, 1.0 - 17.0 / 32, 0L)))
    assert(rows(128L) == ((1L, 100L, 128L, 1.0 - 100.0 / 128, 0L)))
    assert(rows(1024L) == ((1L, 1024L, 1024L, 0.0, 1L)))
    assert(rows.size == 4)
  }

  test("length buckets: cap must be a power of two") {
    intercept[IllegalArgumentException] {
      Packing.lengthBuckets(docsOf((1L, "a")), cap = 1000)
    }
  }
}
