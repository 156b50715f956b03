package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation (beyond-reference
  * extension, SURVEY §2.5 north star). Randomness comes from a cryptographic
  * hash of the row key, never from `rand()`: results are identical across
  * runs, retries, partitionings, and ENGINES (md5 is everywhere), so a sample
  * is reproducible and each query's DuckDB oracle recomputes it exactly.
  *
  * The hash is compared LEXICOGRAPHICALLY on a hex prefix instead of being
  * converted to an integer — string comparison of lowercase hex is the same
  * total order as the numeric value, and it sidesteps engine-specific
  * hex→int casts (Spark's `conv` is unsigned-only; DuckDB's differs again).
  */
object Sampling {

  /** md5 of `salt:key` — the per-row sampling coordinate. */
  private def keyHash(salt: String, key: Column): Column =
    md5(concat(lit(salt + ":"), key.cast("string")))

  /** Deterministic Bernoulli sample: keep rows whose hash prefix falls below
    * `rateHex` (4 hex digits → rate = 0x`rateHex` / 65536, e.g. "1999" ≈ 10%).
    * A pure map-side filter — the predicate is codegen'd and sits in the scan,
    * no shuffle, no state; the sample of a 100 TB corpus costs one pass.
    */
  def hashSample(df: DataFrame, keyCol: String, rateHex: String,
      salt: String = "s5"): DataFrame = {
    require(rateHex.matches("[0-9a-f]{4}"),
      s"rateHex must be 4 lowercase hex digits, got '$rateHex'")
    df.filter(substring(keyHash(salt, col(keyCol)), 1, 4) < rateHex)
  }

  /** Deterministic epoch shuffle-and-shard: assign every row a shard (first
    * hex digit of an epoch-salted key hash → 16 shards; widen the prefix for
    * 256/4096 shards at larger scale) and a 1-based position within its shard
    * (rank by an INDEPENDENT epoch-salted hash, ties by key). This is the
    * training-data ordering step: each epoch gets a different but fully
    * reproducible global permutation, with no `rand()` and no single-partition
    * global sort — the only wide operations are the shard hash partitioning
    * and a per-shard sort, both embarrassingly parallel across shards.
    *
    * Returns the input columns plus `shard` and `pos`.
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salt = s"e$epoch"
    val w = Window.partitionBy(col("shard"))
      .orderBy(keyHash(s"$salt-pos", col(keyCol)), col(keyCol))
    df.withColumn("shard", substring(keyHash(s"$salt-shard", col(keyCol)), 1, 1))
      .withColumn("pos", row_number().over(w).cast("int"))
  }

  /** Stratified quota sample: the `quota` hash-smallest rows per stratum —
    * every stratum is represented (unlike Bernoulli, which drowns small
    * strata), and within a stratum membership is uniform. Implemented as a
    * window `row_number` over (hash, key) per stratum: one shuffle keyed by
    * the stratum column, per-stratum sort.
    *
    * Scale note: a single dominant stratum makes its sort heavy; at 100 TB
    * replace the window with a two-pass threshold (count per stratum → keep
    * hash < quantile cutoff) at the same call shape — the window form is the
    * exact-quota reference semantics.
    *
    * Returns the input columns plus `rk` (1-based rank within the stratum).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      quota: Int, salt: String = "s5"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(keyHash(salt, col(keyCol)), col(keyCol))
    df.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= quota)
  }

  /** Temperature-rebalanced MIXTURE sampling — the data-mixing step of a
    * training pipeline: resample the corpus toward source shares
    * proportional to n_s^alpha (alpha < 1 upweights small sources; the
    * default alpha = 0.5 is chosen deliberately — `sqrt` is IEEE
    * correctly-rounded in every engine, while `pow` is not, so the 0.5
    * temperature is exactly oracle-portable). The keep decision is a pure
    * map-side hash-coordinate comparison like [[hashSample]], with a
    * PER-SOURCE hex threshold derived from the target share:
    *
    *   p_s = min(1, budgetFraction · N · w_s / W / n_s),  w_s = √n_s
    *
    * with w_s rounded to 6 dp and W summed as DECIMAL so the normalization
    * is partition-order-independent, and the double→threshold conversion
    * quantized to 4 hex digits (floor(p·65536)) compared lexicographically
    * — rates of 1 use the sentinel 'g' (> every hex prefix), keeping such
    * sources whole. Per-source stats are one tiny aggregate broadcast back
    * onto the scan: the sample of a 100 TB corpus is still one pass.
    *
    * Returns the kept rows (input columns, no additions).
    */
  def mixtureSample(df: DataFrame, sourceCol: String, keyCol: String,
      budgetFraction: Double, salt: String = "mix"): DataFrame = {
    require(budgetFraction > 0 && budgetFraction <= 1,
      s"budgetFraction must be in (0, 1], got $budgetFraction")
    import org.apache.spark.sql.expressions.Window
    val everything = Window.partitionBy()
    val stats = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_s"))
      .withColumn("w_s", round(sqrt(col("n_s").cast("double")), 6).cast("decimal(18,6)"))
      .withColumn("w_tot", sum(col("w_s")).over(everything))
      .withColumn("n_tot", sum(col("n_s")).over(everything))
    val pRaw = lit(budgetFraction) * col("n_tot") * col("w_s").cast("double") /
      col("w_tot").cast("double") / col("n_s")
    val v = least(floor(pRaw * 65536).cast("long"), lit(65536L))
    val thresholds = broadcast(stats.select(
      col(sourceCol),
      when(v === 65536L, lit("g"))
        .otherwise(lpad(lower(hex(v)), 4, "0")).as("_thr")))
    df.join(thresholds, Seq(sourceCol))
      .filter(substring(keyHash(salt, col(keyCol)), 1, 4) < col("_thr"))
      .drop("_thr")
  }

  /** The 100 TB twin of [[stratifiedSample]] — identical output (same
    * oracle), computed via [[Ranking.topKPerKey]]'s bounded per-key heaps
    * instead of a window. Spark 4's own WindowGroupLimit already bounds the
    * window form's SHUFFLE to quota rows per (stratum, map partition); what
    * this form removes is the two partition-wide sorts around it — a
    * dominant stratum costs an O(quota)-memory heap per task instead of a
    * fully materialized, spillable partition sort (see [[Ranking]]).
    */
  def stratifiedSampleBounded(df: DataFrame, stratumCol: String, keyCol: String,
      quota: Int, salt: String = "s5"): DataFrame =
    Ranking.topKPerKey(df, Seq(stratumCol),
      Seq(keyHash(salt, col(keyCol)), col(keyCol)), quota)
      .withColumnRenamed("rank", "rk")

  /** 4-hex-digit cut points for cumulative split fractions — one cut per
    * boundary (len(fracs) − 1 cuts). Public so the SQL oracle interpolates
    * the SAME constants the engine predicate compares against (single-sourced
    * arithmetic, like the mixture thresholds).
    */
  def splitThresholds(fracs: Seq[Double]): Seq[String] = {
    require(fracs.nonEmpty && fracs.forall(_ > 0) &&
      math.abs(fracs.sum - 1.0) < 1e-9,
      s"split fractions must be positive and sum to 1, got $fracs")
    fracs.scanLeft(0.0)(_ + _).tail.dropRight(1)
      .map(f => f"${math.floor(f * 65536).toLong}%04x")
  }

  /** Deterministic train/validation/test split: each row lands in exactly one
    * named slice by its salted md5 hex prefix against the cumulative-fraction
    * cut points — the assignment every training pipeline needs to be
    * reproducible across runs, partitionings, and engines (same family as
    * [[hashSample]]; a random split would leak validation rows into training
    * on every re-run).
    *
    * Pure map-side projection — the when-chain is codegen'd, no shuffle, no
    * state; splitting a 100 TB corpus costs one pass (and composes with scan
    * pruning when only one slice is read downstream).
    */
  def datasetSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1),
      salt: String = "split1"): DataFrame = {
    require(splits.size >= 2, s"need at least 2 splits, got $splits")
    val cuts = splitThresholds(splits.map(_._2))
    val h = substring(keyHash(salt, col(keyCol)), 1, 4)
    val assigned = splits.init.zip(cuts)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cut)) =>
        Some(acc.map(_.when(h < lit(cut), name))
          .getOrElse(when(h < lit(cut), name)))
      }.get.otherwise(splits.last._1)
    df.withColumn("split", assigned)
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * (salted md5 4-hex prefix as an integer) mod k — the round-robin
    * counterpart of [[datasetSplit]]'s threshold slices, giving k
    * near-equal folds that are stable across runs, partitionings, and
    * engines. Pure map-side projection, codegen'd, no shuffle; at 100 TB a
    * fold sweep is k scans each with the fold predicate pushed to the scan.
    */
  def kFoldAssign(df: DataFrame, keyCol: String, k: Int = 5,
      salt: String = "fold1"): DataFrame = {
    require(k >= 2 && k <= 65536, s"need 2 <= k <= 65536 folds, got $k")
    df.withColumn("fold",
      (conv(substring(keyHash(salt, col(keyCol)), 1, 4), 16, 10)
        .cast("int") % k).cast("int"))
  }

  /** DSIR-style importance weighting — score every document by how much its
    * hashed-unigram distribution resembles a TARGET slice of the corpus
    * versus the corpus at large (Data Selection via Importance Resampling:
    * the standard "pick web pages that look like the high-quality seed"
    * move). Features are the CMS bucket trick ([[graft.operators.Sketches]]):
    * term → first 2 hex chars of md5 → 256 buckets, so both distributions
    * are bounded 256-row model artifacts no matter the vocabulary.
    *
    *   w(b)    = ln( p_target(b) / p_raw(b) ),  add-one smoothed
    *   score(d)= Σ_b tf_d(b) · round(w(b), 6)
    *
    * The per-bucket log-ratio rounds to 6 dp once and the per-doc score is
    * the exact decimal dot product — no trailing division, so the output is
    * engine-exact given the 256 rounded model values (the `ln` ulp-risk
    * argument of [[graft.operators.TextAnalysis.bm25Retrieve]], here over
    * only 256 distinct arguments). Positive score = more target-like;
    * resample by [[hashSample]] on a score-ranked gate downstream.
    *
    * Scale shape: two 256-row hash aggregates build the model (the map-side
    * partials ARE the histogram merge), the model broadcast-joins the
    * per-doc bucket counts, and one doc-keyed aggregate emits the score —
    * no corpus shuffle beyond the (doc, bucket) aggregate whose row count
    * is ≤ docs × 256.
    *
    * Returns (doc_id, n_tokens, importance).
    */
  def importanceWeights(docs: DataFrame, sourceCol: String,
      targetSource: String): DataFrame = {
    val buckets = 256
    val terms = docs
      .select(col("doc_id"), col(sourceCol).as("src"),
        explode(split(col("text"), " ")).as("term"))
      .select(col("doc_id"), col("src"),
        substring(md5(col("term")), 1, 2).as("bucket"))
    val tgt = terms.filter(col("src") === targetSource)
      .groupBy("bucket").agg(count(lit(1)).as("c_t"))
    val raw = terms.groupBy("bucket").agg(count(lit(1)).as("c_r"))
    // ONE pass builds the whole model: the ≤256-row joined histogram is the
    // bounded driver-side artifact, and both totals are exactly its column
    // sums (tgt ⊆ raw by construction) — the separate count() actions this
    // replaces re-ran the full explode + bucketing twice more
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = raw.join(tgt, Seq("bucket"), "left")
      .select(col("bucket"), col("c_r"),
        coalesce(col("c_t"), lit(0L)).as("c_t"))
      .as[(String, Long, Long)].collect()
    val nT = hist.map(_._3).sum
    val nR = hist.map(_._2).sum
    // weights go through the SAME engine expression (round∘log) as before,
    // just over the collected histogram as broadcast literals
    val model = hist.toSeq.toDF("bucket", "c_r", "c_t")
      .select(col("bucket"),
        round(log(
          ((col("c_t") + lit(1.0)) / lit(nT.toDouble + buckets)) /
            ((col("c_r") + lit(1.0)) / lit(nR.toDouble + buckets))), 6)
          .cast("decimal(18,6)").as("w"))
    terms.groupBy("doc_id", "bucket").agg(count(lit(1)).as("tf"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy("doc_id")
      .agg(
        sum(col("tf")).as("n_tokens"),
        round(sum(col("tf") * col("w")).cast("double"), 6).as("importance"))
  }

  /** Weighted priority sample WITHOUT replacement: the top-`k` rows of an
    * integer-weight exponential race. Each row holds `weightCol` ≥ 1 salted
    * md5 tickets and races on its MINIMUM ticket; taking the k smallest
    * minima draws k rows without replacement with inclusion driven by
    * weight — for the first draw exactly P(row) = w/Σw (the minimum of Σw
    * i.i.d. tickets belongs to a given row with probability proportional to
    * its ticket count), and each subsequent draw is the same race over the
    * remainder — the Efraimidis–Spirakis keyed sample restricted to integer
    * weights, in arithmetic every engine reproduces bit-for-bit (string-min
    * over md5 hex; no pow/log whose last-ulp behavior differs across
    * libms).
    *
    * Scale shape: the ticket minimum is a per-row `array_min∘transform` —
    * pure map-side, NO explode and no shuffle — and the top-k plans as
    * TakeOrderedAndProject (bounded per-partition heaps). Cost is one pass
    * at Σw ticket hashes; keep weights small integers (a capped bucketing
    * of the raw importance signal, e.g. 1 + tokens/256), which is also what
    * keeps the race honest — a 10⁶-weight row would be certainty, not
    * sampling.
    *
    * Returns the input columns plus `ticket` and `rank` (1-based).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, salt: String = "wt"): DataFrame = {
    require(k > 0, s"weightedSample: k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val ticket = array_min(transform(
      sequence(lit(1), col(weightCol)),
      j => md5(concat(lit(salt + ":"), col(keyCol).cast("string"),
        lit(":"), j.cast("string")))))
    df.withColumn("ticket", ticket)
      .orderBy(col("ticket"), col(keyCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("ticket"), col(keyCol)))
          .cast("int"))
  }

  /** Rebalance the corpus mixture to explicit TARGET shares — the operator
    * that closes the drift→mixture loop: [[graft.operators.Versioning
    * .driftReport]] measures how the source mix moved; this takes the
    * desired shares (e.g. the previous snapshot's mix) and downsamples each
    * source so the OUTPUT mixture matches them, at the largest total the
    * corpus can serve without upsampling any source.
    *
    * Per-source sampling fractions: with current counts n_s and target
    * shares t_s, the achievable total is T = min over s of n_s / t_s
    * (the binding source keeps everything); each source keeps
    * frac_s = t_s · T / n_s of its rows via the salted-hash threshold
    * filter shared with [[mixtureSample]] — deterministic, partitioning-
    * invariant, engine-portable.
    *
    * Scale shape: one map-combined per-source count (bounded, collected as
    * the driver artifact), thresholds broadcast, then ONE codegen'd
    * map-side filter over the corpus — no shuffle of the data itself.
    * Target sources absent from the data (or with zero share) simply
    * contribute nothing; data sources absent from the target are dropped.
    */
  def rebalanceSample(df: DataFrame, sourceCol: String, keyCol: String,
      targetShares: Seq[(String, Double)], salt: String = "rb"): DataFrame = {
    require(targetShares.nonEmpty && targetShares.forall(_._2 >= 0),
      s"rebalanceSample: target shares must be non-negative, got $targetShares")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val present = targetShares.filter { case (s, sh) => sh > 0 && counts.contains(s) }
    require(present.nonEmpty,
      "rebalanceSample: no positive-share target source present in the data")
    val t = present.map { case (s, sh) => counts(s) / sh }.min
    val spark = df.sparkSession
    import spark.implicits._
    val thresholds = broadcast(present.map { case (s, sh) =>
      val v = math.min(math.floor(sh * t / counts(s) * 65536).toLong, 65536L)
      (s, if (v == 65536L) "g" else f"$v%04x")
    }.toDF(sourceCol, "_thr"))
    df.join(thresholds, Seq(sourceCol))
      .filter(substring(keyHash(salt, col(keyCol)), 1, 4) < col("_thr"))
      .drop("_thr")
  }
}
