package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregations next to their exact twins — the
  * shapes that keep corpus accounting viable at 100 TB, where the exact
  * forms' costs concentrate in one place: exact distinct counting shuffles
  * every distinct term once, exact percentiles sort every group. The sketch
  * forms (HyperLogLog++ distinct counts, Greenwald-Khanna quantiles) are
  * map-side mergeable: each partition emits one small sketch and the shuffle
  * carries sketches, not values.
  *
  * Both exact forms are registered with DuckDB oracles; the sketch twins are
  * engine-specific estimates (not SQL-portable bit-for-bit), so they are
  * rows-only queries whose ERROR vs the exact twin is pinned by
  * `SketchesSpec` — the spec is the contract that the estimate stays inside
  * its advertised bound on the real corpus.
  */
object Sketches {

  /** Exact per-source vocabulary accounting: distinct terms and total term
    * occurrences. The distinct count is the expensive path at scale — every
    * (source, term) pair crosses the wire once before counting.
    */
  def vocabBySource(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source")
      .agg(
        countDistinct(col("term")).as("n_distinct_terms"),
        count(lit(1)).as("n_terms"))

  /** HyperLogLog++ twin of [[vocabBySource]]: one bounded sketch per
    * (partition, source) partial — the shuffle carries sketches instead of
    * the term dictionary. `rsd` is the advertised relative standard
    * deviation (default 5%); SketchesSpec pins the real error against the
    * exact twin.
    */
  def vocabBySourceApprox(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source")
      .agg(
        approx_count_distinct(col("term"), rsd).as("n_distinct_terms"),
        count(lit(1)).as("n_terms"))

  /** Approximate-quantile twin of [[TextAnalysis.tokenDistribution]]:
    * `approx_percentile` (Greenwald-Khanna, `accuracy` inverse-epsilon)
    * instead of the exact interpolating `percentile` — same call shape, same
    * output schema, group-size-independent state. SketchesSpec pins the
    * rank-error bound against the exact form.
    */
  def tokenDistributionApprox(docs: DataFrame, accuracy: Int = 10000): DataFrame = {
    def q(p: Double, name: String) =
      approx_percentile(col("n_tokens"), lit(p), lit(accuracy)).cast("double").as(name)
    docs
      .select(col("source"), size(split(col("text"), " ")).as("n_tokens"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("n_tokens")).cast("double") / count(lit(1)), 6).as("avg_tokens"),
        q(0.25, "p25"), q(0.5, "p50"), q(0.75, "p75"), q(0.9, "p90"))
  }

  // ---------------------------------------------------------------------
  // Sketch AUDITS — error-as-data. The sketch estimates themselves are
  // engine-specific (an HLL register set / GK summary is not reproducible
  // bit-for-bit in another engine), so the estimate can never be
  // hash-compared against a SQL oracle. What CAN be: the exact value and
  // the VERDICT that the estimate landed inside its advertised bound. Each
  // audit computes exact and sketch in ONE aggregation pass (shared
  // shuffle) and emits only SQL-recomputable columns — the exact
  // accounting plus a within-bound boolean the oracle asserts as TRUE.
  // This graduates the sketch queries from rows-only to fully
  // oracle-checked without pretending the estimate is portable.
  // ---------------------------------------------------------------------

  /** HLL++ audit of [[vocabBySource]]: (source, n_distinct_terms, n_terms,
    * hll_within_bound) where the bound is `tolRel` relative error vs the
    * exact distinct count (default 3× the advertised 5% rsd, the same
    * contract SketchesSpec pins). One shared explode + aggregate pass.
    */
  def vocabAudit(
      docs: DataFrame, rsd: Double = 0.05, tolRel: Double = 0.15): DataFrame =
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source")
      .agg(
        countDistinct(col("term")).as("n_distinct_terms"),
        count(lit(1)).as("n_terms"),
        approx_count_distinct(col("term"), rsd).as("hll"))
      .select(
        col("source"), col("n_distinct_terms"), col("n_terms"),
        (abs(col("hll") - col("n_distinct_terms")).cast("double") <=
          lit(tolRel) * col("n_distinct_terms")).as("hll_within_bound"))

  /** Time-windowed HLL++ audit: distinct active users per tumbling window,
    * exact AND sketched in one aggregation pass, with the within-bound
    * verdict as data — the continuously-maintained "hourly active users"
    * board every event pipeline keeps. At 100 TB the exact side is the
    * expensive one (a distinct per window); the HLL column is the mergeable
    * sketch a pre-aggregated rollup would carry instead, and this audit is
    * the proof it can ([[vocabAudit]]'s contract applied per window).
    *
    * The bound needs a small-cardinality FLOOR the corpus-level
    * [[vocabAudit]] doesn't: a quiet window with 5 distinct users sits in
    * HLL's linear-counting regime, where an estimate off by one is a 20%
    * relative error — so the verdict is `err <= max(tolRel*n, absFloor)`
    * (measured across both test substrates: max abs err 3 at n<=28, max rel
    * err 10.8% at n~139; floor 6 holds both with headroom. HLL++ is
    * hash-deterministic, so the verdicts are stable per dataset).
    *
    * Returns (window_start_s, n_users, n_events, hll_within_bound).
    */
  def windowUsersAudit(
      events: DataFrame, windowDur: String = "1 hour",
      rsd: Double = 0.05, tolRel: Double = 0.15, absFloor: Double = 6.0): DataFrame =
    events
      .select(window(col("ts"), windowDur).as("w"), col("user_id"))
      .groupBy(col("w"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), rsd).as("hll"))
      .select(
        unix_timestamp(col("w.start")).as("window_start_s"),
        col("n_users"), col("n_events"),
        (abs(col("hll") - col("n_users")).cast("double") <=
          greatest(lit(tolRel) * col("n_users"), lit(absFloor)))
          .as("hll_within_bound"))

  /** K-minimum-values distinct sketch, per source — the one distinct-count
    * sketch whose ESTIMATE is engine-portable: keep the k smallest md5
    * hashes of the distinct term set; the k-th smallest hash, read as a
    * fraction of hash space, estimates density, so
    * `distinct ≈ (k-1) / frac(kth)`. Everything is md5 + integer + one
    * final double quotient, so the DuckDB oracle VALUE-MATCHES the
    * estimate itself (the CMS move applied to distinct counting) — where
    * HLL's register estimate can only cross as a verdict.
    *
    * Scale shape: the k-hash state rides the same bounded heap as every
    * top-k here ([[graft.functions.BoundedTopKRowsAgg]]) — O(k) per group
    * at every stage, shuffle carries ≤ k hashes per (source, partition) —
    * and KMV sketches are mergeable by construction (union the sets, keep
    * the k smallest), the property a pre-aggregated rollup needs.
    *
    * The hash fraction uses the first 13 hex chars (16¹³ = 2⁵² — exact in
    * both long and double); groups with fewer than k distinct terms get
    * their exact count back by the standard KMV rule.
    *
    * Returns (groupCol, n_distinct, kmv_est, rel_err, within_bound) —
    * bound `tolRel` defaults to 3× the k=256 standard error
    * (~1/√(k−2) ≈ 6.3%). Values hash via their canonical string form so
    * the oracle's md5 input matches byte-for-byte.
    */
  def kmvDistinctAudit(
      grouped: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256, tolRel: Double = 0.19): DataFrame = {
    import graft.functions.BoundedTopKRowsAgg.boundedTopKRows
    val hashes = grouped
      .select(col(groupCol).as("grp"),
        md5(col(valueCol).cast("string").cast("binary")).as("h"))
      .distinct()
    val agged = hashes.groupBy("grp").agg(
      count(lit(1)).as("n_distinct"),
      boundedTopKRows(struct(col("h")), k).as("mins"))
    // 13 hex chars = exactly 52 bits; the k-th smallest is the array's last
    // element once the group holds k hashes
    val kthVal = greatest(
      conv(substring(element_at(col("mins"), k).getField("h"), 1, 13), 16, 10)
        .cast("long"),
      lit(1L))
    val est = when(col("n_distinct") < k, col("n_distinct").cast("double"))
      .otherwise(
        lit((k - 1).toDouble) * lit(4503599627370496.0) / kthVal.cast("double"))
    agged
      .withColumn("kmv_raw", est)
      .select(col("grp").as(groupCol), col("n_distinct"),
        round(col("kmv_raw"), 6).as("kmv_est"),
        round(abs(col("kmv_raw") - col("n_distinct")) / col("n_distinct"), 6)
          .as("rel_err"),
        (abs(col("kmv_raw") - col("n_distinct")) / col("n_distinct") <= tolRel)
          .as("within_bound"))
  }

  /** The 13-hex-char → BIGINT expansion for the DuckDB oracle — the same
    * positional sum `conv(substring(h,1,13),16,10)` computes natively. */
  def hexPrefixToLongSql(h: String): String =
    (1 to 13).map { i =>
      val weight = BigInt(16).pow(13 - i)
      s"(CAST(strpos('0123456789abcdef', substr($h, $i, 1)) - 1 AS BIGINT) * $weight)"
    }.mkString(" + ")

  /** GK audit of [[graft.operators.TextAnalysis.tokenDistribution]]:
    * exact interpolated quantiles plus `gk_within_bound`. The bound is GK's
    * REAL guarantee, which lives in RANK space, not value space: the sketch
    * returns an actual group element whose rank is within n/accuracy of the
    * target — but the VALUE distance to the exact (interpolating) quantile
    * is unbounded when the neighborhood's inter-element gap is large (a
    * 25-doc group with token counts ...72, 87... puts every element ≥ 6
    * away from the interpolated 81). So the audit checks rank containment:
    * for each p, count(x < approx) ≤ p·n + slack and count(x ≤ approx) ≥
    * p·n − slack, slack = 2 + n/accuracy. Two aggregation passes joined by
    * source (broadcast — one row per group).
    */
  def tokenDistributionAudit(docs: DataFrame, accuracy: Int = 10000): DataFrame = {
    val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.9 -> "p90")
    val base = docs.select(col("source"), size(split(col("text"), " ")).as("n_tokens"))
    val sketchCols: Seq[Column] =
      Seq(
        count(lit(1)).as("n_docs"),
        round(sum(col("n_tokens")).cast("double") / count(lit(1)), 6).as("avg_tokens")) ++
        ps.map { case (p, n) => round(percentile(col("n_tokens"), lit(p)), 6).as(n) } ++
        ps.map { case (p, n) =>
          approx_percentile(col("n_tokens"), lit(p), lit(accuracy))
            .cast("double").as(s"ap_$n")
        }
    val sketched = base
      .groupBy("source")
      .agg(sketchCols.head, sketchCols.tail: _*)
    def rankOk(p: Double, name: String): Column = {
      // group-constant join-side columns must ride an aggregate inside agg()
      val slack = lit(2.0) + first(col("n_docs")) / accuracy
      val target = lit(p) * first(col("n_docs"))
      (sum(when(col("n_tokens") < col(s"ap_$name"), 1).otherwise(0)) <= target + slack) &&
        (sum(when(col("n_tokens") <= col(s"ap_$name"), 1).otherwise(0)) >= target - slack)
    }
    base.join(broadcast(sketched), Seq("source"))
      .groupBy("source")
      .agg(
        first(col("n_docs")).as("n_docs"),
        first(col("avg_tokens")).as("avg_tokens"),
        first(col("p25")).as("p25"), first(col("p50")).as("p50"),
        first(col("p75")).as("p75"), first(col("p90")).as("p90"),
        ps.map { case (p, n) => rankOk(p, n) }.reduce(_ && _).as("gk_within_bound"))
  }

  /** Count-Min heavy-hitters audit — the third sketch family, and the one
    * whose ESTIMATE is itself engine-portable: the counter matrix is plain
    * sums over md5-derived bucket keys (both build and probe are
    * SQL-expressible), so unlike the HLL/GK audits the whole query — exact
    * counts, sketch estimates, and bound verdicts — has a DuckDB twin that
    * must match value-for-value.
    *
    * Sketch shape: `depth` hash rows × 256 buckets (the 2-hex-char prefix of
    * md5(row ‖ ':' ‖ term)), counters = occurrence counts — ≤ depth×256 rows
    * total, a bounded artifact. The hash-aggregate's map-side partials ARE
    * the CMS merge (element-wise counter addition — commutative, so the
    * result is partition-order independent). At 100 TB the shuffle carries
    * ≤ depth×256 rows per partition, never the term dictionary — the whole
    * point of CMS accounting.
    *
    * The audit takes the exact top-`topN` terms (count desc, term asc — the
    * same deterministic cut as topTerms), probes each term's `depth` buckets
    * against the broadcast counter matrix, estimates est = min over rows,
    * and emits two verdicts: `never_under` (CMS's deterministic one-sided
    * guarantee, est ≥ exact — always true) and `within_bound`
    * (est ≤ exact + N/`tolDen`, the collision-slack check; N is the total
    * term count, a bounded driver total like the collocation normalizers).
    */
  def cmsHeavyHitters(
      docs: DataFrame, topN: Int = 20, depth: Int = 4,
      tolDen: Long = 64): DataFrame = {
    val terms = docs.select(explode(split(col("text"), " ")).as("term"))
    val n = terms.count() // bounded driver total — one long
    def bucketArr: Column = array((0 until depth).map { i =>
      struct(lit(i).as("i"),
        substring(md5(concat(lit(s"$i:"), col("term"))), 1, 2).as("bucket"))
    }: _*)
    val counters = terms
      .select(explode(bucketArr).as("rb"))
      .groupBy(col("rb.i").as("i"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val exact = terms.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term")).limit(topN)
    exact
      .select(col("term"), col("exact_cnt"), explode(bucketArr).as("rb"))
      .select(col("term"), col("exact_cnt"),
        col("rb.i").as("i"), col("rb.bucket").as("bucket"))
      .join(broadcast(counters), Seq("i", "bucket"))
      .groupBy("term", "exact_cnt")
      .agg(min(col("c")).as("cms_est"))
      .select(col("term"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") >= col("exact_cnt")).as("never_under"),
        (col("cms_est") <= col("exact_cnt") + lit(n / tolDen)).as("within_bound"))
  }

  /** KMV set-resemblance sketch between sources — estimate the pairwise
    * span-set Jaccard from k-minimum-value sketches instead of the full
    * span inventories, next to the exact twin
    * ([[graft.operators.Dedup.sourceOverlap]]) as an error-as-data audit.
    *
    * The estimator is the textbook one: with K_s = the k smallest md5 span
    * hashes of source s (each a bottom-k uniform sample of the source's
    * span set) and X = the k smallest of K_a ∪ K_b (a bottom-k sample of
    * the UNION), J ≈ |X ∩ K_a ∩ K_b| / |X| — the fraction of the union
    * sample that lands in both sets. Everything is md5 ordering, set
    * membership, and one final integer quotient, so the DuckDB oracle
    * VALUE-MATCHES the estimate itself (the KMV/CMS portability move
    * applied to set resemblance).
    *
    * Scale shape — the reason this exists at 100 TB: the exact twin's
    * shared-span equi-join carries every duplicated span hash across the
    * wire; here each source reduces to a k-hash sketch via the same bounded
    * heap as every top-k ([[graft.functions.BoundedTopKRowsAgg]], O(k)
    * state per group at every stage), and only sketches meet. The pairing
    * is a map-side explode over the (bounded, driver-collected) source
    * list — sketch rows × (sources−1) — followed by one hash aggregate
    * keyed by pair; no join touches span inventories, and KMV sketches
    * merge by construction (union, keep k smallest), the property a
    * pre-aggregated per-shard rollup needs.
    *
    * Sketches with fewer than k hashes are complete sets, so small-source
    * pairs degrade to EXACT Jaccard — the audit's `within_bound` uses an
    * absolute tolerance sized ~3σ for k=256 (σ = √(J(1−J)/k) ≤ 0.031).
    *
    * Returns (source_a, source_b, jaccard_exact, kmv_jaccard, abs_err,
    * within_bound) for every unordered source pair.
    */
  def kmvSourceJaccard(
      docs: DataFrame, w: Int = 8, k: Int = 256,
      tolAbs: Double = 0.1): DataFrame = {
    import graft.functions.BoundedTopKRowsAgg.boundedTopKRows
    import graft.functions.NativeExpressions
    val hs = docs
      .select(col("source"),
        explode(NativeExpressions.wordWindowMd5(col("text"), w)).as("whash"))
      .distinct()
    val sk = hs.groupBy("source")
      .agg(count(lit(1)).as("n_spans"),
        boundedTopKRows(struct(col("whash")), k).as("mins"))
    // bounded model artifact: the source list (≤ dozens of strings), the
    // same move as the centroid/profile literals
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    val srcArr = array(sources.map(lit): _*)
    // map-side pair fan-out: each sketch hash goes to every pair its source
    // belongs to — sketch rows × (sources−1), never the span inventory
    val pairRows = sk
      .select(col("source"), explode(col("mins")).as("m"))
      .select(col("source"), col("m").getField("whash").as("h"))
      .select(col("source"), col("h"),
        explode(filter(srcArr, x => x =!= col("source"))).as("other"))
      .select(least(col("source"), col("other")).as("source_a"),
        greatest(col("source"), col("other")).as("source_b"), col("h"))
    // cnt=2 ⇔ the hash sits in BOTH sketches; the bounded heap then keeps
    // X = the k smallest distinct union hashes with their membership counts
    val perPair = pairRows
      .groupBy("source_a", "source_b", "h")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("source_a", "source_b")
      .agg(boundedTopKRows(struct(col("h"), col("cnt")), k).as("x"))
      .select(col("source_a"), col("source_b"),
        round(
          size(filter(col("x"), e => e.getField("cnt") === 2)).cast("double") /
            size(col("x")), 6).as("kmv_jaccard"))
    // exact side: same thin per-source totals + shared-hash join as the
    // exact twin, emitted as jaccard_exact (absent pair = no shared span)
    val perSource = hs.groupBy("source").agg(count(lit(1)).as("n"))
    val exact = hs.as("a")
      .join(hs.as("b"),
        col("a.whash") === col("b.whash") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(perSource.select(
        col("source").as("source_a"), col("n").as("n_a"))), Seq("source_a"))
      .join(broadcast(perSource.select(
        col("source").as("source_b"), col("n").as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6).as("jx"))
    perPair.join(exact, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("jx"), lit(0.0)).as("jaccard_exact"),
        col("kmv_jaccard"),
        round(abs(col("kmv_jaccard") - coalesce(col("jx"), lit(0.0))), 6)
          .as("abs_err"),
        (abs(col("kmv_jaccard") - coalesce(col("jx"), lit(0.0))) <= tolAbs)
          .as("within_bound"))
  }
}
