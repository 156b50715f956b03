package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality filtering — the Gopher-style heuristic gate a
  * training-data pipeline runs before anything expensive (beyond-reference
  * extension, SURVEY §2.5 north star). Each rule is a named boolean column so
  * downstream consumers can audit WHY a document was dropped, not just that
  * it was; `keep` is the conjunction.
  *
  * Every rule is a codegen'd built-in expression over one row — no UDFs, no
  * higher-order functions, no shuffle — so the filter is a pure map-side
  * projection that scales embarrassingly and pushes through Catalyst like any
  * other predicate. Mean token length uses the separator identity
  * `sum(len(token)) == len(text) - (n_tokens - 1)` (split on ' ' partitions
  * the string), avoiding a per-token lambda entirely.
  */
object Quality {

  /** Per-document rule columns + keep decision:
    *
    *   - `r_tokens`:   minTokens <= n_tokens <= maxTokens
    *   - `r_mean_len`: minMeanLen <= mean token length <= maxMeanLen
    *   - `r_symbol`:   share of characters outside [a-z0-9 ] <= maxSymbolRatio
    *   - `r_stopword`: contains at least one stopword (a real-language signal)
    *   - `keep`:       all of the above
    *
    * Returns (doc_id, n_tokens, mean_token_len, symbol_ratio, r_tokens,
    * r_mean_len, r_symbol, r_stopword, keep); ratios rounded to 6 dp for
    * engine portability, rules evaluated on the UNROUNDED values.
    */
  def qualityRules(
      docs: DataFrame,
      minTokens: Int = 30,
      maxTokens: Int = 50000,
      minMeanLen: Double = 2.0,
      maxMeanLen: Double = 12.0,
      maxSymbolRatio: Double = 0.1,
      stopwords: Seq[String] = Seq("a", "the")): DataFrame = {
    val t = split(col("text"), " ")
    val n = size(t)
    // sum of token lengths = len(text) - (n-1) separators, exactly
    val meanLen = (length(col("text")) - (n - lit(1))).cast("double") / n.cast("double")
    // empty text would divide by zero → NULL flags, breaking the boolean
    // audit contract; an empty document has zero symbols by definition (and
    // still fails r_tokens under any sane minTokens)
    val symbolRatio = when(length(col("text")) === 0, lit(0.0)).otherwise(
      length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") /
        length(col("text")).cast("double"))
    val hasStop: Column = stopwords
      .map(w => array_contains(t, w)).reduce(_ || _)
    docs
      .select(col("doc_id"), col("text"), n.as("n_tokens"),
        meanLen.as("mean_len"), symbolRatio.as("sym_ratio"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("mean_len"), 6).as("mean_token_len"),
        round(col("sym_ratio"), 6).as("symbol_ratio"),
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens).as("r_tokens"),
        (col("mean_len") >= minMeanLen && col("mean_len") <= maxMeanLen).as("r_mean_len"),
        (col("sym_ratio") <= maxSymbolRatio).as("r_symbol"),
        hasStop.as("r_stopword"))
      .withColumn("keep",
        col("r_tokens") && col("r_mean_len") && col("r_symbol") && col("r_stopword"))
  }

  /** Corpus-RELATIVE quality gate: keep a document iff its token count
    * reaches its own source's q-quantile — the adaptive "drop the shortest
    * quartile per source" rule pipelines use when a fixed threshold (like
    * [[qualityRules]]' minTokens) would over- or under-prune heterogeneous
    * sources.
    *
    * Fully declarative two-pass shape: one hash aggregate computes the
    * per-source interpolated quantile (ANSI quantile_cont semantics, same as
    * `TextAnalysis.tokenDistribution`), and the resulting threshold table —
    * one row per source, a bounded dimension — broadcast-joins back onto the
    * map-side token counts. No driver-side scalar, no window over the corpus,
    * no second shuffle of document rows.
    *
    * The keep decision compares against the 6-dp ROUNDED threshold: both
    * engines interpolate the quantile in double and may differ in the last
    * ulp, so the rounded value is the portable cut (the same rounding
    * contract tokenDistribution's quantile columns already pin). At 100 TB
    * swap `percentile` for `approx_percentile` at the same call shape.
    *
    * Returns (doc_id, source, n_tokens, thr, keep).
    */
  def percentileGate(docs: DataFrame, q: Double = 0.25): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).as("n_tokens"))
    val thr = toks.groupBy("source")
      .agg(round(percentile(col("n_tokens"), lit(q)), 6).as("thr"))
    toks.join(broadcast(thr), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("thr"),
        (col("n_tokens") >= col("thr")).as("keep"))
  }

  /** Rank-normalized quality blend: fuse incommensurable per-doc signals
    * (token count, type-token ratio, mean token length) by each one's
    * PERCENTILE RANK within the doc's source, then average the ranks — the
    * standard score-fusion move when raw scales can't be compared (a
    * 0-10000 length and a 0-1 ratio average to noise; their ranks don't).
    * Sources are ranked separately so a verbose source doesn't monopolize
    * the top of the blended order.
    *
    * Determinism: signals round to 6dp BEFORE ranking (so both engines
    * group ties identically), the rank order is totalized by doc_id, and
    * pr = (row_number - 1)/(n - 1) is an exact small rational. Three
    * per-source sort windows — this is a scoring pass over doc-level rows
    * (already aggregated far below corpus size), not the raw log.
    *
    * Returns (doc_id, source, pr_tokens, pr_ttr, pr_mlen, blend).
    */
  def rankBlend(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = size(split(col("text"), " ")).cast("long")
    val sig = docs.select(col("doc_id"), col("source"),
      toks.as("n_tokens"),
      round(size(array_distinct(split(col("text"), " "))).cast("double") / toks, 6)
        .as("ttr"),
      round((length(col("text")).cast("long") - (toks - 1)).cast("double") / toks, 6)
        .as("mlen"))
    val bySrc = Window.partitionBy("source")
    def pr(c: Column): Column =
      (row_number().over(bySrc.orderBy(c, col("doc_id"))) - 1).cast("double") /
        greatest(count(lit(1)).over(bySrc) - 1, lit(1L)).cast("double")
    val p = sig.select(col("doc_id"), col("source"),
      pr(col("n_tokens")).as("p1"), pr(col("ttr")).as("p2"), pr(col("mlen")).as("p3"))
    p.select(col("doc_id"), col("source"),
      round(col("p1"), 6).as("pr_tokens"),
      round(col("p2"), 6).as("pr_ttr"),
      round(col("p3"), 6).as("pr_mlen"),
      round((col("p1") + col("p2") + col("p3")) / lit(3.0), 6).as("blend"))
  }

  /** Referential-integrity audit: for each (child, parent) key relation,
    * one summary row (relation, n_child, n_orphans) — the cross-table
    * consistency check a multi-table ingest runs before anything joins on
    * those keys (an orphan rate that is zero today and nonzero tomorrow is
    * an upstream breakage alarm, which is why the audit emits the zero).
    *
    * Shape per relation: LEFT join child keys onto the DISTINCT parent keys
    * with a hit marker, then one aggregate counts rows and null-marker
    * orphans — a single equi-join shuffle on the key, no row-level output;
    * a 1-row-per-side count crossJoin (the naive two-aggregates form) would
    * plan a nested-loop join instead.
    */
  def referentialAudit(
      relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "referentialAudit: no relations")
    relations.map { case (name, child, childKey, parent, parentKey) =>
      val p = parent.select(col(parentKey).as("k")).distinct()
        .withColumn("_hit", lit(1))
      child.select(col(childKey).as("k"))
        .join(p, Seq("k"), "left")
        .agg(
          count(lit(1)).as("n_child"),
          coalesce(sum(when(col("_hit").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_orphans"))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"))
    }.reduce(_.union(_))
  }

  /** Declarative data-quality expectations over the event log — the
    * dbt-test/Great-Expectations-style contract suite, evaluated in ONE
    * aggregation pass: per rule, total rows, violation count, and the
    * verdict. Row-local rules (null/domain/range checks) are conditional
    * sums; the uniqueness rule rides the SAME aggregate as
    * count − count_distinct (Spark plans the mixed distinct/plain
    * aggregate as the standard two-phase Expand — still one scan). The
    * 1-row aggregate then unpivots map-side into one row per rule.
    *
    * Every check is wrapped null-safe (`coalesce(check, false)`): a NULL
    * check result — e.g. a domain test on a NULL value — counts as a
    * violation rather than silently vanishing from the sum, in both
    * engines identically.
    *
    * Returns (rule, n_rows, n_violations, pass), one row per rule.
    */
  def expectations(
      events: DataFrame, allowedTypes: Seq[String],
      tsLo: String, tsHi: String, valueCap: Double): DataFrame = {
    val rowRules: Seq[(String, Column)] = Seq(
      "user_id_positive" ->
        (col("user_id").isNotNull && col("user_id") > 0),
      "event_type_in_domain" -> col("event_type").isin(allowedTypes: _*),
      "value_non_negative" ->
        (col("value").isNotNull && col("value") >= 0),
      s"value_at_most_${valueCap}" ->
        (col("value").isNotNull && col("value") <= valueCap),
      "ts_in_range" ->
        (col("ts") >= lit(tsLo).cast("timestamp") &&
          col("ts") < lit(tsHi).cast("timestamp")))
    val aggCols =
      count(lit(1)).as("n") +:
        rowRules.zipWithIndex.map { case ((_, c), i) =>
          sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L)).as(s"v$i")
        } :+ (count(lit(1)) - countDistinct(col("event_id"))).as("vdup")
    val agged = events.agg(aggCols.head, aggCols.tail: _*)
    val ruleRows =
      rowRules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"), col("n").as("n_rows"),
          col(s"v$i").as("n_violations"))
      } :+ struct(lit("event_id_unique").as("rule"), col("n").as("n_rows"),
        col("vdup").as("n_violations"))
    agged
      .select(explode(array(ruleRows: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_rows").as("n_rows"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Order-independent per-group table fingerprint — the cross-system data
    * validation primitive (pt-table-checksum's move): migrating 100 TB
    * between engines or snapshots, you cannot diff rows, but you CAN compare
    * a per-partition checksum whose aggregate is insensitive to row order
    * and partitioning. Each row canonicalizes to a '|'-joined string
    * (explicit '<null>' sentinels — concat_ws silently SKIPS nulls, which
    * would alias (a,NULL,b) with (a,b,NULL)), hashes to the first 15 md5 hex
    * chars as a 60-bit integer, and the group fingerprint is the exact
    * decimal SUM of those integers (commutative ⇒ row-order- and
    * partitioning-invariant) plus min/max as corruption locators.
    *
    * Scale shape: one narrow codegen'd projection + one hash aggregate keyed
    * by the group column — map-side partial sums do the heavy lifting, the
    * shuffle carries |groups| rows. A flipped byte anywhere changes fp_sum
    * with probability 1 − 2⁻⁶⁰ per row (sum collisions need coordinated
    * multi-row corruption).
    *
    * Returns (groupCol, n_rows, fp_sum, fp_min, fp_max); fp_sum as a string
    * so the exact 38-digit decimal survives any client's number type.
    */
  def tableFingerprint(
      df: DataFrame, groupCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableFingerprint: no columns to fingerprint")
    val canon = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
    df.select(col(groupCol),
        conv(substring(md5(canon), 1, 15), 16, 10).cast("long").as("fp"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("fp").cast("decimal(38,0)")).cast("string").as("fp_sum"),
        min(col("fp")).as("fp_min"), max(col("fp")).as("fp_max"))
  }

  /** Key-skew profile for a prospective shuffle/join key — the "know your
    * exchange before you pay for it" audit a 100 TB pipeline runs before
    * keying anything by `keyCol`: the top-`k` heaviest keys with their share
    * of all rows, alongside the key-count distribution (distinct keys, total
    * rows, p50/p99 per-key count, max). A max/p50 ratio in the thousands is
    * the signal to salt or let AQE split that key.
    *
    * Shape: ONE hash aggregate over the raw rows (map-side combined — the
    * only pass at data scale), then everything downstream works on |keys|
    * rows: the distribution is one bounded scalar aggregate (driver
    * artifact, the repo's trained-model move), the top-k plans as
    * TakeOrderedAndProject (bounded per-partition heaps, never a full
    * sort), and the final rank window touches exactly `k` rows.
    *
    * Returns (rank, keyCol, cnt, share, n_keys, n_rows, p50_cnt, p99_cnt,
    * max_cnt).
    */
  def skewProfile(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val s = counts.agg(
      count(lit(1)).as("nk"), sum(col("cnt")).as("nr"),
      round(percentile(col("cnt"), lit(0.5)), 6).as("p50"),
      round(percentile(col("cnt"), lit(0.99)), 6).as("p99"),
      max(col("cnt")).as("mx")).head()
    // empty input: the scalar row carries NULL sum/percentiles/max — the
    // top-k below is empty anyway, so return it before reading the nulls
    if (s.isNullAt(1)) {
      return counts.limit(0)
        .select(lit(0).cast("int").as("rank"), col(keyCol),
          col("cnt"), lit(0.0).as("share"), lit(0L).as("n_keys"),
          lit(0L).as("n_rows"), lit(0.0).as("p50_cnt"),
          lit(0.0).as("p99_cnt"), lit(0L).as("max_cnt"))
    }
    counts.orderBy(col("cnt").desc, col(keyCol)).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col(keyCol)))
          .cast("int"))
      .select(col("rank"), col(keyCol), col("cnt"),
        round(col("cnt").cast("double") / lit(s.getLong(1)), 6).as("share"),
        lit(s.getLong(0)).as("n_keys"), lit(s.getLong(1)).as("n_rows"),
        lit(s.getDouble(2)).as("p50_cnt"), lit(s.getDouble(3)).as("p99_cnt"),
        lit(s.getLong(4)).as("max_cnt"))
  }
}
