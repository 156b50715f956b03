package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed training-data pipeline this
  * engine's beyond-reference operators exist for: near-dup canonicalization →
  * language identification → quality filter → per-language corpus accounting.
  * Every stage is an individually-verified operator; the composition itself is
  * oracle-checked end-to-end (`q_pipeline_curation`).
  *
  * Note the near-dup canonical filter SUBSUMES exact dedup: identical texts
  * have Jaccard 1.0, so every exact-duplicate set lies inside one near-dup
  * component, and keeping `canonical_id == doc_id` (the component minimum)
  * keeps exactly one representative of both.
  *
  * Plan shape at scale: the label join is keyed by doc_id (one shuffle,
  * co-partitionable with the pair graph's output), language scoring and the
  * token counting are map-only projections over the kept rows, and the final
  * aggregate is a handful of rows per language — the same partial+final hash
  * aggregate as everything else. No stage widens the data beyond the input.
  */
object Curation {

  /** (predicted_lang, n_docs, total_tokens, stopword_ratio) over the curated
    * corpus: one representative per near-dup component, language-identified
    * against `profiles`, quality-filtered to documents with at least
    * `minTokens` tokens. Token and stopword counts aggregate as EXACT longs;
    * the only floating-point step is the single final ratio division —
    * deterministic and engine-portable.
    *
    * @param labels (doc_id, canonical_id) from [[Dedup.nearDedupLabels]]
    */
  def curatedLanguageProfile(
      docs: DataFrame,
      labels: DataFrame,
      profiles: Seq[(String, Seq[String])],
      minTokens: Int = 30,
      stopwords: Seq[String] = Seq("a", "the")): DataFrame = {
    val kept = docs.join(
      labels.filter(col("canonical_id") === col("doc_id")).select("doc_id"),
      "doc_id")
    val t = split(col("text"), " ")
    val stopArr = array(stopwords.map(lit): _*)
    val counted = kept
      .select(
        col("doc_id"),
        size(t).as("n_tokens"),
        size(filter(t, x => array_contains(stopArr, x))).as("n_stop"))
      .filter(col("n_tokens") >= minTokens)
    TextAnalysis.languageId(kept, profiles)
      .join(counted, "doc_id")
      .groupBy(col("predicted_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(sum(col("n_stop")).cast("double") / sum(col("n_tokens")), 6)
          .as("stopword_ratio"))
  }

  /** The FULL gate composition — every curation stage this engine ships, in
    * pipeline order: near-dup canonical filter → Gopher quality rules
    * ([[Quality.qualityRules]], default thresholds) → repetition rules
    * ([[TextAnalysis.repetitionStats]], default thresholds) → language ID →
    * per-language accounting. Each gate is an individually-oracle-checked
    * operator; this composition is itself oracle-checked end-to-end
    * (`q_pipeline_curation_full` re-derives the whole thing — transitive
    * closure, both gates, profile training, scoring — in one DuckDB query).
    *
    * Same plan shape as [[curatedLanguageProfile]]: one doc_id-keyed join per
    * gate (each gate's output is a thin (doc_id, …) projection), map-only
    * scoring, final hash aggregate of a handful of rows per language.
    *
    * @param labels (doc_id, canonical_id) from [[Dedup.nearDedupLabels]]
    */
  def fullCurationProfile(
      docs: DataFrame,
      labels: DataFrame,
      profiles: Seq[(String, Seq[String])]): DataFrame = {
    val kept = docs.join(
      labels.filter(col("canonical_id") === col("doc_id")).select("doc_id"),
      "doc_id")
    val qualityKeep = Quality.qualityRules(kept)
      .filter(col("keep")).select(col("doc_id"), col("n_tokens"))
    val repetitionKeep = TextAnalysis.repetitionStats(kept)
      .filter(col("keep")).select(col("doc_id"))
    TextAnalysis.languageId(kept, profiles)
      .join(qualityKeep, "doc_id")
      .join(repetitionKeep, "doc_id")
      .groupBy(col("predicted_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
  }

  /** The TRAINING-READY materialization — the last mile of the pipeline:
    * keep one representative per near-dup component, drop every document
    * that shares a shingle with the benchmark set (anti-join on the
    * contamination flags), then temperature-rebalance what remains with
    * [[Sampling.mixtureSample]] and account per source. Each stage is an
    * individually-verified operator; the composition is oracle-checked
    * end-to-end (closure + contamination + mixture replayed in one SQL
    * query).
    *
    * Plan shape at scale: doc_id-keyed survivor join, broadcast-shingle
    * anti-join, map-side mixture filter, final small aggregate — nothing
    * widens beyond the input.
    *
    * Returns (source, n_kept).
    *
    * @param labels (doc_id, canonical_id) from [[Dedup.nearDedupLabels]]
    *               computed over `corpus`
    */
  def trainingReadyCounts(
      corpus: DataFrame,
      benchmark: DataFrame,
      labels: DataFrame,
      budgetFraction: Double = 0.5): DataFrame = {
    val survivors = corpus.join(
      labels.filter(col("canonical_id") === col("doc_id")).select("doc_id"),
      "doc_id")
    val clean = survivors.join(
      Dedup.contaminated(corpus, benchmark).select("doc_id"),
      Seq("doc_id"), "left_anti")
    Sampling
      .mixtureSample(clean.select(col("doc_id"), col("source")),
        "source", "doc_id", budgetFraction)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
  }

  /** Right-to-be-forgotten sweep: drop every event belonging to a user on
    * the tombstone list — the erasure pass a training pipeline must run over
    * its immutable event log before each corpus build (deleting in place is
    * not how append-only stores work; re-materializing MINUS the tombstones
    * is).
    *
    * Scale shape: the tombstone list is tiny next to the log (users who
    * filed erasure requests), so this is a broadcast LEFT ANTI join — the
    * 100 TB side streams through map tasks untouched by any shuffle, each
    * row probed against the broadcast hash set.
    *
    * Returns the surviving (user_id, event_id) rows.
    */
  def forgetUsers(events: DataFrame, tombstones: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_id"))
      .join(broadcast(tombstones.select(col("user_id")).distinct()),
        Seq("user_id"), "left_anti")
}
