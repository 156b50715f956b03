package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline — beyond-reference
  * extensions (SURVEY §2.5 north star) over the `documents` table: per-doc
  * quality stats, corpus term frequencies, regex (BPE-ish) token counting,
  * n-gram language identification, and rolling-hash (winnowing) document
  * fingerprints.
  *
  * Everything is built-in codegen'd expressions — split / transform /
  * aggregate / explode / hash — no UDFs, so whole-stage codegen covers the
  * scoring paths and Catalyst is free to push/prune around them.
  */
object TextAnalysis {

  private def toks(text: Column): Column = split(text, " ")

  /** Per-document stats: token counts, distinct tokens, average token length,
    * stopword ratio, and a regex-tokenizer (BPE-ish) count. One narrow
    * projection — no shuffle, scales embarrassingly.
    */
  def textStats(
      docs: DataFrame,
      stopwords: Seq[String] = Seq("a", "the"),
      bpePattern: String = "[a-z]+|[0-9]+|[^a-z0-9 ]"): DataFrame = {
    val t = toks(col("text"))
    val n = size(t)
    val stopArr = array(stopwords.map(lit): _*)
    docs.select(
      col("doc_id"),
      n.as("n_tokens"),
      size(array_distinct(t)).as("n_distinct_tokens"),
      (aggregate(t, lit(0), (acc, x) => acc + length(x)).cast("double") /
        n.cast("double")).as("avg_token_len"),
      (size(filter(t, x => array_contains(stopArr, x))).cast("double") /
        n.cast("double")).as("stopword_ratio"),
      size(expr(s"regexp_extract_all(text, '$bpePattern', 0)")).as("n_bpe_tokens"))
  }

  /** Corpus top-k terms by frequency: explode → hash-aggregate (partial
    * map-side combine, one shuffle keyed by term) → global top-k via
    * orderBy+limit (planned as TakeOrderedAndProject: per-partition top-k,
    * merge on driver — k rows, not the whole term dictionary).
    * Ties break by term so the result is total-ordered and engine-portable.
    */
  def topTerms(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(explode(toks(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)

  /** Character n-grams of a text column (default trigrams). */
  def charNgrams(text: Column, n: Int = 3): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** N-gram-profile language identification.
    *
    * Profiles: the `profileSize` most frequent character trigrams per
    * language, trained from a labeled corpus (here: the documents table's own
    * `lang` column) — a classic Cavnar–Trenkle-style profile, built with one
    * explode + hash-aggregate + per-language top-k.
    *
    * Scoring: each document's distinct trigrams equi-join the (broadcast)
    * profile table; the predicted language is the one sharing the most
    * trigrams, ties broken deterministically by greatest language code.
    * Returns (doc_id, predicted_lang, matched_ngrams).
    *
    * The profile table is tiny (languages × profileSize) — broadcast — so
    * scoring is one map-side join + one hash-aggregate keyed by doc.
    */
  def languageId(docs: DataFrame, labeled: DataFrame, profileSize: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = labeled
      .select(col("lang"), explode(charNgrams(col("text"))).as("tg"))
      .groupBy("lang", "tg").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tg").asc)
    val profiles = grams
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= profileSize)
      .select(col("lang").as("cand_lang"), col("tg"))

    val docGrams = docs.select(col("doc_id"), explode(charNgrams(col("text"))).as("tg"))
    docGrams
      .join(broadcast(profiles), "tg")
      .groupBy("doc_id", "cand_lang").agg(count(lit(1)).as("matched"))
      .groupBy("doc_id")
      .agg(max_by(struct(col("cand_lang"), col("matched")),
        struct(col("matched"), col("cand_lang"))).as("best"))
      .select(col("doc_id"), col("best.cand_lang").as("predicted_lang"),
        col("best.matched").as("matched_ngrams"))
  }

  /** Winnowing document fingerprints (rolling-hash k-grams + sliding-window
    * minima — the MOSS scheme): every window of `w` consecutive k-gram hashes
    * contributes its minimum, and the distinct minima are the document's
    * fingerprint set. Guarantees any shared substring of length >= k + w - 1
    * between two documents shares at least one fingerprint.
    *
    * Returns (doc_id, n_fingerprints, min_fingerprint) — per-row expression
    * work only, no shuffle.
    */
  def fingerprints(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    val fps = fingerprintSet(col("text"), k, w)
    docs.select(
      col("doc_id"),
      size(fps).as("n_fingerprints"),
      array_min(fps).as("min_fingerprint"))
  }

  /** The distinct winnowing fingerprint set of a text column. */
  def fingerprintSet(text: Column, k: Int = 8, w: Int = 4): Column = {
    val kgramHashes = transform(
      sequence(lit(1), length(text) - (k - 1)),
      i => xxhash64(text.substr(i, lit(k))))
    val windowMins = transform(
      sequence(lit(1), length(text) - (k + w - 2)),
      j => array_min(slice(kgramHashes, j, lit(w))))
    when(length(text) >= k + w - 1, array_distinct(windowMins))
      .otherwise(array().cast("array<bigint>"))
  }
}
