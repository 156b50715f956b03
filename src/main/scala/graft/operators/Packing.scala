package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation (beyond-reference
  * extension, SURVEY §2.5 north star): documents are greedily packed, in
  * deterministic order, into bins of at most `budget` tokens — the step that
  * turns a curated corpus into fixed-budget training sequences with minimal
  * padding waste.
  *
  * Distribution model: documents are first sharded by a hash of their id
  * (16 shards = first hex digit of md5, engine-portable), then packed
  * GREEDILY within each shard in doc_id order: a document goes into the
  * current bin unless it would overflow `budget`, in which case it opens the
  * next bin. An oversized document (> budget tokens alone) still gets its own
  * bin rather than being dropped — splitting is a tokenizer-level concern.
  *
  * Spark realization: greedy packing is a NON-ASSOCIATIVE prefix scan — no
  * built-in aggregate or window expresses "running sum that resets at a
  * threshold" (a window cumsum with `floor(cum/budget)` bins would SPLIT
  * documents across bins). This is the genuine per-partition imperative case:
  * `repartition(shard)` + `sortWithinPartitions(shard, doc_id)` +
  * `mapPartitions` with a three-variable accumulator that resets on shard
  * boundaries. One shuffle keyed by shard, streaming iterator (no per-group
  * materialization), state = O(1) per partition — the shape holds at 100 TB
  * with shard count scaled to the cluster.
  */
object Packing {

  /** One document routed to a shard, pre-packing. */
  final case class PackInput(shard: String, doc_id: Long, n_tokens: Int)

  /** One packed document: `bin_id` is 0-based within (shard). */
  final case class PackedDoc(doc_id: Long, shard: String, bin_id: Int, n_tokens: Int)

  /** Pack `docs` (needs doc_id + text) into per-shard token bins, budgeting
    * in whitespace words.
    * Returns (doc_id, shard, bin_id, n_tokens), one row per input document.
    */
  def packGreedy(docs: DataFrame, budget: Int, salt: String = "shard"): Dataset[PackedDoc] =
    packGreedyCounted(
      docs.select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens")),
      budget, salt)

  /** Pack pre-counted documents (doc_id, n_tokens) — the form a SUBWORD
    * budget uses (see [[Bpe.tokenCounts]]): the token accounting is supplied
    * by the caller, so bins can be budgeted in model tokens rather than
    * words. Same sharding, ordering, and greedy fold as [[packGreedy]].
    */
  def packGreedyCounted(counted: DataFrame, budget: Int,
      salt: String = "shard"): Dataset[PackedDoc] = {
    require(budget > 0, s"packGreedy: budget must be positive, got $budget")
    val spark = counted.sparkSession
    import spark.implicits._
    counted
      .select(
        substring(md5(concat(lit(salt + ":"), col("doc_id").cast("string"))), 1, 1)
          .as("shard"),
        col("doc_id"),
        col("n_tokens").cast("int").as("n_tokens"))
      .as[PackInput]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .mapPartitions { it =>
        // several shards may hash into one partition; the sort groups them,
        // and the accumulator resets at each shard boundary
        var curShard: String = null
        var bin = 0
        var cum = 0L
        it.map { d =>
          if (d.shard != curShard) { curShard = d.shard; bin = 0; cum = d.n_tokens }
          else if (cum + d.n_tokens > budget) { bin += 1; cum = d.n_tokens }
          else cum += d.n_tokens
          PackedDoc(d.doc_id, d.shard, bin, d.n_tokens)
        }
      }
  }

  /** Per-bin summary of a [[packGreedy]] result: fill counts and token
    * utilization per (shard, bin) — the padding-waste accounting a training
    * pipeline tracks. One hash aggregate keyed by (shard, bin_id).
    */
  def binSummary(packed: Dataset[PackedDoc], budget: Int): DataFrame =
    packed.toDF()
      .groupBy(col("shard"), col("bin_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        round(sum(col("n_tokens")).cast("double") / budget, 6).as("fill_ratio"))

  /** Materialize the packed TRAINING SEQUENCES: one row per (shard, bin)
    * with the member documents' texts concatenated in doc_id order — the
    * actual artifact a training run consumes. The doc_id-keyed join back to
    * the corpus is one shuffle; the per-bin concat sorts only each bin's few
    * member structs (`array_sort` on collect_list output — deterministic
    * regardless of collection order). Bin payload size is bounded by
    * `budget` tokens by construction.
    */
  def packedPayloads(
      docs: DataFrame, budget: Int, salt: String = "shard",
      sep: String = "\n"): DataFrame =
    packGreedy(docs, budget, salt).toDF()
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .groupBy(col("shard"), col("bin_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")),
          sep).as("payload"))

  /** Length-bucketed batching audit — the other standard answer (next to
    * [[packGreedy]]'s concatenation) to padding waste: route each document
    * to the smallest power-of-two bucket that holds it (floor 16, cap
    * `cap`; longer docs truncate to the cap, as a fixed-context trainer
    * would) and account, per bucket, what fraction of the padded batch
    * volume is real tokens. `waste_ratio` = 1 - sum(kept)/(n_docs*bucket)
    * is exactly the compute burned on pad tokens if batches are drawn
    * within buckets.
    *
    * Distributed shape: one narrow map projection (token count → CASE
    * ladder; the ladder is an explicit literal chain, portable to any SQL
    * engine, no float log2 round-trip) then ONE hash aggregate on ≤8 bucket
    * keys — partial aggregation collapses everything map-side, the exchange
    * carries a handful of rows regardless of corpus size.
    *
    * Returns (bucket, n_docs, kept_tokens, padded_tokens, waste_ratio,
    * truncated_docs).
    */
  def lengthBuckets(docs: DataFrame, cap: Int = 1024): DataFrame = {
    require(cap >= 16 && (cap & (cap - 1)) == 0,
      s"cap must be a power of two >= 16, got $cap")
    val n = size(split(col("text"), " ")).cast("long")
    val ladder = Iterator.iterate(16)(_ * 2).takeWhile(_ < cap).toSeq
    val bucket = ladder
      .foldLeft(when(lit(false), lit(0L))) { (acc, b) =>
        acc.when(n <= b, lit(b.toLong))
      }
      .otherwise(lit(cap.toLong))
    docs
      .select(bucket.as("bucket"), least(n, lit(cap.toLong)).as("kept"),
        (n > cap).cast("long").as("trunc"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("kept")).as("kept_tokens"),
        (count(lit(1)) * col("bucket")).as("padded_tokens"),
        round(lit(1.0) - sum(col("kept")).cast("double") /
          (count(lit(1)) * col("bucket")).cast("double"), 6).as("waste_ratio"),
        sum(col("trunc")).as("truncated_docs"))
  }
}
