package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline — beyond-reference
  * extensions (SURVEY §2.5 north star) over the `documents` table.
  *
  * Design constraints at 100 TB:
  *   - exact dedup is one hash-aggregate keyed by a compact content hash —
  *     never a window sort over full text;
  *   - near-dup candidate generation is an equi-join on LSH bucket keys —
  *     never an all-pairs cross join. The only pairs materialized are those
  *     sharing a bucket, and the exact similarity re-check runs on that
  *     candidate set alone.
  *
  * All expressions are built-in codegen'd functions (split / transform /
  * xxhash64 / aggregate) — no UDFs, so whole-stage codegen spans the hot path.
  */
object Dedup {

  /** Whitespace tokens of a document (the corpus is space-separated text). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles. Documents shorter than n tokens get an
    * empty shingle set.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + lit(j))): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** Exact dedup by full content: keep the lowest-id row per distinct text.
    * Hash-groupBy on a 128-bit content hash (single shuffle, compact key);
    * `min_by` picks the deterministic survivor — no window sort, no second
    * pass over the corpus.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val allCols = struct(docs.columns.map(col): _*)
    docs
      .groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min_by(allCols, col(idCol)).as("kept"))
      .select(col("content_hash"), col("kept.*"))
  }

  /** MinHash signature: for each of k hash permutations, the minimum
    * `xxhash64(shingle, seed=j)` over the document's shingle set. Null for
    * documents with no shingles.
    */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    when(size(shingleSet) > 0,
      array((0 until k).map { j =>
        array_min(transform(shingleSet, s => xxhash64(s, lit(j))))
      }: _*))

  /** Near-duplicate pairs by word-n-gram Jaccard, via MinHash LSH.
    *
    * Candidate generation: one row per (permutation, minhash value) — docs
    * sharing ANY of the k minhash values become candidates (bands of r=1).
    * A pair with Jaccard J survives all k permutations un-collided with
    * probability (1-J)^k — at k=64 and J >= threshold >= 0.5 that is < 1e-19,
    * i.e. recall is exact for every practical corpus, while candidates stay
    * an equi-join on bucket keys. (At petabyte scale with low thresholds
    * you'd raise r to trade recall for fewer false candidates; the re-check
    * below already removes false positives exactly.)
    *
    * Every candidate pair is then re-checked with EXACT Jaccard over the
    * shingle sets, so the output is precisely the pairs with
    * jaccard >= threshold — SQL-oracle-checkable by brute force.
    *
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    */
  def nearDuplicatePairs(
      docs: DataFrame,
      n: Int = 3,
      k: Int = 64,
      threshold: Double = 0.7,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val withShingles = docs
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

    val sigs = withShingles
      .select(col("id"), col("sh"), minhashSignature(col("sh"), k).as("sig"))

    // (perm, minhash) bucket rows; join within buckets only
    val buckets = sigs.select(col("id"), posexplode(col("sig")).as(Seq("perm", "mh")))
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.perm") === col("b.perm") && col("a.mh") === col("b.mh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()

    val sets = withShingles.select(col("id"), col("sh"))
    candidates
      .join(sets.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token multiset: bit b of the fingerprint is the
    * sign of sum over tokens of (+1 if bit b of xxhash64(token) else -1).
    * Pure codegen'd expressions — one pass over the token array per band of
    * bits.
    */
  def simhash64(text: Column): Column = {
    val hashes = transform(tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Near-duplicate pairs by SimHash hamming distance <= maxHamming, with
    * band-join candidate generation: the 64-bit fingerprint splits into
    * (maxHamming + 1) bands, and by pigeonhole any pair within maxHamming
    * bit flips agrees exactly on at least one band — so the band equi-join
    * has GUARANTEED recall, no all-pairs comparison anywhere.
    *
    * Returns (doc_a, doc_b, hamming) with doc_a < doc_b.
    */
  def simhashNearDuplicates(
      docs: DataFrame,
      maxHamming: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    val fps = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("fp"))

    val bands = fps.select(
      col("id"), col("fp"),
      posexplode(array((0 until nBands).map { b =>
        // band b: bits [b*bandBits, (b+1)*bandBits) (last band takes the rest)
        val width = if (b == nBands - 1) 64 - b * bandBits else bandBits
        val mask = if (width == 64) -1L else (1L << width) - 1L
        shiftright(col("fp"), b * bandBits).bitwiseAND(mask)
      }: _*)).as(Seq("band", "key")))

    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
