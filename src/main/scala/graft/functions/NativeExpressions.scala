package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row kernels (backed by
  * [[Kernels]]), with codegen — each compiles to a single static call inside
  * whole-stage codegen instead of an interpreted higher-order-function lambda
  * per element. Preference order per the Spark-first design: built-in
  * functions where they're fast; a native `Expression` with `doGenCode` where
  * the built-in path is interpreted (higher-order functions); UDFs never.
  *
  * Each expression is bit-compatible with a Column-combinator twin in
  * `Dedup` / `Similarity` / `TextAnalysis` (differential-tested in
  * `NativeKernelsSpec`), so the combinator form documents the semantics and
  * the native form carries the hot path.
  */
object NativeExpressions {

  private def kernels = "graft.functions.Kernels"

  /** `array<bigint>` of distinct xxhash64 word-n-gram shingle hashes. */
  case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      Kernels.shingleHashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.shingleHashes($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `array<bigint>` k-permutation MinHash signature of a hash array. */
  case class MinHashSignatureExpr(child: Expression, k: Int) extends UnaryExpression {
    require(k >= 1, s"signature length must be >= 1, got $k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got ${t.sql}")
    }
    override protected def nullSafeEval(input: Any): Any =
      Kernels.minhashSignature(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.minhashSignature($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `bigint` SimHash fingerprint of a hash array. */
  case class SimHash64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got ${t.sql}")
    }
    override protected def nullSafeEval(input: Any): Any =
      Kernels.simhash64(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.simhash64($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `double` dot product of two float or two double arrays (element-wise
    * double widening, left-to-right accumulation).
    */
  case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private def elemType: Option[DataType] = (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) if a == b && (a == FloatType || a == DoubleType) =>
        Some(a)
      case _ => None
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"expected two array<float> or two array<double>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    private def method: String =
      if (elemType.contains(FloatType)) "dotFloat" else "dotDouble"
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
      if (elemType.contains(FloatType)) Kernels.dotFloat(x, y) else Kernels.dotDouble(x, y)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$kernels.$method($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `array<int>` of all random-hyperplane LSH bucket keys of a float vector. */
  case class LshBucketsExpr(child: Expression, tables: Int, bits: Int) extends UnaryExpression {
    require(tables >= 1 && bits >= 1 && bits <= 30, s"bad LSH shape ($tables tables, $bits bits)")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got ${t.sql}")
    }
    override protected def nullSafeEval(input: Any): Any =
      Kernels.lshBuckets(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], tables, bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.lshBuckets($c, $tables, $bits)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `array<string>` of adjacent word bigrams (single-space separator). */
  case class WordBigramsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      Kernels.wordBigrams(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.wordBigrams($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `array<string>` of distinct character n-grams. */
  case class CharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      Kernels.charNgrams(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.charNgrams($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `int` edit distance capped at 1: 0, 1, or −1 meaning "more than 1". */
  case class EditWithin1Expr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"expected two strings, got ${left.dataType.sql}, ${right.dataType.sql}")
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.editWithin1(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$kernels.editWithin1($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `array<string>` SymSpell deletion neighborhood (self + distinct
    * single-code-point deletions).
    */
  case class DeletionVariantsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      Kernels.deletionVariants(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.deletionVariants($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `array<bigint>` of distinct winnowing fingerprints (k-gram size, window w). */
  case class WinnowingExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
    require(k >= 1 && w >= 1, s"bad winnowing shape (k=$k, w=$w)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      Kernels.winnowingFingerprints(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.winnowingFingerprints($c, $k, $w)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `array<bigint>` of distinct 60-bit md5-prefix word-n-gram shingle
    * hashes — the ENGINE-PORTABLE twin of [[ShingleHashesExpr]] (see
    * [[Kernels.shingleMd5Hashes60]]).
    */
  case class ShingleMd5Hashes60Expr(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      Kernels.shingleMd5Hashes60(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.shingleMd5Hashes60($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `array<bigint>` Carter-Wegman minhash signature over word-n-gram
    * shingles — one md5 per shingle, k running minima of h1 + j·h2 in one
    * pass (see [[Kernels.minhashCw56]]). Empty array when the text has
    * fewer than n tokens.
    */
  case class MinhashCw56Expr(child: Expression, n: Int, k: Int)
      extends UnaryExpression {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    require(k >= 1 && k <= 64, s"signature length must be in [1,64], got $k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      Kernels.minhashCw56(input.asInstanceOf[UTF8String], n, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.minhashCw56($c, $n, $k)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `array<string>` of distinct md5-hex winnowing window minima — the
    * ENGINE-PORTABLE twin of [[WinnowingExpr]] (see [[Kernels.winnowMd5Hex]]).
    */
  case class WinnowMd5HexExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
    require(k >= 1 && w >= 1, s"bad winnowing shape (k=$k, w=$w)")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      Kernels.winnowMd5Hex(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.winnowMd5Hex($c, $k, $w)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Serializable carrier for a trained [[org.apache.spark.util.sketch.BloomFilter]]
    * riding inside generated code (reference-object pattern, like
    * [[ProfileMatcher]]): the filter ships as its serialized bytes and
    * rebuilds lazily per executor JVM.
    */
  final class BloomRef(bytes: Array[Byte]) extends Serializable {
    @transient private lazy val filter =
      org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
    def mightContainLong(h: Long): Boolean = filter.mightContainLong(h)
  }

  object BloomRef {
    def apply(filter: org.apache.spark.util.sketch.BloomFilter): BloomRef = {
      val bos = new java.io.ByteArrayOutputStream()
      filter.writeTo(bos)
      new BloomRef(bos.toByteArray)
    }
  }

  /** `boolean` — membership probe of a long column against a trained Bloom
    * filter (no false negatives; false positives at the filter's fpp). The
    * filter is a bounded model artifact riding the references array, so the
    * probe is a single virtual call inside whole-stage codegen — never a UDF.
    */
  case class BloomMightContainExpr(child: Expression, bloom: BloomRef)
    extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expected bigint, got ${t.sql}")
    }
    override protected def nullSafeEval(input: Any): Any =
      bloom.mightContainLong(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomRef", bloom, classOf[BloomRef].getName)
      defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `struct<n_tokens:int, u:double, b:double, tr:double>` — token count and
    * top unigram/bigram/trigram multiset fractions, one pass over the text
    * bytes (see [[Kernels.repetitionRatios]]).
    */
  case class RepetitionRatiosExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("u", DoubleType, nullable = false),
      StructField("b", DoubleType, nullable = false),
      StructField("tr", DoubleType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      Kernels.repetitionRatios(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.repetitionRatios($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `struct<matched:int, cand_lang:string>` — best-scoring language of a
    * distinct-gram array against a fixed profile set (see [[ProfileMatcher]]).
    * The profile set rides along as a reference object (it is a model
    * artifact, not a literal), so the row path is still a single static call
    * inside whole-stage codegen.
    */
  case class ProfileBestMatchExpr(
      child: Expression, langs: Seq[String], profiles: Seq[Seq[String]])
    extends UnaryExpression {
    require(langs.nonEmpty, "empty language profile set")
    require(langs.length == profiles.length,
      s"${langs.length} languages but ${profiles.length} profiles")

    @transient private lazy val matcher =
      new ProfileMatcher(langs.toArray, profiles.map(_.toArray).toArray)

    override def dataType: DataType = StructType(Seq(
      StructField("matched", IntegerType, nullable = false),
      StructField("cand_lang", StringType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got ${t.sql}")
    }
    override protected def nullSafeEval(input: Any): Any =
      matcher.bestMatch(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("profileMatcher", matcher,
        classOf[ProfileMatcher].getName)
      defineCodeGen(ctx, ev, c => s"$ref.bestMatch($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Serializable carrier for a trained FLOAT centroid matrix (reference-
    * object pattern like [[ProfileMatcher]]): nearest-cell assignment and
    * triangle-inequality cell admission run as ONE compiled loop over the
    * matrix instead of a k-element literal array-of-structs expression. At
    * k = √N cells (the self-KNN index regime — hundreds to thousands of
    * cells) the literal form is a ~30k-node expression tree per use
    * (serialized per task, codegen-split, interpreted-fallback risk); the
    * carrier keeps plan size O(1) while the row cost stays k·dim fused
    * multiply-adds.
    *
    * Arithmetic is BIT-IDENTICAL to the Column-combinator forms it replaces
    * (differential-pinned in NativeKernelsSpec): |c|² accumulates left-to-
    * right in double; the per-cell score is |c|² − 2.0·dot(v,c) with
    * [[Kernels.dotFloat]]'s accumulation order; argmin ties go to the lowest
    * cell (struct-min / first-position semantics).
    */
  final class FloatCentroidIndex(
      val centroids: Array[Array[Float]],
      val radii: Array[Double]) extends Serializable {
    @transient private lazy val c2: Array[Double] = centroids.map { c =>
      var s = 0.0; var j = 0
      while (j < c.length) { s += c(j).toDouble * c(j).toDouble; j += 1 }
      s
    }
    @transient private lazy val cnorms: Array[Double] = c2.map(math.sqrt)

    /** (cell, dot-with-that-centroid) of the nearest centroid by
      * |c|² − 2 v·c, ties to the lowest cell id.
      */
    def nearest(v: org.apache.spark.sql.catalyst.util.ArrayData)
        : org.apache.spark.sql.catalyst.InternalRow = {
      val dim = v.numElements()
      var bestCell = -1
      var bestD = Double.MaxValue
      var bestDot = 0.0
      var cell = 0
      while (cell < centroids.length) {
        val c = centroids(cell)
        if (c.length != dim) throw new IllegalArgumentException(
          s"nearest_cell: vector dim $dim != centroid dim ${c.length}")
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += v.getFloat(j).toDouble * c(j).toDouble; j += 1 }
        val d = c2(cell) - 2.0 * dot
        if (bestCell < 0 || d < bestD) { bestCell = cell; bestD = d; bestDot = dot }
        cell += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestCell, bestDot))
    }

    /** Cells whose best-POSSIBLE member score cos(max(0, angle(v,c)−r_c))
      * reaches `floor − margin` — the map-side triangle-inequality admission
      * of the exact self-KNN probe phase, over all cells in one compiled
      * scan. Clamp semantics mirror the Column form's least/greatest chain
      * (NaN cosine clamps to 1 → angle 0 → admitted; sound — admission may
      * only over-approximate).
      */
    def admissible(
        v: org.apache.spark.sql.catalyst.util.ArrayData,
        nrm: Double, floor: Double, margin: Double)
        : org.apache.spark.sql.catalyst.util.ArrayData = {
      val dim = v.numElements()
      val out = new Array[Int](centroids.length)
      var n = 0
      var cell = 0
      while (cell < centroids.length) {
        val c = centroids(cell)
        if (c.length != dim) throw new IllegalArgumentException(
          s"admissible_cells: vector dim $dim != centroid dim ${c.length}")
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += v.getFloat(j).toDouble * c(j).toDouble; j += 1 }
        val cosRaw = dot / (nrm * cnorms(cell))
        val clamped =
          if (java.lang.Double.isNaN(cosRaw)) 1.0
          else math.min(1.0, math.max(-1.0, cosRaw))
        val angle = math.acos(clamped)
        val r = if (cell < radii.length) radii(cell) else 0.0
        val best = math.cos(math.max(0.0, angle - r))
        if (best >= floor - margin) { out(n) = cell; n += 1 }
        cell += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(out, n))
    }
  }

  /** Serializable carrier for a trained DOUBLE centroid matrix (k-means):
    * nearest-centroid by full squared L2 distance, accumulated in
    * `dist2To`'s fold order ((x−c)² left-to-right from 0.0), ties to the
    * lowest cell (array_position-of-min semantics). Returns (cell, d2).
    *
    * At k ≤ 64 the scan is EXACT over all centroids (bit-parity with the
    * Column-combinator form — every oracle-gate clustering runs here). At
    * k > 64 assignment goes TWO-LEVEL: a ⌈√k⌉-cell coarse quantizer (Lloyd
    * over the centroid matrix itself, driver-side, deterministic) routes
    * each row to one coarse branch whose children are then scanned — ~2√k
    * distance evaluations per row instead of k. With the cluster count
    * scaled ∝ N (the SemDeDup / bounded-KNN regime) a flat scan is an
    * N·k = N²/const term that re-creates the very quadratic the bounded
    * operators exist to avoid; the measured r10 decade (sf1s→sf10s) showed
    * it dominating at 5.8×/10×. Two-level assignment may route a boundary
    * row to a near-optimal rather than optimal cell — the bounded operators
    * consume ANY deterministic partition (their semantics are "within the
    * cell a vector is assigned to"), and determinism is preserved exactly.
    *
    * `forceFlat = true` disables the two-level branch at any k — the exact
    * flat scan used ONLY as the A/B baseline by the routing differentials
    * (`NativeKernelsSpec`, `graft.RouteBench`); no registered plan sets it.
    *
    * REGIME BOUNDARY (r12 study, `BENCH_r12_route_k.jsonl`): two-level
    * routing is measured EXACT at serving occupancy — N/k ≳ 100 rows per
    * cell (sf10, k = N/250: match_rate 1.000 vs the flat argmin, 1.9×
    * faster end-to-end) — and degrades in the OVER-clustered regime: at
    * N/k ≈ 20 (k = 1024 on a 20k corpus) match drops to 0.773 with 1.27×
    * aggregate quantization-error inflation (floors pinned in
    * `NativeKernelsSpec`). Callers that scale k with N should keep
    * N/k ≥ ~50, preferring the flat scan (k ≤ 64, or `forceFlat`) below
    * that. Every registered auto-k caller uses `SparkEntry.semdedupK`
    * (k = max(8, ⌈N/250⌉)), whose two-level activations sit at N/k ≈ 250
    * — inside the exact regime by construction; a spec pins this
    * (`NativeKernelsSpec` "registered auto-k keeps two-level routing in
    * the exact occupancy regime").
    */
  final class DoubleCentroidIndex(
      val centroids: Array[Array[Double]], forceFlat: Boolean = false)
      extends Serializable {
    private val coarseK =
      if (!forceFlat && centroids.length > 64)
        math.ceil(math.sqrt(centroids.length.toDouble)).toInt
      else 0

    private def pointD2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var j = 0
      while (j < a.length) { val d = a(j) - b(j); acc += d * d; j += 1 }
      acc
    }

    private def nearestPoint(cs: Array[Array[Double]], v: Array[Double]): Int = {
      var best = -1
      var bestD = Double.MaxValue
      var i = 0
      while (i < cs.length) {
        val d = pointD2(cs(i), v)
        if (best < 0 || d < bestD) { best = i; bestD = d }
        i += 1
      }
      best
    }

    /** Coarse quantizer over the centroid matrix: 3 Lloyd iterations seeded
      * by the first ⌈√k⌉ centroids, then child lists in ascending cell
      * order (so the in-branch scan's strict-less tie-break keeps the
      * lowest cell id, like the flat scan). Built lazily per JVM —
      * deterministic, so every executor builds the identical structure.
      */
    @transient private lazy val coarseIndex
        : (Array[Array[Double]], Array[Array[Int]]) = {
      val k = centroids.length
      val dim = centroids(0).length
      var coarse: Array[Array[Double]] =
        Array.tabulate(coarseK)(i => centroids(i).clone())
      var iter = 0
      while (iter < 3) {
        val sums = Array.fill(coarseK)(new Array[Double](dim))
        val cnt = new Array[Int](coarseK)
        var i = 0
        while (i < k) {
          val a = nearestPoint(coarse, centroids(i))
          cnt(a) += 1
          var j = 0
          while (j < dim) { sums(a)(j) += centroids(i)(j); j += 1 }
          i += 1
        }
        coarse = Array.tabulate(coarseK)(c =>
          if (cnt(c) == 0) coarse(c)
          else { val m = sums(c); var j = 0; while (j < dim) { m(j) /= cnt(c); j += 1 }; m })
        iter += 1
      }
      val groups = Array.fill(coarseK)(scala.collection.mutable.ArrayBuffer.empty[Int])
      var i = 0
      while (i < k) { groups(nearestPoint(coarse, centroids(i))) += i; i += 1 }
      (coarse, groups.map(_.toArray))
    }

    private def rowD2(c: Array[Double], v: org.apache.spark.sql.catalyst.util.ArrayData,
        dim: Int): Double = {
      if (c.length != dim) throw new IllegalArgumentException(
        s"nearest_centroid: vector dim $dim != centroid dim ${c.length}")
      var acc = 0.0
      var j = 0
      while (j < dim) { val d = v.getFloat(j).toDouble - c(j); acc += d * d; j += 1 }
      acc
    }

    def nearest(v: org.apache.spark.sql.catalyst.util.ArrayData)
        : org.apache.spark.sql.catalyst.InternalRow = {
      val dim = v.numElements()
      var bestCell = -1
      var bestD = Double.MaxValue
      if (coarseK == 0) {
        var cell = 0
        while (cell < centroids.length) {
          val acc = rowD2(centroids(cell), v, dim)
          if (bestCell < 0 || acc < bestD) { bestCell = cell; bestD = acc }
          cell += 1
        }
      } else {
        val (coarse, children) = coarseIndex
        // best coarse branch that actually has children
        var bestC = -1
        var bestCD = Double.MaxValue
        var c = 0
        while (c < coarseK) {
          if (children(c).nonEmpty) {
            val d = rowD2(coarse(c), v, dim)
            if (bestC < 0 || d < bestCD) { bestC = c; bestCD = d }
          }
          c += 1
        }
        val kids = children(bestC)
        var i = 0
        while (i < kids.length) {
          val cell = kids(i)
          val acc = rowD2(centroids(cell), v, dim)
          if (bestCell < 0 || acc < bestD) { bestCell = cell; bestD = acc }
          i += 1
        }
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestCell, bestD))
    }
  }

  /** `struct<cell:int, dot:double>` — nearest float-centroid cell of a float
    * vector plus the dot with that centroid (the index rides as a reference
    * object; one static call inside whole-stage codegen).
    */
  case class NearestCellExpr(child: Expression, index: FloatCentroidIndex)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("dot", DoubleType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got ${t.sql}")
    }
    override protected def nullSafeEval(input: Any): Any =
      index.nearest(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroidIndex", index,
        classOf[FloatCentroidIndex].getName)
      defineCodeGen(ctx, ev, c => s"$ref.nearest($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `struct<cell:int, d2:double>` — nearest double-centroid (k-means) cell
    * of a float vector plus the squared L2 distance to it.
    */
  case class NearestCentroidDistExpr(child: Expression, index: DoubleCentroidIndex)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("d2", DoubleType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got ${t.sql}")
    }
    override protected def nullSafeEval(input: Any): Any =
      index.nearest(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroidIndex", index,
        classOf[DoubleCentroidIndex].getName)
      defineCodeGen(ctx, ev, c => s"$ref.nearest($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `array<int>` — the triangle-inequality-admissible cells of a vector
    * given its norm and its per-query floor (see
    * [[FloatCentroidIndex.admissible]]).
    */
  case class AdmissibleCellsExpr(
      vec: Expression, nrm: Expression, floor: Expression,
      index: FloatCentroidIndex, margin: Double)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def first: Expression = vec
    override def second: Expression = nrm
    override def third: Expression = floor
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      (vec.dataType, nrm.dataType, floor.dataType) match {
        case (ArrayType(FloatType, _), DoubleType, DoubleType) =>
          TypeCheckResult.TypeCheckSuccess
        case (a, b, c) => TypeCheckResult.TypeCheckFailure(
          s"expected (array<float>, double, double), got (${a.sql}, ${b.sql}, ${c.sql})")
      }
    override protected def nullSafeEval(v: Any, n: Any, f: Any): Any =
      index.admissible(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        n.asInstanceOf[Double], f.asInstanceOf[Double], margin)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroidIndex", index,
        classOf[FloatCentroidIndex].getName)
      defineCodeGen(ctx, ev, (v, n, f) => s"$ref.admissible($v, $n, $f, $margin)")
    }
    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
      copy(vec = newFirst, nrm = newSecond, floor = newThird)
  }

  /** `array<string>` md5 hex of every `w`-word sliding window (see
    * [[Kernels.wordWindowMd5]]) — portable span fingerprints for
    * substring-level dedup.
    */
  case class WordWindowMd5Expr(child: Expression, w: Int) extends UnaryExpression {
    require(w >= 1, s"window width must be >= 1, got $w")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      Kernels.wordWindowMd5(input.asInstanceOf[UTF8String], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernels.wordWindowMd5($c, $w)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `int` — first index at which two equal-length long arrays agree, -1
    * when none (see [[Kernels.firstIndexEqual]]): the banded-LSH join-side
    * candidate dedup predicate.
    */
  case class FirstIndexEqualExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (a, b) => TypeCheckResult.TypeCheckFailure(
          s"expected two array<bigint>, got ${a.sql} and ${b.sql}")
      }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.firstIndexEqual(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$kernels.firstIndexEqual($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `struct<n_words:bigint, n_tokens:bigint, tokens_hash:string>` — the
    * whole per-document BPE encode as one compiled pass (memo rides as a
    * reference object; see [[BpeMemoKernel]]).
    */
  case class BpeEncodeStatsExpr(child: Expression, memo: BpeMemoKernel)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("tokens_hash", StringType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      memo.encodeStats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeMemo", memo, classOf[BpeMemoKernel].getName)
      defineCodeGen(ctx, ev, c => s"$ref.encodeStats($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `bigint` — per-document BPE token count under the memo (OOV words
    * count 1); the [[BpeEncodeStatsExpr]] value without the fingerprint.
    */
  case class BpeTokenCountExpr(child: Expression, memo: BpeMemoKernel)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType.sql}")
    override protected def nullSafeEval(input: Any): Any =
      memo.tokenCount(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeMemo", memo, classOf[BpeMemoKernel].getName)
      defineCodeGen(ctx, ev, c => s"$ref.tokenCount($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ------------------------------------------------------------ Column API

  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashesExpr(expr(text), n))

  def minhashSignature(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignatureExpr(expr(hashes), k))

  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64Expr(expr(hashes)))

  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotExpr(expr(a), expr(b)))

  def lshBuckets(v: Column, tables: Int, bits: Int): Column =
    ColumnBridge.column(LshBucketsExpr(expr(v), tables, bits))

  def wordBigrams(text: Column): Column =
    ColumnBridge.column(WordBigramsExpr(expr(text)))

  def charNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgramsExpr(expr(text), n))

  def winnowingFingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowingExpr(expr(text), k, w))

  def deletionVariants(text: Column): Column =
    ColumnBridge.column(DeletionVariantsExpr(expr(text)))

  def editWithin1(a: Column, b: Column): Column =
    ColumnBridge.column(EditWithin1Expr(expr(a), expr(b)))

  def repetitionRatios(text: Column): Column =
    ColumnBridge.column(RepetitionRatiosExpr(expr(text)))

  def bloomMightContain(h: Column, bloom: BloomRef): Column =
    ColumnBridge.column(BloomMightContainExpr(expr(h), bloom))

  def wordWindowMd5(text: Column, w: Int): Column =
    ColumnBridge.column(WordWindowMd5Expr(expr(text), w))

  def shingleMd5Hashes60(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleMd5Hashes60Expr(expr(text), n))

  def minhashCw56(text: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinhashCw56Expr(expr(text), n, k))

  def winnowMd5Hex(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowMd5HexExpr(expr(text), k, w))

  def profileBestMatch(grams: Column, profiles: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(
      ProfileBestMatchExpr(expr(grams), profiles.map(_._1), profiles.map(_._2)))

  def nearestCellInfo(v: Column, index: FloatCentroidIndex): Column =
    ColumnBridge.column(NearestCellExpr(expr(v), index))

  def nearestCentroidDist(v: Column, index: DoubleCentroidIndex): Column =
    ColumnBridge.column(NearestCentroidDistExpr(expr(v), index))

  def admissibleCells(
      v: Column, nrm: Column, floor: Column,
      index: FloatCentroidIndex, margin: Double): Column =
    ColumnBridge.column(
      AdmissibleCellsExpr(expr(v), expr(nrm), expr(floor), index, margin))

  def firstIndexEqual(a: Column, b: Column): Column =
    ColumnBridge.column(FirstIndexEqualExpr(expr(a), expr(b)))

  def bpeEncodeStats(text: Column, memo: BpeMemoKernel): Column =
    ColumnBridge.column(BpeEncodeStatsExpr(expr(text), memo))

  def bpeTokenCount(text: Column, memo: BpeMemoKernel): Column =
    ColumnBridge.column(BpeTokenCountExpr(expr(text), memo))
}
