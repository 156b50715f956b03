package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan locality: Z-order (Morton)
  * clustering plus the per-file zone maps a file-skipping reader consumes.
  *
  * Single-column range partitioning (the write path behind the serving
  * snapshot, `MaterializedState`) gives perfect pruning on ONE key and none
  * on any other. Interleaving the bits of two bucketized dimensions into one
  * Morton key and range-partitioning on THAT bounds every file in BOTH
  * dimensions at once — each file's (min,max) per dimension covers
  * ~1/sqrt(files) of each domain instead of all of it, so a predicate on
  * either dimension skips ~(1 - 1/sqrt(files)) of the data from footer
  * stats alone. This is the standard lakehouse OPTIMIZE/ZORDER move,
  * re-expressed as plain integer expressions inside codegen.
  *
  * At 100 TB the write path is `df.repartitionByRange(files, $"zval")`
  * followed by a parquet write — one range shuffle, the same cost as any
  * re-sort — and the zone-map table below is exactly the min/max footer
  * index the reader then prunes with. Here we materialize the zone maps
  * (one row per file) so the tightness claim is itself a checkable query.
  *
  * All arithmetic is integer-exact and engine-portable: per-dimension
  * buckets are `((v - min) * 2^bits) DIV (max - min + 1)` (non-negative
  * inputs, floor division), the Morton key is 2×`bits` unrolled shift/mask
  * terms, and file assignment is a right-shift of the key. The global
  * per-dimension (min,max) pair is a 4-scalar driver artifact from one
  * column-pruned scan — the same bounded-model-artifact pattern as the IVF
  * centroids.
  */
object Layout {

  /** Bit-interleave two already-bucketized non-negative int columns
    * (`bits` low bits each) into the Morton key. */
  def mortonKey(bx: Column, by: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(bx, i).bitwiseAND(lit(1)) * lit(1 << (2 * i))) +
        (shiftright(by, i).bitwiseAND(lit(1)) * lit(1 << (2 * i + 1)))
    }.reduce(_ + _)

  /** Z-order `df` on two integer-valued dimension expressions and emit the
    * per-file zone map: (file_id, n_rows, x_min, x_max, y_min, y_max).
    *
    * `files` must be a power of two ≤ 2^(2*bits); `xMin..yMax` are the
    * global dimension bounds (collect them once; see [[boundsOf]]).
    */
  def zorderZoneMap(
      df: DataFrame, x: Column, y: Column,
      xMin: Int, xMax: Int, yMin: Int, yMax: Int,
      bits: Int = 10, files: Int = 64): DataFrame = {
    require(files > 0 && (files & (files - 1)) == 0, s"files=$files not a power of two")
    val fileBits = 31 - Integer.numberOfLeadingZeros(files)
    require(fileBits <= 2 * bits, s"files=$files exceeds the 2^${2 * bits} z-space")
    val nb = 1 << bits
    def bucket(cname: String, mn: Int, mx: Int): Column =
      expr(s"CAST(((CAST($cname AS BIGINT) - $mn) * $nb)" +
        s" DIV ${mx.toLong - mn + 1} AS INT)")
    val keyed = df
      .select(x.cast("int").as("xv"), y.cast("int").as("yv"))
      .withColumn("bx", bucket("xv", xMin, xMax))
      .withColumn("by", bucket("yv", yMin, yMax))
      .withColumn("file_id", shiftright(mortonKey(col("bx"), col("by"), bits), 2 * bits - fileBits))
    keyed.groupBy("file_id").agg(
      count(lit(1)).as("n_rows"),
      min(col("xv")).as("x_min"), max(col("xv")).as("x_max"),
      min(col("yv")).as("y_min"), max(col("yv")).as("y_max"))
  }

  /** The CONTRAST layout: single-dimension (x-ordered) file assignment with
    * the same zone-map output — what a plain date- or key-sorted write
    * produces. Each file is tight on x and covers essentially the FULL y
    * domain, so a y-predicate prunes nothing; emitted next to
    * [[zorderZoneMap]] the pair quantifies exactly what Morton clustering
    * buys (both queries are oracle-checked, so the comparison is data, not
    * prose). */
  def linearZoneMap(
      df: DataFrame, x: Column, y: Column,
      xMin: Int, xMax: Int,
      bits: Int = 10, files: Int = 64): DataFrame = {
    require(files > 0 && (files & (files - 1)) == 0, s"files=$files not a power of two")
    val fileBits = 31 - Integer.numberOfLeadingZeros(files)
    require(fileBits <= bits, s"files=$files exceeds the 2^$bits bucket space")
    val nb = 1 << bits
    val keyed = df
      .select(x.cast("int").as("xv"), y.cast("int").as("yv"))
      .withColumn("bx", expr(
        s"CAST(((CAST(xv AS BIGINT) - $xMin) * $nb)" +
          s" DIV ${xMax.toLong - xMin + 1} AS INT)"))
      .withColumn("file_id", shiftright(col("bx"), bits - fileBits))
    keyed.groupBy("file_id").agg(
      count(lit(1)).as("n_rows"),
      min(col("xv")).as("x_min"), max(col("xv")).as("x_max"),
      min(col("yv")).as("y_min"), max(col("yv")).as("y_max"))
  }

  /** The 4-scalar global-bounds artifact: one column-pruned scan. */
  def boundsOf(df: DataFrame, x: Column, y: Column): (Int, Int, Int, Int) = {
    val r = df.agg(
      min(x.cast("int")), max(x.cast("int")),
      min(y.cast("int")), max(y.cast("int"))).head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  /** SQL text of [[mortonKey]] for the DuckDB oracle, same unrolled terms. */
  def mortonKeySql(bx: String, by: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($bx >> $i) & 1) * ${1 << (2 * i)}) + ((($by >> $i) & 1) * ${1 << (2 * i + 1)})"
    }.mkString(" + ")
}
