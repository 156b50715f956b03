package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate (SURVEY §7.2's "TypedImperativeAggregate top-k"):
  * keeps the k lexicographically-smallest (neg_score, id) pairs — i.e. the
  * top k by (score desc, id asc) — in a size-capped buffer at EVERY stage,
  * so map-side partial aggregation holds at most k entries per open group
  * and the shuffle carries at most k rows per (group, partition). This is
  * the property the two-phase `collect_list` + `slice` formulation only
  * claimed: there the slice ran after the aggregate, so partial buffers held
  * every scored row of the partition and the exchange shipped them all.
  *
  * Output: array<struct<neg:double, id:bigint>> sorted ascending — identical
  * to `slice(array_sort(collect_list(struct(neg, id))), 1, k)`.
  */
case class BoundedTopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopKAgg.Buffer] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(BoundedTopKAgg.itemType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 2 &&
      s(0).dataType == DoubleType && s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"expected struct<neg:double,id:bigint>, got ${t.sql}")
  }

  override def createAggregationBuffer(): BoundedTopKAgg.Buffer =
    new BoundedTopKAgg.Buffer(k)

  override def update(b: BoundedTopKAgg.Buffer, input: InternalRow): BoundedTopKAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // a null field inside a non-null struct (e.g. a zero-norm embedding's
      // NULL cosine from Divide) would read as 0.0/0L and silently occupy
      // top-k slots — reject loudly, per the repo's edge policy
      if (row.isNullAt(0) || row.isNullAt(1))
        throw new IllegalArgumentException(
          "bounded_top_k: null " + (if (row.isNullAt(0)) "neg_score" else "id") +
            " in input struct — score the row or filter it out before ranking")
      // NaN would break the buffer's sorted invariant (every `<` probe against
      // it is false, so later inserts can land after it) — reject with the
      // same loud edge policy as null fields; round()/Divide propagate NaN
      // straight through the null check above
      if (java.lang.Double.isNaN(row.getDouble(0)))
        throw new IllegalArgumentException(
          "bounded_top_k: NaN neg_score in input struct — score the row or " +
            "filter it out before ranking")
      b.add(row.getDouble(0), row.getLong(1))
    }
    b
  }

  override def merge(b: BoundedTopKAgg.Buffer, o: BoundedTopKAgg.Buffer): BoundedTopKAgg.Buffer = {
    o.foreach((n, i) => b.add(n, i))
    b
  }

  override def eval(b: BoundedTopKAgg.Buffer): Any = {
    val sorted = b.sortedItems
    new GenericArrayData(sorted.map { case (n, i) =>
      InternalRow(n, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(b: BoundedTopKAgg.Buffer): Array[Byte] = {
    val items = b.sortedItems
    val bb = ByteBuffer.allocate(4 + items.length * 16)
    bb.putInt(items.length)
    items.foreach { case (n, i) => bb.putDouble(n); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new BoundedTopKAgg.Buffer(k)
    (0 until n).foreach(_ => b.add(bb.getDouble, bb.getLong))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BoundedTopKAgg =
    copy(child = c.head)
  override def prettyName: String = "bounded_top_k"
}

object BoundedTopKAgg {

  val itemType: StructType = StructType(Seq(
    StructField("neg", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Size-capped SORTED primitive buffer on (neg, id) lexicographic order —
    * two parallel primitive arrays kept ascending, so the hot reject path
    * (candidate no better than the current k-th) is ONE branch with zero
    * allocation. The boxed-tuple PriorityQueue this replaces allocated a
    * tuple per offer and boxed every comparison — measurable at millions of
    * updates per aggregate (the KNN join feeds ~n² rows through here when
    * geometric pruning cannot bite). Insertions binary-search the slot and
    * shift with arraycopy (k is small by contract). Semantics unchanged:
    * the buffer always holds the k lexicographically-smallest pairs seen,
    * equal pairs rejected at the boundary exactly as `Ordering.lt` did.
    */
  final class Buffer(k: Int) {
    private val negs = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    @inline private def lt(a1: Double, a2: Long, b1: Double, b2: Long): Boolean =
      a1 < b1 || (a1 == b1 && a2 < b2)

    def add(neg: Double, id: Long): Unit = {
      // defend the sorted invariant at the buffer boundary too — a NaN that
      // slipped past callers would silently corrupt rank order
      if (java.lang.Double.isNaN(neg))
        throw new IllegalArgumentException("bounded_top_k buffer: NaN neg_score")
      if (n == k && !lt(neg, id, negs(n - 1), ids(n - 1))) return
      var lo = 0
      var hi = n
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (lt(neg, id, negs(m), ids(m))) hi = m else lo = m + 1
      }
      val last = if (n < k) n else k - 1
      System.arraycopy(negs, lo, negs, lo + 1, last - lo)
      System.arraycopy(ids, lo, ids, lo + 1, last - lo)
      negs(lo) = neg
      ids(lo) = id
      if (n < k) n += 1
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(negs(i), ids(i)); i += 1 }
    }

    /** Items ascending by (neg, id) — the output order (maintained live). */
    def sortedItems: Array[(Double, Long)] =
      Array.tabulate(n)(i => (negs(i), ids(i)))
  }

  /** `Column` form over a (neg_score, id) struct column. */
  def boundedTopK(item: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopKAgg(ColumnBridge.expression(item), k).toAggregateExpression())
}
