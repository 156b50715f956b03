package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Row-generic bounded top-k aggregate — [[BoundedTopKAgg]]'s size-capped
  * buffer property (at most k entries per open group at EVERY stage, so the
  * shuffle carries at most k rows per (group, partition)) for an ARBITRARY
  * orderable struct, ordered by its fields left-to-right. Lets any
  * `row_number() <= k` window be computed as one bounded hash aggregate:
  * same shuffle volume as Spark 4's WindowGroupLimit-optimized window plan,
  * minus its two partition-wide sorts (see [[graft.operators.Ranking]]).
  *
  * Output: `array<item struct>` holding the k SMALLEST items ascending —
  * identical to `slice(array_sort(collect_list(item)), 1, k)` when the item's
  * leading fields form a total order (append a unique tiebreaker; trailing
  * payload fields then never influence the ordering).
  *
  * Top-level null fields are rejected loudly (a null would sort first and
  * silently occupy top-k slots — the repo's edge policy is to fail instead).
  */
case class BoundedTopKRowsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopKRowsAgg.Buffer] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def itemType: StructType = child.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(itemType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if RowOrdering.isOrderable(s) => TypeCheckResult.TypeCheckSuccess
    case s: StructType => TypeCheckResult.TypeCheckFailure(s"struct is not orderable: ${s.sql}")
    case t => TypeCheckResult.TypeCheckFailure(s"expected struct, got ${t.sql}")
  }

  @transient private lazy val ordering: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(itemType.map(_.dataType))

  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(itemType)

  override def createAggregationBuffer(): BoundedTopKRowsAgg.Buffer =
    new BoundedTopKRowsAgg.Buffer(k, ordering)

  override def update(b: BoundedTopKRowsAgg.Buffer, input: InternalRow): BoundedTopKRowsAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      var i = 0
      while (i < itemType.length) {
        if (row.isNullAt(i)) throw new IllegalArgumentException(
          s"bounded_top_k_rows: null '${itemType(i).name}' in input struct — " +
            "fill or filter the row before ranking")
        i += 1
      }
      // project into the (reused) unsafe buffer for the admission compare;
      // Buffer.offer copies only rows it actually admits — in steady state
      // on a hot key most candidates are rejected, and copying first would
      // allocate O(n) garbage for O(k) kept rows
      b.offer(toUnsafe(row))
    }
    b
  }

  override def merge(b: BoundedTopKRowsAgg.Buffer, o: BoundedTopKRowsAgg.Buffer): BoundedTopKRowsAgg.Buffer = {
    o.foreach(b.add)
    b
  }

  override def eval(b: BoundedTopKRowsAgg.Buffer): Any =
    new GenericArrayData(b.sortedItems.asInstanceOf[Array[Any]])

  override def serialize(b: BoundedTopKRowsAgg.Buffer): Array[Byte] = {
    val items = b.sortedItems
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(items.length)
    items.foreach { r =>
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopKRowsAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new BoundedTopKRowsAgg.Buffer(k, ordering)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(itemType.length)
      row.pointTo(rowBytes, len)
      b.add(row)
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopKRowsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopKRowsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BoundedTopKRowsAgg =
    copy(child = c.head)
  override def prettyName: String = "bounded_top_k_rows"
}

object BoundedTopKRowsAgg {

  /** Size-capped max-heap under the item ordering: the head is the LARGEST
    * kept row, evicted when a smaller candidate arrives with the buffer full
    * — so the buffer always holds the k smallest rows seen.
    */
  final class Buffer(k: Int, ord: Ordering[InternalRow]) {
    private val heap =
      scala.collection.mutable.PriorityQueue.empty[UnsafeRow](ord.on(identity[UnsafeRow]))

    /** Admit `row` if it ranks in the current top k, COPYING it on admission
      * (the caller's row may sit in a buffer the operator reuses); rejected
      * rows are never copied.
      */
    def offer(row: UnsafeRow): Unit = {
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
    }

    /** Admit an already-owned row (merge/deserialize paths — no copy). */
    def add(row: UnsafeRow): Unit = {
      if (heap.size < k) heap.enqueue(row)
      else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row) }
    }

    def foreach(f: UnsafeRow => Unit): Unit = heap.foreach(f)

    /** Items ascending — the output order. */
    def sortedItems: Array[UnsafeRow] =
      heap.toArray.sorted(ord.on(identity[UnsafeRow]))
  }

  /** `Column` form over any orderable struct column. */
  def boundedTopKRows(item: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopKRowsAgg(ColumnBridge.expression(item), k).toAggregateExpression())
}
