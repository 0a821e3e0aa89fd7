package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_structs(struct_expr, k)` — a [[TypedImperativeAggregate]]
  * keeping the k SMALLEST struct values (lexicographic field order) per
  * group, returned as an ascending array. The managed binary state is a
  * bounded k-row heap, so the partial/merge tree carries at most k rows
  * per group per partition — the aggregate-function form of the
  * TopKPerKey physical operator, usable anywhere an expression fits
  * (HAVING, window-less rollups, streaming aggs).
  *
  * Determinism: struct comparison is total when the caller includes a
  * unique tie-break field (every graft query does); merge order cannot
  * change the kept set then, so results are partitioning-invariant —
  * and DuckDB reproduces them with `list(s ORDER BY s)[1:k]` or a
  * rank-window, making the aggregate oracle-checkable.
  */
case class TopKStructAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
  with BinaryLike[Expression] {

  private lazy val st: StructType = child.dataType.asInstanceOf[StructType]
  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val fieldTypes: Array[DataType] = st.fields.map(_.dataType)
  @transient private lazy val ordering: Ordering[InternalRow] = {
    val base = RowOrdering.createNaturalAscendingOrdering(fieldTypes.toIndexedSeq)
    new Ordering[InternalRow] { def compare(a: InternalRow, b: InternalRow): Int = base.compare(a, b) }
  }
  @transient private lazy val toUnsafe = UnsafeProjection.create(fieldTypes)

  override def left: Expression = child
  override def right: Expression = kExpr
  override def dataType: DataType = ArrayType(st, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val integralK = kExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!child.dataType.isInstanceOf[StructType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk_structs needs a struct input")
    // type check BEFORE eval: a foldable non-integral k (e.g. a string
    // literal) must fail analysis cleanly, not ClassCastException
    else if (!integralK || !kExpr.foldable || kExpr.eval() == null ||
      kExpr.eval().asInstanceOf[Number].intValue() < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk_structs needs a positive integral literal k")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](ordering) // dequeues the worst kept

  private def insert(heap: mutable.PriorityQueue[InternalRow], v: InternalRow): Unit =
    if (heap.size < k) heap.enqueue(v.copy())
    else if (ordering.compare(v, heap.head) < 0) { heap.dequeue(); heap.enqueue(v.copy()) }

  override def update(heap: mutable.PriorityQueue[InternalRow], input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) insert(heap, v.asInstanceOf[InternalRow])
    heap
  }

  override def merge(a: mutable.PriorityQueue[InternalRow], b: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(heap: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(heap.toArray.sorted(ordering).map(identity[Any]))

  override def serialize(heap: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { row =>
      val u = toUnsafe(row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val buf = new Array[Byte](size)
      in.readFully(buf)
      val row = new UnsafeRow(fieldTypes.length)
      row.pointTo(buf, size)
      heap.enqueue(row) // already bounded; re-inserting keeps <= k
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKStructAgg =
    copy(child = newLeft, kExpr = newRight)
  override def prettyName: String = "topk_structs"
}
