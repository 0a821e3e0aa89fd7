package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LogicalFilter, LogicalPlan, Window => LogicalWindow, WindowGroupLimit => LogicalWindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (the §2.2 "custom SparkPlan" tier): per-key
  * top-k with a sort-free partial phase.
  *
  * Spark 3.5+ already two-phases the canonical per-key top-k idiom —
  * {{{ df.withColumn("rn", row_number().over(Window.partitionBy(key).orderBy(ord)))
  *      .filter($"rn" <= k) }}}
  * — via InferWindowGroupLimit + WindowGroupLimitExec(Partial/Final).
  * But BOTH of Spark's phases require sorted input: the pre-shuffle
  * Partial phase fully sorts every input partition (O(n log n) over
  * ALL rows) just to keep k rows per key. At 100 TB that first sort IS
  * the job.
  *
  * This strategy recognizes the same logical shape — Filter over
  * Window(row_number) over Spark's own logical WindowGroupLimit — and
  * plans it with a '''heap-based partial phase that needs no sort''':
  * one bounded k-row heap per key per input partition, O(n log k) in a
  * single unsorted pass, so the only sort left in the plan is over the
  * P·keys·k surviving candidates after the shuffle. The final phase is
  * a streaming one-pass rank-and-cut that never buffers a key group
  * (it asks Spark for clustering + ordering on the pruned survivors).
  *
  * Results are identical to WindowExec whenever the order is total
  * (every query in this repo tie-breaks on a unique id); with ties the
  * kept subset is as arbitrary as WindowExec's own sort-stability tie
  * break. Applied only for k <= 10000 (the per-key heap bound) and a
  * non-empty partition spec (global top-k already plans as
  * TakeOrderedAndProject).
  */
object TopKPerKeyStrategy extends SparkStrategy {

  private val MaxK = 10000

  /** Extract k from the rank predicate: rn <= k | rn < k+1 | rn = 1. */
  private def kOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.semanticEquals(rn) => Some(v)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.semanticEquals(rn) => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
      if a.semanticEquals(rn) && v == 1 => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference)
      if a.semanticEquals(rn) => Some(v)
    case _ => None
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LogicalFilter(cond, w: LogicalWindow)
        if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(fn, _), _)
            if fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank] =>
          // rank() differs from row_number() only on order-key ties:
          // tied rows share a rank and `rank <= k` keeps ALL boundary
          // ties. rankTies=true makes the partial phase keep rows tied
          // with its k-th candidate and the final phase emit true
          // (gapped) ranks — so the operator is exact under ties, and
          // identical to row_number when the order is total (every
          // graft query tie-breaks on a unique id).
          val rankTies = fn.isInstanceOf[Rank]
          kOf(cond, alias.toAttribute) match {
            case Some(k) if k >= 1 && k <= MaxK =>
              // If InferWindowGroupLimit already wrapped the child in its
              // (sort-requiring) logical group-limit, plan past it — our
              // heap partial subsumes it without the partition sort.
              val realChild = w.child match {
                case wgl: LogicalWindowGroupLimit if wgl.limit >= k => wgl.child
                case other => other
              }
              val partial = TopKPerKeyExec(k, w.partitionSpec, w.orderSpec,
                rankAttr = None, rankTies, planLater(realChild))
              TopKPerKeyExec(k, w.partitionSpec, w.orderSpec,
                rankAttr = Some(alias.toAttribute), rankTies, partial) :: Nil
            case _ => Nil
          }
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Physical per-key top-k. `rankAttr = None` is the pre-shuffle partial
  * phase (bounded heap per key, unordered output); `Some(attr)` is the
  * final phase, which asks Spark for clustering + ordering and then
  * streams, emitting the row_number column the logical plan promised.
  */
case class TopKPerKeyExec(
    k: Int,
    partSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rankAttr: Option[Attribute],
    rankTies: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  private def isFinal = rankAttr.isDefined

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(partSpec) :: Nil
    else UnspecifiedDistribution :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (isFinal) Seq(partSpec.map(SortOrder(_, Ascending)) ++ orderSpec) else Seq(Nil)
  override def outputOrdering: Seq[SortOrder] =
    if (isFinal) partSpec.map(SortOrder(_, Ascending)) ++ orderSpec else Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val ks = k
    val ps = partSpec
    val os = orderSpec
    val ties = rankTies
    if (!isFinal) {
      val flushKeys = conf.getConfString("spark.graft.topk.partialFlushKeys",
        TopKPerKeyExec.DefaultFlushKeys.toString).toInt
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(ps, childOutput)
        val ord = GenerateOrdering.generate(os, childOutput)
        // PriorityQueue dequeues the MAX w.r.t. the ordering = the worst
        // kept row; evict it when a better candidate arrives.
        // rank() semantics (ties=true) additionally keeps every row TIED
        // with the current k-th candidate — `rank <= k` retains all
        // boundary ties, so dropping them would be wrong, and the tie
        // buffer is only as large as the true result's boundary group.
        // Memory bound: when the number of distinct keys in this
        // partition exceeds flushKeys, emit everything held and reset —
        // the partial phase then prunes less for those keys, but the
        // final phase re-cuts to k, so high-cardinality keys degrade
        // gracefully instead of growing the map without bound.
        final class KeyState {
          val heap = mutable.PriorityQueue.empty[InternalRow](ord)
          val tied = mutable.ArrayBuffer.empty[InternalRow]
          def insert(row: InternalRow): Unit =
            if (heap.size < ks) heap.enqueue(row.copy())
            else {
              val c = ord.compare(row, heap.head)
              if (c < 0) {
                val evicted = heap.dequeue()
                heap.enqueue(row.copy())
                if (ties) {
                  // tie buffer rows all equal the OLD head; keep them (and
                  // the evictee) only if the boundary value is unchanged
                  if (ord.compare(evicted, heap.head) == 0) tied += evicted
                  else tied.clear()
                }
              } else if (ties && c == 0) tied += row.copy()
            }
          def rows: Iterator[InternalRow] = heap.iterator ++ tied.iterator
        }
        new Iterator[InternalRow] {
          private var heaps = mutable.HashMap.empty[UnsafeRow, KeyState]
          private val pending = mutable.Queue.empty[InternalRow]
          private var inputDone = false

          private def drainHeaps(): Unit = {
            heaps.valuesIterator.foreach(s => pending ++= s.rows)
            heaps = mutable.HashMap.empty
          }

          // consume input until something is emittable: a flush batch
          // (streamed straight to the shuffle writer, keeping memory at
          // flushKeys*k rows) or end-of-input
          private def fill(): Unit = {
            while (pending.isEmpty && iter.hasNext) {
              val row = iter.next()
              val key = keyProj(row)
              heaps.get(key) match {
                case None =>
                  if (heaps.size >= flushKeys) drainHeaps()
                  val s = new KeyState
                  s.insert(row)
                  heaps.put(key.copy(), s)
                case Some(s) => s.insert(row)
              }
            }
            if (pending.isEmpty && !iter.hasNext && !inputDone) {
              inputDone = true
              drainHeaps()
            }
          }

          override def hasNext: Boolean = { fill(); pending.nonEmpty }
          override def next(): InternalRow = { fill(); pending.dequeue() }
        }
      }, preservesPartitioning = true)
    } else {
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(ps, childOutput)
        val ord = GenerateOrdering.generate(os, childOutput)
        val outProj = UnsafeProjection.create(output, childOutput :+ rankAttr.get)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        var currentKey: UnsafeRow = null
        var pos = 0
        var rank = 0
        // tie detection needs the previous row (rank() only; row_number
        // never compares, so the per-row copy is not paid there)
        var prev: InternalRow = null
        iter.flatMap { row =>
          val key = keyProj(row)
          if (currentKey == null || key != currentKey) {
            currentKey = key.copy()
            pos = 0
            rank = 0
            prev = null
          }
          pos += 1
          if (ties) {
            if (prev == null || ord.compare(row, prev) != 0) rank = pos
            prev = row.copy()
          } else rank = pos
          if (rank <= ks) {
            rankRow.setInt(0, rank)
            Some(outProj(joined(row, rankRow)): InternalRow)
          } else None
        }
      }, preservesPartitioning = false)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def simpleString(maxFields: Int): String =
    s"TopKPerKey(k=$k, ${if (isFinal) "final" else "partial"}${if (rankTies) ", rank" else ""})"
}

object TopKPerKeyExec {
  /** Partial-phase distinct-key cap before an emit-and-reset flush. */
  val DefaultFlushKeys: Int = 1 << 20
}

object GraftStrategies {
  /** Idempotent imperative install for sessions built without
    * `spark.sql.extensions` (mirrors [[GraftOptimizations.install]]).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
}
