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
        case alias @ Alias(WindowExpression(_: RowNumber, _), _) =>
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
                rankAttr = None, planLater(realChild))
              TopKPerKeyExec(k, w.partitionSpec, w.orderSpec,
                rankAttr = Some(alias.toAttribute), partial) :: Nil
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
    if (!isFinal) {
      val flushKeys = conf.getConfString("spark.graft.topk.partialFlushKeys",
        TopKPerKeyExec.DefaultFlushKeys.toString).toInt
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(ps, childOutput)
        val ord = GenerateOrdering.generate(os, childOutput)
        // PriorityQueue dequeues the MAX w.r.t. the ordering = the worst
        // kept row; evict it when a better candidate arrives.
        // Memory bound: when the number of distinct keys in this
        // partition exceeds flushKeys, emit everything held and reset —
        // the partial phase then prunes less for those keys, but the
        // final phase re-cuts to k, so high-cardinality keys degrade
        // gracefully instead of growing the map without bound.
        new Iterator[InternalRow] {
          private var heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
          private val pending = mutable.Queue.empty[InternalRow]
          private var inputDone = false

          private def drainHeaps(): Unit = {
            heaps.valuesIterator.foreach(h => pending ++= h.iterator)
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
                  val h = mutable.PriorityQueue.empty[InternalRow](ord)
                  h.enqueue(row.copy())
                  heaps.put(key.copy(), h)
                case Some(h) =>
                  if (h.size < ks) h.enqueue(row.copy())
                  else if (ord.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
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
        val outProj = UnsafeProjection.create(output, childOutput :+ rankAttr.get)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        var currentKey: UnsafeRow = null
        var rank = 0
        iter.flatMap { row =>
          val key = keyProj(row)
          if (currentKey == null || key != currentKey) {
            currentKey = key.copy()
            rank = 0
          }
          rank += 1
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
    s"TopKPerKey(k=$k, ${if (isFinal) "final" else "partial"})"
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
