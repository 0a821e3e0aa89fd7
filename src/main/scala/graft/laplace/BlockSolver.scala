package graft.laplace

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.util.AccumulatorV2

/** One grid row: row index + all N cell values. The performance
  * representation from SURVEY.md §1.4 — mirrors the reference's 1-D
  * block-row partitioning (`laplace-par.c:245-251`) so the 5-point
  * stencil's east/west neighbors are intra-row array reads and only
  * north/south cross rows.
  */
final case class GridRow(i: Int, vals: Array[Double])

/** Elementwise-max accumulator over a fixed-length vector: slot t holds
  * the global max |diff| of iteration t within a superstep — the
  * Spark-native analogue of the reference's per-rank partial max +
  * `MPI_Allreduce(MPI_MAX)` (`laplace-par.c:469-472,503-505`), batched
  * over k iterations. Task retries can re-add values, but max is
  * idempotent, so the result is still exact.
  */
final class MaxVecAccumulator(k: Int)
    extends AccumulatorV2[(Int, Double), Array[Double]] {
  private var m: Array[Double] = Array.fill(k)(Double.NegativeInfinity)
  override def isZero: Boolean = m.forall(_ == Double.NegativeInfinity)
  override def copy(): MaxVecAccumulator = {
    val a = new MaxVecAccumulator(k); System.arraycopy(m, 0, a.m, 0, k); a
  }
  override def reset(): Unit = java.util.Arrays.fill(m, Double.NegativeInfinity)
  override def add(v: (Int, Double)): Unit = if (v._2 > m(v._1)) m(v._1) = v._2
  override def merge(o: AccumulatorV2[(Int, Double), Array[Double]]): Unit =
    o match {
      case x: MaxVecAccumulator =>
        var i = 0
        while (i < k) { if (x.m(i) > m(i)) m(i) = x.m(i); i += 1 }
    }
  /** NegativeInfinity (no interior cells updated) reads as diff 0.0 —
    * the N=2 all-boundary case converges in 1 iteration with diff 0.
    */
  override def value: Array[Double] =
    m.map(x => if (x == Double.NegativeInfinity) 0.0 else x)
}

/** Contiguous 1-D block-row layout: block b owns rows [lo(b), hi(b)],
  * sizes differing by at most one — the reference's decomposition
  * (`laplace-par.c:245-251`) made explicit so halo routing is closed-form
  * arithmetic (no driver lookups).
  */
final case class BlockLayout(n: Int, blocks: Int) {
  private val base = n / blocks
  private val rem = n % blocks
  def lo(b: Int): Int = b * base + math.min(b, rem)
  def hi(b: Int): Int = lo(b + 1) - 1
  def blockOf(i: Int): Int =
    if (i < rem * (base + 1)) i / (base + 1)
    else rem + (i - rem * (base + 1)) / base
  /** Blocks (other than the owner) whose ghost zone of depth `ghost`
    * contains row i: exactly those whose row range intersects
    * [i-ghost, i+ghost] — a contiguous id range, possibly spanning
    * several thin blocks when block size < ghost.
    */
  def ghostDests(i: Int, ghost: Int): Range = {
    val first = blockOf(math.max(0, i - ghost))
    val last = blockOf(math.min(n - 1, i + ghost))
    first to last
  }
}

/** Identity partitioner on block ids: block b lives in partition b, so a
  * `partitionBy` on ghost messages IS the reference's peer-to-peer halo
  * send (`laplace-par.c:371-417`) — each executor receives exactly the
  * edge rows its blocks need, nothing routes through the driver.
  */
final class BlockPartitioner(blocks: Int) extends Partitioner {
  override def numPartitions: Int = blocks
  override def getPartition(key: Any): Int = key.asInstanceOf[Int]
  override def equals(o: Any): Boolean = o match {
    case p: BlockPartitioner => p.numPartitions == blocks
    case _ => false
  }
  override def hashCode: Int = blocks
}

/** Block-row SOR solver with TEMPORAL BLOCKING: each superstep runs k
  * full red-black iterations per task using a 2k-row ghost zone on each
  * partition edge.
  *
  * Why: the reference exchanges one halo per half-sweep
  * (`laplace-par.c:371-417`); a naive Spark port pays a full job launch
  * per half-sweep, so scheduling overhead dominates any realistic grid.
  * Classic ghost-zone (trapezoidal) blocking amortizes that: per
  * superstep,
  *
  *  1. ONE keyed shuffle routes every row within 2k rows of a block
  *     boundary to the neighboring blocks that need it (`ghostDests` is
  *     closed-form, so the exchange is executor-to-executor — the
  *     driver never sees a cell value);
  *  2. a co-partitioned `cogroup` (narrow on the state side — both RDDs
  *     share the [[BlockPartitioner]]) hands each block its owned rows
  *     plus ghosts, and the task runs 2k half-sweeps in-place, locally.
  *
  * Correctness of the redundant compute: each half-sweep invalidates one
  * more row at each ghost edge (its neighbor is missing), so after k
  * iterations the stale band is exactly the 2k ghost rows — every OWNED
  * row has seen only valid data and equals the sequential result
  * bit-for-bit (same per-cell arithmetic order as `laplace-seq.c:196`).
  * In-place updates are safe because a half-sweep writes only the active
  * color and reads only the opposite color (red-black independence), and
  * across half-sweeps in-place is precisely the reference's Gauss-Seidel
  * semantics (`laplace-seq.c:198`).
  *
  * Convergence stays per-iteration exact: each task records the max
  * |diff| of its OWNED rows for every iteration t of the superstep on a
  * [[MaxVecAccumulator]] (ghost updates are duplicates of the owner's —
  * and max is idempotent anyway). The driver finds the first t with
  * maxDiff <= epsilon; if it lands mid-superstep, the tail is re-run
  * from the previous materialized state for exactly t+1 iterations, so
  * the final grid/#iters/diff match the reference's stop-after-that-
  * iteration semantics exactly.
  *
  * At 1000 executors on a 10^6-point dimension, per-superstep network is
  * O(P·k·N) doubles moving point-to-point between neighboring executors
  * (the same volume the reference's MPI halo moves, amortized over k
  * iterations) and job count drops 2k-fold vs per-sweep exchange; driver
  * traffic per superstep is one accumulator vector of k doubles per
  * task, independent of N.
  */
object BlockSolver {

  /** State rows keyed by owning block, partitioned block b -> partition b. */
  private def initialState(spark: SparkSession, layout: BlockLayout): RDD[(Int, GridRow)] = {
    val n = layout.n
    spark.sparkContext
      .parallelize(0 until layout.blocks, layout.blocks)
      .flatMap { b =>
        (layout.lo(b) to layout.hi(b)).iterator.map(i =>
          (b, GridRow(i, Array.tabulate(n)(j => Laplace.initialValue(i, j, n)))))
      }
      .partitionBy(new BlockPartitioner(layout.blocks))
  }

  def initialRows(spark: SparkSession, n: Int, numBlocks: Int): Dataset[GridRow] = {
    import spark.implicits._
    val blocks = math.max(1, math.min(numBlocks, n))
    spark.createDataset(initialState(spark, BlockLayout(n, blocks)).values)
  }

  /** Run `kk` full iterations in one job. Emits owned rows only. The only
    * wide dependency is the ghost-row `partitionBy` — O(blocks * 2kk)
    * rows — and the cogroup is narrow on both sides (shared partitioner).
    */
  private def superstep(state: RDD[(Int, GridRow)], layout: BlockLayout, kk: Int,
      omega: Double, acc: MaxVecAccumulator): RDD[(Int, GridRow)] = {
    val n = layout.n
    val ghost = 2 * kk
    val part = new BlockPartitioner(layout.blocks)
    val lay = layout
    val ghosts = state
      .flatMap { case (b, r) => lay.ghostDests(r.i, ghost).collect {
        case d if d != b => (d, r)
      } }
      .partitionBy(part)
    val oneMinusOmega = 1.0 - omega

    state.cogroup(ghosts, part).flatMapValues { case (ownedIt, ghostIt) =>
      val owned = ownedIt.toArray.sortBy(_.i)
      if (owned.isEmpty) Iterator.empty
      else {
        val lo = owned.head.i
        val hi = owned.last.i
        val extLo = math.max(0, lo - ghost)
        val extHi = math.min(n - 1, hi + ghost)
        val work = new Array[Array[Double]](extHi - extLo + 1)
        owned.foreach(r => work(r.i - extLo) = r.vals.clone())
        ghostIt.foreach { r =>
          if (r.i >= extLo && r.i <= extHi) work(r.i - extLo) = r.vals.clone()
        }
        val localMax = Array.fill(kk)(Double.NegativeInfinity)
        val rStart = math.max(extLo + 1, 1)
        val rEnd = math.min(extHi - 1, n - 2)
        var t = 0
        while (t < kk) {
          var color = 0
          while (color <= 1) {
            var r = rStart
            while (r <= rEnd) {
              val up = work(r - 1 - extLo)
              val cur = work(r - extLo)
              val down = work(r + 1 - extLo)
              val ownedRow = r >= lo && r <= hi
              var j = 1 + (if (r % 2 == color) 1 else 0)
              while (j < n - 1) {
                val tmp = (up(j) + down(j) + cur(j - 1) + cur(j + 1)) / 4.0
                val v2 = oneMinusOmega * cur(j) + omega * tmp
                if (ownedRow) {
                  val diff = math.abs(cur(j) - v2)
                  if (diff > localMax(t)) localMax(t) = diff
                }
                cur(j) = v2
                j += 2
              }
              r += 1
            }
            color += 1
          }
          t += 1
        }
        t = 0
        while (t < kk) {
          if (localMax(t) != Double.NegativeInfinity) acc.add((t, localMax(t)))
          t += 1
        }
        owned.iterator.map(r => GridRow(r.i, work(r.i - extLo)))
      }
    }
  }

  def solve(spark: SparkSession, n: Int, numBlocks: Int = 0,
            maxIterations: Int = Int.MaxValue, stepK: Int = 16): Laplace.Result = {
    val requested = if (numBlocks > 0) numBlocks else spark.sparkContext.defaultParallelism
    val layout = BlockLayout(n, math.max(1, math.min(requested, n)))
    val om = Laplace.omega(n)
    val eps = Laplace.epsilon(n)

    var state = initialState(spark, layout)
    state.localCheckpoint()
    state.count()
    var iterations = 0
    var maxDiff = 0.0
    var converged = false
    val history = Seq.newBuilder[Double]
    while (!converged && iterations < maxIterations) {
      val kk = math.min(stepK.toLong, maxIterations.toLong - iterations).toInt
      val acc = new MaxVecAccumulator(kk)
      spark.sparkContext.register(acc, s"laplaceMaxDiff@$iterations")
      val next = superstep(state, layout, kk, om, acc)
      next.localCheckpoint()
      next.count()
      val maxes = acc.value
      val idx = maxes.indexWhere(_ <= eps)
      if (idx < 0 || idx == kk - 1) {
        state.unpersist(blocking = false)
        state = next; iterations += kk
        history ++= maxes
        maxDiff = maxes(kk - 1); converged = idx >= 0
      } else {
        // converged mid-superstep: redo exactly idx+1 iterations so the
        // materialized grid is the state right after the converging
        // iteration (the reference stops there: `laplace-seq.c:209`)
        next.unpersist(blocking = false)
        val kk2 = idx + 1
        val acc2 = new MaxVecAccumulator(kk2)
        spark.sparkContext.register(acc2, s"laplaceMaxDiffTail@$iterations")
        val tail = superstep(state, layout, kk2, om, acc2)
        tail.localCheckpoint()
        tail.count()
        state.unpersist(blocking = false)
        state = tail
        iterations += kk2; history ++= acc2.value
        maxDiff = acc2.value(kk2 - 1); converged = true
      }
    }
    import spark.implicits._
    Laplace.Result(toCells(spark.createDataset(state.values)), iterations, maxDiff,
      history.result())
  }

  /** Flatten GridRow back to the canonical (i, j, v) cell table. */
  def toCells(ds: Dataset[GridRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap(r => r.vals.iterator.zipWithIndex.map { case (v, j) => (r.i, j, v) })
      .toDF("i", "j", "v")
      .select(col("i"), col("j"), col("v"))
  }
}
