package graft.laplace

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

/** Block-row SOR solver with TEMPORAL BLOCKING: `mapPartitions` over
  * `Dataset[GridRow]` runs k full red-black iterations per Spark job
  * using a 2k-row ghost zone on each partition edge.
  *
  * Why: the reference exchanges one halo per half-sweep
  * (`laplace-par.c:371-417`); a naive Spark port pays a full job launch
  * + halo collect per half-sweep, so scheduling overhead dominates any
  * realistic grid. Classic ghost-zone (trapezoidal) blocking amortizes
  * that: per superstep,
  *
  *  1. ONE collect gathers every row within 2k rows of a partition
  *     boundary (the k-deep halo; O(P·k·N) doubles) and broadcasts it;
  *  2. ONE narrow `mapPartitions` extends each block with its ghost
  *     rows and runs 2k half-sweeps in-place, locally.
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
  * O(P·k·N) broadcast vs O(N²) for a shuffle-based sweep, and job count
  * drops 2k-fold; driver-routed halo is the documented trade-off (swap
  * for a keyed shuffle of edge rows if P·k·N outgrows the driver).
  */
object BlockSolver {

  def initialRows(spark: SparkSession, n: Int, numBlocks: Int): Dataset[GridRow] = {
    import spark.implicits._
    val blocks = math.max(1, math.min(numBlocks, n))
    spark.range(0, n.toLong, 1, blocks)
      .map(id => GridRow(id.toInt, Array.tabulate(n)(j => Laplace.initialValue(id.toInt, j, n))))
  }

  /** Run `kk` full iterations in one job. Emits owned rows only. */
  private def superstep(ds: Dataset[GridRow], kk: Int, n: Int, omega: Double,
      acc: MaxVecAccumulator): Dataset[GridRow] = {
    import ds.sparkSession.implicits._
    val ghost = 2 * kk
    // every row within `ghost` of its partition's edge — superset of what
    // any neighbor needs (even across thin partitions, see Scaladoc)
    val halo = ds.mapPartitions { it =>
      val rows = it.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val lo = rows.iterator.map(_.i).min
        val hi = rows.iterator.map(_.i).max
        rows.iterator.filter(r => r.i - lo < ghost || hi - r.i < ghost)
      }
    }.collect().map(r => r.i -> r.vals).toMap
    val hb = ds.sparkSession.sparkContext.broadcast(halo)
    val oneMinusOmega = 1.0 - omega

    ds.mapPartitions { it =>
      val owned = it.toArray.sortBy(_.i)
      if (owned.isEmpty) Iterator.empty
      else {
        val lo = owned.head.i
        val hi = owned.last.i
        val extLo = math.max(0, lo - ghost)
        val extHi = math.min(n - 1, hi + ghost)
        val work = new Array[Array[Double]](extHi - extLo + 1)
        owned.foreach(r => work(r.i - extLo) = r.vals.clone())
        var i = extLo
        while (i <= extHi) {
          if (work(i - extLo) == null) work(i - extLo) = hb.value(i).clone()
          i += 1
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
    val blocks = if (numBlocks > 0) numBlocks else spark.sparkContext.defaultParallelism
    val om = Laplace.omega(n)
    val eps = Laplace.epsilon(n)

    var ds = initialRows(spark, n, blocks).localCheckpoint(true)
    var iterations = 0
    var maxDiff = 0.0
    var converged = false
    while (!converged && iterations < maxIterations) {
      val kk = math.min(stepK.toLong, maxIterations.toLong - iterations).toInt
      val acc = new MaxVecAccumulator(kk)
      spark.sparkContext.register(acc, s"laplaceMaxDiff@$iterations")
      val next = superstep(ds, kk, n, om, acc).localCheckpoint(true)
      val maxes = acc.value
      val idx = maxes.indexWhere(_ <= eps)
      if (idx < 0) {
        ds = next; iterations += kk; maxDiff = maxes(kk - 1)
      } else if (idx == kk - 1) {
        ds = next; iterations += kk; maxDiff = maxes(idx); converged = true
      } else {
        // converged mid-superstep: redo exactly idx+1 iterations so the
        // materialized grid is the state right after the converging
        // iteration (the reference stops there: `laplace-seq.c:209`)
        val kk2 = idx + 1
        val acc2 = new MaxVecAccumulator(kk2)
        spark.sparkContext.register(acc2, s"laplaceMaxDiffTail@$iterations")
        // eager localCheckpoint materializes, populating acc2
        ds = superstep(ds, kk2, n, om, acc2).localCheckpoint(true)
        iterations += kk2; maxDiff = acc2.value(kk2 - 1); converged = true
      }
    }
    Laplace.Result(toCells(ds), iterations, maxDiff)
  }

  /** Flatten GridRow back to the canonical (i, j, v) cell table. */
  def toCells(ds: Dataset[GridRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap(r => r.vals.iterator.zipWithIndex.map { case (v, j) => (r.i, j, v) })
      .toDF("i", "j", "v")
      .select(col("i"), col("j"), col("v"))
  }
}
