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

/** AccumulatorV2 computing a running max — the Spark-native analogue of the
  * reference's per-rank partial max + `MPI_Allreduce(MPI_MAX)`
  * (`laplace-par.c:469-472,503-505`). Task retries can re-add values, but
  * max is idempotent, so the result is still exact.
  */
final class MaxAccumulator extends AccumulatorV2[Double, Double] {
  private var m: Double = Double.NegativeInfinity
  override def isZero: Boolean = m == Double.NegativeInfinity
  override def copy(): MaxAccumulator = { val a = new MaxAccumulator; a.m = m; a }
  override def reset(): Unit = m = Double.NegativeInfinity
  override def add(v: Double): Unit = if (v > m) m = v
  override def merge(o: AccumulatorV2[Double, Double]): Unit = add(o.value)
  override def value: Double = if (isZero) 0.0 else m
}

/** Block-row SOR solver: `mapPartitions` over `Dataset[GridRow]` with a
  * broadcast halo — the direct Spark analogue of the reference's MPI design.
  *
  * Per half-sweep:
  *  1. collect each partition's FIRST and LAST row (2·P rows — exactly the
  *     halo rows the reference packs and `MPI_Isend`s to rank±1,
  *     `laplace-par.c:120-129,371-417`) and broadcast them;
  *  2. a narrow `mapPartitions` updates the active-color interior cells
  *     from local rows + the broadcast halo. No shuffle at all: per-sweep
  *     network volume is O(P·N) like MPI, vs O(N²) for a shuffle-based
  *     sweep. At 1000 executors on a 10^6-point dimension this is the
  *     difference between moving 16 MB and moving 8 TB per sweep.
  *
  * Within a half-sweep only opposite-color cells are read and only
  * active-color cells are written, so reading the OLD arrays everywhere
  * reproduces the sequential Gauss-Seidel result exactly; across
  * half-sweeps the Dataset is re-materialized, giving the color-1 sweep the
  * color-0 output (`laplace-seq.c:189-199` semantics).
  *
  * maxDiff travels back on a [[MaxAccumulator]] during the materializing
  * action — one job per half-sweep and zero extra aggregation jobs, exactly
  * the partial-max + allreduce shape of the reference.
  *
  * Driver-routed halo (collect + broadcast) is O(P·N) driver memory; for a
  * grid too wide for that, the halo exchange becomes a keyed shuffle of
  * first/last rows only — same asymptotics, no driver hop. Documented
  * trade-off, not needed at any size this repo runs.
  */
object BlockSolver {

  def initialRows(spark: SparkSession, n: Int, numBlocks: Int): Dataset[GridRow] = {
    import spark.implicits._
    val blocks = math.max(1, math.min(numBlocks, n))
    spark.range(0, n.toLong, 1, blocks)
      .map(id => GridRow(id.toInt, Array.tabulate(n)(j => Laplace.initialValue(id.toInt, j, n))))
  }

  private def haloOf(ds: Dataset[GridRow]): Map[Int, Array[Double]] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      var first: GridRow = null
      var last: GridRow = null
      it.foreach { r =>
        if (first == null || r.i < first.i) first = r
        if (last == null || r.i > last.i) last = r
      }
      if (first == null) Iterator.empty
      else if (first.i == last.i) Iterator(first)
      else Iterator(first, last)
    }.collect().map(r => r.i -> r.vals).toMap
  }

  def sweep(ds: Dataset[GridRow], color: Int, n: Int, omega: Double,
            acc: MaxAccumulator): Dataset[GridRow] = {
    import ds.sparkSession.implicits._
    val halo = ds.sparkSession.sparkContext.broadcast(haloOf(ds))
    val oneMinusOmega = 1.0 - omega
    ds.mapPartitions { it =>
      val rows = it.toArray.sortBy(_.i)
      val byI = rows.iterator.map(r => r.i -> r.vals).toMap
      var localMax = Double.NegativeInfinity
      val out = rows.map { r =>
        if (r.i == 0 || r.i == n - 1) r
        else {
          val up = byI.getOrElse(r.i - 1, halo.value(r.i - 1))
          val down = byI.getOrElse(r.i + 1, halo.value(r.i + 1))
          val old = r.vals
          val nv = old.clone()
          var j = 1 + (if (r.i % 2 == color) 1 else 0)
          while (j < n - 1) {
            val tmp = (up(j) + down(j) + old(j - 1) + old(j + 1)) / 4.0
            val v2 = oneMinusOmega * old(j) + omega * tmp
            val diff = math.abs(old(j) - v2)
            if (diff > localMax) localMax = diff
            nv(j) = v2
            j += 2
          }
          GridRow(r.i, nv)
        }
      }
      if (localMax != Double.NegativeInfinity) acc.add(localMax)
      out.iterator
    }
  }

  def solve(spark: SparkSession, n: Int, numBlocks: Int = 0,
            maxIterations: Int = Int.MaxValue): Laplace.Result = {
    val blocks = if (numBlocks > 0) numBlocks else spark.sparkContext.defaultParallelism
    val om = Laplace.omega(n)
    val eps = Laplace.epsilon(n)
    val acc = new MaxAccumulator
    spark.sparkContext.register(acc, "laplaceMaxDiff")

    var ds = initialRows(spark, n, blocks).localCheckpoint(true)
    var iterations = 0
    var maxDiff = 0.0
    var continue = true
    while (continue && iterations < maxIterations) {
      acc.reset()
      // localCheckpoint(eager) materializes each half-sweep: the color-1
      // sweep reads color-0 output (Gauss-Seidel), lineage stays O(1), and
      // the accumulator is populated by the materializing job itself.
      val g0 = sweep(ds, 0, n, om, acc).localCheckpoint(true)
      val g1 = sweep(g0, 1, n, om, acc).localCheckpoint(true)
      maxDiff = acc.value
      ds = g1
      iterations += 1
      continue = maxDiff > eps
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
