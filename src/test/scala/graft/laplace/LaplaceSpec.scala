package graft.laplace

import graft.SparkSpec

/** Differential tests: both Spark solvers must match the scalar oracle
  * BIT-FOR-BIT (per-cell arithmetic order is fixed; max is exact), per
  * SURVEY.md §5. Grid sizes cover: all-boundary (N=2), single interior
  * cell (N=3), even/odd parity (N=4,5), and a golden run (N=16).
  */
class LaplaceSpec extends SparkSpec {

  private def cellsOf(res: Laplace.Result): Map[(Int, Int), Double] =
    res.grid.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

  private def checkAgainstOracle(n: Int, res: Laplace.Result): Unit = {
    val oracle = ScalarOracle.solve(n)
    assert(res.iterations === oracle.iterations, s"N=$n iterations")
    assert(res.finalDiff === oracle.finalDiff, s"N=$n finalDiff (exact)")
    val got = cellsOf(res)
    assert(got.size === n * n)
    for (i <- 0 until n; j <- 0 until n)
      assert(got((i, j)) === oracle.grid(i)(j), s"N=$n cell ($i,$j) exact")
  }

  test("omega/epsilon formulas match hand-computed doubles") {
    val p = math.cos(math.Pi / 16)
    assert(Laplace.omega(16) === 1.6 / (1.0 + math.sqrt(1.0 - p * p)))
    assert(Laplace.epsilon(16) === 0.000002 / (2.0 - 1.25 * Laplace.omega(16)))
  }

  test("grid generator: boundary precedence and interior zeros (N=5)") {
    val g = GridGen.cells(spark, 5).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(g((0, 0)) === 4.56)   // i==0 wins at corners
    assert(g((4, 0)) === 9.85)   // i==N-1 wins over j==0
    assert(g((2, 0)) === 7.32)
    assert(g((2, 4)) === 6.88)
    assert(g((2, 2)) === 0.0)
    assert(g.size === 25)
  }

  test("N=2: all boundary, converges in 1 iteration with diff 0") {
    val res = BlockSolver.solve(spark, 2, numBlocks = 2)
    assert(res.iterations === 1)
    assert(res.finalDiff === 0.0)
    checkAgainstOracle(2, res)
  }

  test("cell solver matches scalar oracle bit-for-bit (N=3,4,5)") {
    for (n <- Seq(3, 4, 5)) checkAgainstOracle(n, CellSolver.solve(spark, n))
  }

  test("block solver matches scalar oracle bit-for-bit (N=3,4,5, varying blocks)") {
    checkAgainstOracle(3, BlockSolver.solve(spark, 3, numBlocks = 2))
    checkAgainstOracle(4, BlockSolver.solve(spark, 4, numBlocks = 3))
    checkAgainstOracle(5, BlockSolver.solve(spark, 5, numBlocks = 4))
  }

  test("golden N=16: block solver, partition-count invariant") {
    val r1 = BlockSolver.solve(spark, 16, numBlocks = 1)
    val r4 = BlockSolver.solve(spark, 16, numBlocks = 4)
    checkAgainstOracle(16, r1)
    checkAgainstOracle(16, r4)
  }

  test("boundary cells never change (N=8, block solver)") {
    val res = BlockSolver.solve(spark, 8, numBlocks = 3)
    val got = cellsOf(res)
    for (k <- 0 until 8) {
      assert(got((0, k)) === Laplace.initialValue(0, k, 8))
      assert(got((7, k)) === Laplace.initialValue(7, k, 8))
      assert(got((k, 0)) === Laplace.initialValue(k, 0, 8))
      assert(got((k, 7)) === Laplace.initialValue(k, 7, 8))
    }
  }

  test("GridSink dump matches the scalar oracle's %.10f format byte-for-byte (N=12)") {
    val res = BlockSolver.solve(spark, 12, numBlocks = 3)
    val oracle = ScalarOracle.solve(12)
    val expected = oracle.grid
      .map(_.map(v => f"$v%.10f").mkString(" "))
      .mkString("", "\n", "\n")
    assert(GridSink.format(res, 12) == expected)
    val stats = GridSink.statsLine(res, 12, 1.25)
    assert(stats.startsWith("Statistics: duration(s)=1.25"))
    assert(stats.contains(s"#iters=${oracle.iterations}"))
    assert(stats.contains(f"diff=${oracle.finalDiff}%.10f"))
    assert(stats.contains(f"epsilon=${Laplace.epsilon(12)}%.10f"))
  }

  test("block layout: closed-form ownership + multi-hop ghost routing") {
    for ((n, blocks) <- Seq((16, 4), (5, 4), (17, 3), (3, 2))) {
      val lay = BlockLayout(n, blocks)
      assert(lay.lo(0) === 0)
      assert(lay.hi(blocks - 1) === n - 1)
      for (b <- 0 until blocks; i <- lay.lo(b) to lay.hi(b))
        assert(lay.blockOf(i) === b, s"n=$n blocks=$blocks i=$i")
      // ghost routing: block d receives row i iff i is within `ghost`
      // rows of d's range — including across several thin blocks
      for (ghost <- Seq(1, 2, 32); i <- 0 until n; d <- 0 until blocks) {
        val needs = i >= lay.lo(d) - ghost && i <= lay.hi(d) + ghost
        assert(lay.ghostDests(i, ghost).contains(d) === needs,
          s"n=$n blocks=$blocks ghost=$ghost i=$i d=$d")
      }
    }
  }

  test("superstep halo is shuffle-routed: one job per superstep, no driver collect") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val res = BlockSolver.solve(spark, 16, numBlocks = 4, stepK = 16)
      // listener events are async; jobs have all STARTED by the time
      // solve() returns (each superstep's job is awaited), but give the
      // bus a beat to drain
      Thread.sleep(500)
      val supersteps = (res.iterations + 15) / 16
      // init materialization + one job per superstep + at most one
      // mid-superstep tail redo; the old driver-routed halo ran an extra
      // collect job per superstep and would blow this bound
      assert(jobs.get <= supersteps + 3,
        s"${jobs.get} jobs for $supersteps supersteps — halo collect crept back in")
      checkAgainstOracle(16, res)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("single color-0 half-sweep touches only (i+j) even interior cells (N=6)") {
    val n = 6
    val om = Laplace.omega(n)
    val init = GridGen.cells(spark, n)
      .withColumn("d", org.apache.spark.sql.functions.lit(0.0))
    val after = CellSolver.sweep(init, 0, n, om).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (i <- 0 until n; j <- 0 until n) {
      val interior = i >= 1 && i <= n - 2 && j >= 1 && j <= n - 2
      val colour0 = (i + j) % 2 == 0
      if (!(interior && colour0))
        assert(after((i, j)) === Laplace.initialValue(i, j, n), s"($i,$j) must not move")
    }
  }
}
