package graft.laplace

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical red-black SOR solver over the cell table (i, j, v, d).
  *
  * Declarative Spark-first reformulation of the reference's sweep
  * (`laplace-seq.c:184-209`): one half-sweep = one DataFrame transform.
  * Cells of the active color gather their 4 neighbors — which are all of
  * the *opposite* color, so a single `explode` of the opposite-color cells
  * into (target, slot, value) contributions followed by a groupBy yields
  * every neighbor sum in ONE shuffle; the reference's halo exchange
  * (`laplace-par.c:371-417`) is just the slice of this shuffle that crosses
  * partition boundaries, and Spark routes it with the same hash exchange it
  * uses for everything else.
  *
  * Bit-parity notes (§2.1 of SURVEY.md):
  *  - neighbor sum is evaluated (up + down + left + right) / 4.0 with
  *    left-associated adds, matching the C expression order;
  *  - v' = (1-omega)*v + omega*tmp with (1-omega) precomputed driver-side;
  *  - only interior cells of the active color change; boundary rows pass
  *    through untouched;
  *  - the only reduction is max(|v - v'|), which is order-insensitive.
  *
  * Gauss-Seidel semantics: the color-1 half-sweep consumes the color-0
  * half-sweep's OUTPUT (not the iteration's input) — pure plan
  * composition. `localCheckpoint` once per iteration truncates lineage,
  * the one failure mode the in-place C update doesn't have. On a durable
  * cluster deployment, swap `localCheckpoint` for `checkpoint` with an
  * HDFS checkpoint dir to survive executor loss.
  */
object CellSolver {

  /** One half-sweep for `color` (0: (i+j) even, 1: odd). Input and output
    * carry a diff column `d`; rows not updated this half-sweep keep their
    * previous `d`, so after the color-1 half-sweep max(d) is exactly the
    * iteration's maxDiff (reset-per-iteration semantics of
    * `laplace-seq.c:188`).
    */
  def sweep(grid: DataFrame, color: Int, n: Int, omega: Double): DataFrame = {
    // Pure map -> shuffle -> reduce, ONE exchange per half-sweep (no
    // self-join): every cell emits itself (slot 4, carrying v and d);
    // opposite-color cells additionally emit 4 neighbor contributions.
    // The groupBy reassembles each cell with its stencil inputs. This
    // also keeps the plan LINEAR in sweep depth (the input is referenced
    // once), so half-sweeps compose without plan-size blowup.
    val opp = (col("i") + col("j")) % 2 === (1 - color)
    val self = struct(col("i").as("ti"), col("j").as("tj"), lit(4).as("slot"),
      col("v").as("nv"), col("d").as("dv"))
    val neigh = array(
      struct((col("i") + 1).as("ti"), col("j").as("tj"), lit(0).as("slot"),
        col("v").as("nv"), lit(0.0).as("dv")),
      struct((col("i") - 1).as("ti"), col("j").as("tj"), lit(1).as("slot"),
        col("v").as("nv"), lit(0.0).as("dv")),
      struct(col("i").as("ti"), (col("j") + 1).as("tj"), lit(2).as("slot"),
        col("v").as("nv"), lit(0.0).as("dv")),
      struct(col("i").as("ti"), (col("j") - 1).as("tj"), lit(3).as("slot"),
        col("v").as("nv"), lit(0.0).as("dv")))

    val active = col("ti").between(1, n - 2) && col("tj").between(1, n - 2) &&
      (col("ti") + col("tj")) % 2 === color
    val tmp = (col("up") + col("down") + col("left") + col("right")) / 4.0
    val vNew = lit(1.0 - omega) * col("sv") + lit(omega) * tmp

    grid
      .select(explode(when(opp, concat(array(self), neigh))
        .otherwise(array(self))).as("c"))
      .select(col("c.ti"), col("c.tj"), col("c.slot"), col("c.nv"), col("c.dv"))
      .filter(col("ti").between(0, n - 1) && col("tj").between(0, n - 1))
      .groupBy("ti", "tj")
      .agg(
        max(when(col("slot") === 0, col("nv"))).as("up"),
        max(when(col("slot") === 1, col("nv"))).as("down"),
        max(when(col("slot") === 2, col("nv"))).as("left"),
        max(when(col("slot") === 3, col("nv"))).as("right"),
        max(when(col("slot") === 4, col("nv"))).as("sv"),
        max(when(col("slot") === 4, col("dv"))).as("sd"))
      .select(
        col("ti").as("i"), col("tj").as("j"),
        when(active, vNew).otherwise(col("sv")).as("v"),
        when(active, abs(col("sv") - vNew)).otherwise(col("sd")).as("d"))
  }

  def solve(spark: SparkSession, n: Int, maxIterations: Int = Int.MaxValue): Laplace.Result = {
    val om = Laplace.omega(n)
    val eps = Laplace.epsilon(n)
    // Size the per-sweep shuffle to the grid: ~50k cells per reduce
    // partition, capped at the cluster's parallelism. A 32-partition
    // shuffle over a 64-cell grid is pure scheduling overhead; at 10^6
    // points per dimension the same formula yields full parallelism.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(1L, math.min(n.toLong * n / 50000,
      spark.sparkContext.defaultParallelism.toLong))
    // AQE's per-iteration query-stage re-planning is pure overhead once the
    // shuffle is right-sized; getOption preserves "unset" across restore
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      var grid = GridGen.cells(spark, n).withColumn("d", lit(0.0)).localCheckpoint(true)
      var iterations = 0
      var maxDiff = 0.0
      var continue = true
      val history = Seq.newBuilder[Double]
      while (continue && iterations < maxIterations) {
        // Gauss-Seidel needs the color-1 sweep to READ the color-0 output —
        // that's plan composition, not materialization; one localCheckpoint
        // per iteration truncates lineage. The observed max(d) rides the
        // checkpoint job (the partial/final max inside it is the
        // reference's O5/O6 shape). NOTE: batching 2 iterations per
        // checkpoint was measured SLOWER — the deeper plan pays more in
        // per-loop analysis/codegen than the saved job launch; the block
        // solver is the throughput path.
        val obs = org.apache.spark.sql.Observation()
        val prev = grid
        grid = sweep(sweep(grid, 0, n, om), 1, n, om)
          .observe(obs, max(col("d")).as("maxd"))
          .localCheckpoint(true)
        // the superseded iteration's checkpoint blocks would otherwise stay
        // pinned for the life of the process — one per iteration
        graft.operators.Iterate.release(prev)
        maxDiff = obs.get("maxd").asInstanceOf[Double]
        history += maxDiff
        iterations += 1
        continue = maxDiff > eps
      }
      Laplace.Result(grid.select("i", "j", "v"), iterations, maxDiff, history.result())
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
  }
}
