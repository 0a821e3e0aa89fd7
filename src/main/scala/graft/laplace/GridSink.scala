package graft.laplace

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** O14/O15 sinks: the reference's stdout grid dump and stderr stats line,
  * reproduced byte-for-byte so a user of the reference binaries can diff
  * outputs directly.
  *
  * Format contract (studied from `/root/reference`):
  *  - grid dump: rows in order, cells `%.10f` space-separated, one row
  *    per line (`laplace-seq.c:99-111`; par gathers rank blocks in rank
  *    order first, `laplace-par.c:546-574`);
  *  - stats: `Statistics: duration(s)=%f #iters=%d diff=%.10f
  *    epsilon=%.10f` (`laplace-seq.c:224-226`).
  *
  * Scale note: `format` collects — it IS the reference's gather-to-rank-0
  * print, driver-memory bounded by design. The distributed sink for big
  * grids is `Result.grid.orderBy("i","j").write.parquet(...)`.
  */
object GridSink {

  /** The ordered `%.10f` dump of a solver result's grid. */
  def format(res: Laplace.Result, n: Int): String = {
    val cells = res.grid.orderBy("i", "j").collect()
    require(cells.length == n * n, s"expected ${n * n} cells, got ${cells.length}")
    cells.grouped(n)
      .map(_.map(r => f"${r.getDouble(2)}%.10f").mkString(" "))
      .mkString("", "\n", "\n")
  }

  /** The reference's stats line (duration supplied by the caller). */
  def statsLine(res: Laplace.Result, n: Int, durationSec: Double): String =
    f"Statistics: duration(s)=$durationSec%f #iters=${res.iterations}%d " +
      f"diff=${res.finalDiff}%.10f epsilon=${Laplace.epsilon(n)}%.10f"

  /** CLI-compatible runner: `[--verbose] N`, like the reference mains. */
  def main(args: Array[String]): Unit = {
    val (verbose, n) = args match {
      case Array("--verbose", s) => (true, s.toInt)
      case Array(s)              => (false, s.toInt)
      case _ =>
        System.err.println("Usage: [--verbose] <num_points_per_dimension>")
        sys.exit(1)
    }
    if (n < 2) { System.err.println("numPointsPerDimension must be >= 2"); sys.exit(1) }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val res = BlockSolver.solve(spark, n)
    val dt = (System.nanoTime() - t0) / 1e9
    System.err.println(statsLine(res, n, dt))
    if (verbose) print(format(res, n))
    spark.stop()
  }
}
