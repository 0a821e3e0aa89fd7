package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DSv2 grid connector: value parity with the DataFrame generator,
  * the reference's remainder-aware block partitioning, and column
  * pruning reaching the partition reader.
  */
class GridSourceSpec extends SparkSpec {

  private def grid(n: Int, parts: Int) =
    spark.read.format("graft.sources.GridSourceProvider")
      .option("n", n.toString).option("partitions", parts.toString).load()

  test("connector rows equal the DataFrame generator bit-for-bit") {
    for (n <- Seq(2, 5, 16)) {
      val got = grid(n, 3).orderBy("i", "j").collect()
      val want = graft.laplace.GridGen.cells(spark, n).orderBy("i", "j").collect()
      assert(got.sameElements(want), s"n=$n")
    }
  }

  test("partition planning follows the reference's remainder-aware block split") {
    // n=10 over 4 partitions -> widths 3,3,2,2 (first n%p blocks +1 row)
    val perPartition = grid(10, 4)
      .select(col("i"), expr("spark_partition_id()").as("p"))
      .groupBy("p").agg(countDistinct(col("i")).as("rows"))
      .orderBy("p").collect().map(r => r.getLong(1))
    assert(perPartition.toSeq == Seq(3L, 3L, 2L, 2L), perPartition.toSeq)
    // more partitions than rows: planner caps at n non-empty blocks
    assert(grid(3, 8).rdd.getNumPartitions == 3)
  }

  test("column pruning reaches the reader (scan schema drops unused columns)") {
    val df = grid(32, 4).filter(col("i") === 0).select("i")
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).getOrElse("")
    // DSv2 scans print their pruned output list: only `i` may appear
    assert(scanLine.contains("[i#"), scanLine)
    assert(!scanLine.contains("j#") && !scanLine.contains("v#"), scanLine)
    assert(df.count() == 32)
  }

  test("i-range pushdown prunes partitions (reference per-rank row ownership)") {
    // n=64 over 8 partitions -> 8-row blocks; i in [8, 24) covers blocks 1,2
    val df = grid(64, 8).filter(col("i") >= 8 && col("i") < 24)
    assert(df.rdd.getNumPartitions == 2, s"planned ${df.rdd.getNumPartitions} blocks")
    // values identical to filtering the unpruned generator
    val want = graft.laplace.GridGen.cells(spark, 64)
      .filter(col("i") >= 8 && col("i") < 24).orderBy("i", "j").collect()
    assert(df.orderBy("i", "j").collect().sameElements(want))
    // the consumed range is visible in the scan's description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rows=[8,24)"), plan)
  }

  test("i-range pushdown is exact: no residual rows outside the range") {
    // equality picks exactly one block and one row slice
    val eq = grid(10, 4).filter(col("i") === 7)
    assert(eq.rdd.getNumPartitions == 1)
    assert(eq.select(countDistinct(col("j"))).head().getLong(0) == 10)
    assert(eq.count() == 10)
    // empty intersection plans zero partitions and returns nothing
    val none = grid(10, 4).filter(col("i") >= 100)
    assert(none.rdd.getNumPartitions == 0)
    assert(none.count() == 0)
    // a j-predicate is NOT consumed: stays a residual Spark filter, result right
    val mixed = grid(10, 4).filter(col("i") >= 5 && col("j") === 0)
    assert(mixed.count() == 5)
  }

  test("aggregate pushdown: count/min/max answered without materializing cells") {
    val df = grid(1000, 8).agg(
      count(lit(1)).as("n"), min("i").as("mini"), max("i").as("maxi"),
      min("j").as("minj"), max("j").as("maxj"),
      min("v").as("minv"), max("v").as("maxv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates=[count,min_i,max_i,min_j,max_j,min_v,max_v]"), plan)
    val r = df.head()
    assert(r.getLong(0) == 1000L * 1000)
    assert(r.getLong(1) == 0 && r.getLong(2) == 999)
    assert(r.getLong(3) == 0 && r.getLong(4) == 999)
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 9.85)
    // independent value check at a size where the full scan is cheap
    val small = grid(16, 3).agg(count(lit(1)), min("v"), max("v")).head()
    val ref = graft.laplace.GridGen.cells(spark, 16)
      .agg(count(lit(1)), min("v"), max("v")).head()
    assert(small == ref)
  }

  test("aggregate pushdown composes with i-range partition pruning") {
    // rows [8, 24) of a 64-grid: 2 of 8 blocks scheduled, closed forms clamped
    val df = grid(64, 8).filter(col("i") >= 8 && col("i") < 24)
      .agg(count(lit(1)).as("n"), min("v").as("minv"), max("v").as("maxv"))
    assert(df.queryExecution.executedPlan.toString.contains("PushedAggregates=[count"),
      df.queryExecution.executedPlan.toString)
    val r = df.head()
    assert(r.getLong(0) == 16L * 64)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 7.32) // interior rows only
  }

  test("GROUP BY i aggregate pushdown emits per-row closed forms") {
    val df = grid(100, 4).groupBy("i")
      .agg(count(lit(1)).as("n"), min("v").as("minv"), max("v").as("maxv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupBy=[i]"), plan)
    val rows = df.orderBy("i").collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val i = r.getLong(0)
      assert(r.getLong(1) == 100, s"i=$i")
      val (lo, hi) = (r.getDouble(2), r.getDouble(3))
      if (i == 0) assert(lo == 4.56 && hi == 4.56)
      else if (i == 99) assert(lo == 9.85 && hi == 9.85)
      else assert(lo == 0.0 && hi == 7.32, s"i=$i ($lo, $hi)")
    }
    // AVG is not supported -> NOT pushed, falls back to a full scan, right answer
    val avg = grid(16, 3).agg(org.apache.spark.sql.functions.avg("v")).head().getDouble(0)
    val ref = graft.laplace.GridGen.cells(spark, 16).agg(
      org.apache.spark.sql.functions.avg("v")).head().getDouble(0)
    assert(avg == ref)
  }

  test("runtime filtering: a joined dim's i-values prune row blocks at execution") {
    // 64 blocks of 16 rows; the dim's surviving keys (5, 999) live in
    // blocks 0 and 62 — runtime filtering must drop the other 62 blocks
    // AFTER the dim's filter evaluates (there is no static i predicate)
    val dimDir = java.nio.file.Files.createTempDirectory("graft-rtf-dim").toString
    val sp = spark
    import sp.implicits._
    Seq((5L, "keep"), (999L, "keep"), (300L, "drop"), (700L, "drop"))
      .toDF("i", "tier").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tier") === "keep")
    val joined = grid(1024, 64).join(dim, "i").select(col("i"), col("j"))
    val rows = joined.collect() // executes the pruning subquery
    assert(rows.map(_.getLong(0)).toSet == Set(5L, 999L) && rows.length == 2048)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruning"), s"no runtime filter:\n${plan.take(3000)}")
    // the scan physically planned only the two surviving blocks (the
    // SAME QueryExecution that ran — an unexecuted copy has no subquery
    // result to prune with)
    // AQE hides the scan inside AdaptiveSparkPlanExec / QueryStageExec,
    // whose executed plans are fields, not tree children — recurse manually
    def gridScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        gridScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        gridScans(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.scan.isInstanceOf[GridScan] => Seq(b.inputRDD.getNumPartitions)
    }.flatten
    val scans = gridScans(joined.queryExecution.executedPlan)
    assert(scans == Seq(2), s"scan partition counts: $scans")
  }

  test("runtime filtering: a join on a PRUNED-away i must not crash planning") {
    // filterAttributes() may only advertise columns that survive column
    // pruning — Spark resolves each advertised attribute against the
    // scan's actual output and throws for a missing one (regression:
    // this crashed with 'Unable to resolve i given [j]')
    val sp = spark
    import sp.implicits._
    val dim = Seq((0L, "keep"), (3L, "keep")).toDF("j", "tier")
    val got = grid(64, 8).select("j", "v").join(dim.filter(col("tier") === "keep"), "j")
    assert(got.count() == 2 * 64) // every i row contributes j=0 and j=3
  }
}
