package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (the c03/q155 probe protocol): per-phase wall breakdown
  * of g15_ktruss at sf0.1 — edge-set build, per-round support join +
  * peel + counts — so a floor claim ("the wedge join IS the cost") is
  * measured, not argued. Run: `sbt "runMain graft.operators.TrussProbe"`.
  */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val e0 = t("e0 simhash pairs + checkpoint") {
        Dedup.simhashPairsShared(spark, d)
          .select(col("doc_a").as("a"), col("doc_b").as("b")).localCheckpoint()
      }
      println(s"[probe] e0 edges = ${e0.count()}")
      val deg = e0.select(col("a").as("n")).unionAll(e0.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      println(s"[probe] vertices = ${deg.count()}, maxdeg = ${deg.agg(max(col("dg"))).collect()(0).getLong(0)}")
      var live = e0
      var prevN = e0.count()
      var round = 0
      var fixed = false
      while (round < 4 && !fixed) {
        round += 1
        val sup = t(s"round $round supportOf") {
          Graph.trussSupportOf(live).localCheckpoint()
        }
        live = t(s"round $round peel+checkpoint") {
          live.join(sup, col("a") === col("u") && col("b") === col("v"), "left")
            .filter(coalesce(col("support"), lit(0L)) >= 2)
            .select("a", "b").localCheckpoint()
        }
        val n = live.count()
        println(s"[probe] round $round live = $n (removed ${prevN - n})")
        if (n == prevN) fixed = true
        prevN = n
      }
    }
    spark.stop()
  }
}
