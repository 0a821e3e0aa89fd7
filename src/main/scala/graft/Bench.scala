package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Per query: one warm-up (recorded as "first", the cold
  * plan/codegen cost) then 3 timed runs, reporting the MEDIAN as the query's
  * headline number. Single-shot timings in a shared JVM spike 4-10x on
  * individual queries (GC, codegen, file-listing races), which made round-over-
  * round comparison of BENCH_r*.json impossible; medians of warmed runs agree
  * within ~10% run-to-run.
  *
  * Output is one JSON line: {"metric":"total","value":<sum of medians over
  * SUCCESSFUL queries>,"unit":"sec","failed":N,"queries":{name:median,...},
  * "first":{name:coldSecs,...},"sf":...}. "queries" keeps the flat
  * name->seconds shape the driver harness parses; failed queries are reported
  * as negative medians there but EXCLUDED from "value" (a failure must not
  * deflate the headline total).
  */
object Bench {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JIT / codegen / file-listing so the first measured query
    // reflects steady state rather than session startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val first = time(fn(spark, sfDir).count())
        val timed = Seq.fill(3)(time(fn(spark, sfDir).count())).sorted
        (name, first, timed(1), true)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          (name, -1.0, -1.0, false)
      }
    }
    def jmap(vs: Seq[(String, Double)]): String =
      vs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (n, _, med, ok) => (n, if (ok) med else -med) })
    val firsts = jmap(results.map { case (n, first, _, ok) => (n, if (ok) first else -first) })
    val total = results.collect { case (_, _, med, true) => med }.sum
    val nFailed = results.count(!_._4)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFailed,"queries":$qs,"first":$firsts,"sf":"$sfDir"}""")
    spark.stop()
  }
}
