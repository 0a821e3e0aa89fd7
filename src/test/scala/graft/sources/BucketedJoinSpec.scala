package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Bucketing witness: the 100 TB shuffle-elision story, MEASURED at the
  * plan level. Writing both fact tables bucketed by the join key
  * (`bucketBy` + `sortBy`, Hive-compatible layout) lets a sort-merge join
  * and a keyed aggregation run with ZERO shuffle exchanges — the property
  * that turns a repeated 100 TB join into a scan-side co-located merge.
  * The same queries over the unbucketed parquet MUST shuffle (asserted as
  * the control), and results are identical either way.
  */
class BucketedJoinSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // finalize AQE so the executed plan is the real one
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = p match {
        // AQE hides materialized stages behind leaf wrappers — recurse
        // into them or every exchange below a stage boundary is missed
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case qs: QueryStageExec => Seq(qs.plan)
        case _ => p.children ++ p.subqueries
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed sort-merge join and keyed agg run with zero shuffles; unbucketed control shuffles") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so the witness is about shuffles, not broadcast luck
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        .write.format("parquet").option("path", s"$dir/li_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
      graft.Tables.orders(spark, sf0001)
        .select("o_orderkey", "o_custkey")
        .write.format("parquet").option("path", s"$dir/or_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("or_b")

      val joined = spark.table("li_b")
        .join(spark.table("or_b"),
          org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
        .groupBy("o_custkey")
        .agg(org.apache.spark.sql.functions.expr(
          "sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))").as("rev_cents"))
      // one exchange remains for the final groupBy(o_custkey) — the JOIN
      // itself must not shuffle: compare against the unbucketed control
      val bucketedShuffles = shuffles(joined)

      val liRaw = graft.Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
      val orRaw = graft.Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey")
      val control = liRaw
        .join(orRaw, org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
        .groupBy("o_custkey")
        .agg(org.apache.spark.sql.functions.expr(
          "sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))").as("rev_cents"))
      val controlShuffles = shuffles(control)

      assert(bucketedShuffles == 1,
        s"bucketed join+agg should shuffle exactly once (the agg), saw $bucketedShuffles")
      assert(controlShuffles == 3,
        s"unbucketed control should shuffle both join sides + the agg, saw $controlShuffles")

      // the pure keyed aggregation on the bucket key needs NO shuffle at all
      val agg = spark.table("li_b").groupBy("l_orderkey")
        .agg(org.apache.spark.sql.functions.sum("l_quantity").as("q"))
      assert(shuffles(agg) == 0, "groupBy on the bucket key should not shuffle")

      // identical results either way — revenue is summed in exact integer
      // cents, so the compare is immune to float summation order (which
      // genuinely differs between the co-located and shuffled plans)
      val a = joined.orderBy("o_custkey").collect().map(_.toString).toSeq
      val b = control.orderBy("o_custkey").collect().map(_.toString).toSeq
      assert(a == b, "bucketed and unbucketed results diverge")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS or_b")
    }
  }
}
