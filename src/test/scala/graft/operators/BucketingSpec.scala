package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Co-located joins via bucketing: at 100 TB the fact⋈fact join must not
  * shuffle either side — writing both tables bucketed+sorted by the join
  * key lets Spark plan a SortMergeJoin with ZERO Exchange. This spec
  * proves the engine produces that plan on the test tables.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed lineitem ⋈ orders joins with no Exchange on either side") {
    val wh = Files.createTempDirectory("graft-bucket")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bdb LOCATION '$wh'")
    // force the SMJ path — these test tables are broadcast-sized, the
    // 100 TB tables this models are not
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, sf0001)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bdb.li_b")
      Tables.orders(spark, sf0001)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bdb.ord_b")

      val joined = spark.table("bdb.li_b")
        .join(spark.table("bdb.ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // the join itself consumes bucketed scans — no Exchange below it
      val joinSection = plan.substring(plan.indexOf("Join"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)

      // and the result matches the plain (shuffled) join
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bdb.li_b")
      spark.sql("DROP TABLE IF EXISTS bdb.ord_b")
      spark.sql("DROP DATABASE IF EXISTS bdb")
    }
  }
}
