package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-key top-k physical operator: recognized from the
  * canonical row_number idiom, two bounded phases instead of a full
  * sort+window, and bit-identical output to WindowExec on total orders.
  */
class TopKPerKeySpec extends SparkSpec {

  private def topkDf(k: Int) = {
    val w = Window.partitionBy("l_returnflag").orderBy(col("l_extendedprice").desc,
      col("l_orderkey"), col("l_linenumber"))
    graft.Tables.lineitem(spark, sf0001)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  test("strategy plans Filter(Window(row_number)) as two TopKPerKey phases") {
    GraftStrategies.install(spark)
    try {
      val p = topkDf(3).queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKey(k=3, final)"), p)
      assert(p.contains("TopKPerKey(k=3, partial)"), p)
      // neither WindowExec nor Spark's sort-requiring WindowGroupLimit
      // survives, and the ONLY sort left is post-shuffle over survivors
      assert(!p.contains("WindowGroupLimit"), p)
      val preShuffle = p.substring(p.indexOf("Exchange"))
      assert(!preShuffle.contains("Sort"), s"partial phase must not sort:\n$p")
    } finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
    }
  }

  test("results are identical to the WindowExec path, at several k") {
    for (k <- Seq(1, 3, 10)) {
      val expected = topkDf(k).collect().toSet // WindowExec (not installed)
      GraftStrategies.install(spark)
      val got = try topkDf(k).collect().toSet finally {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
      }
      assert(got == expected, s"k=$k: ${got.size} vs ${expected.size}")
    }
  }

  test("result is shuffle-partition-count invariant under the strategy") {
    GraftStrategies.install(spark)
    try {
      def runWith(n: String) = {
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", n)
        try topkDf(5).collect().toSet
        finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
      assert(runWith("2") == runWith("17"))
    } finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
    }
  }

  test("high-cardinality keys: partial-phase flush keeps results exact") {
    // top-1 per ORDER (thousands of keys) with the flush threshold
    // forced tiny, so the emit-and-reset memory guard triggers
    // constantly; the final phase must still cut exactly
    val w = Window.partitionBy("l_orderkey").orderBy(col("l_extendedprice").desc,
      col("l_linenumber"))
    def q = graft.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val expected = q.collect().toSet // WindowExec path
    spark.conf.set("spark.graft.topk.partialFlushKeys", "3")
    GraftStrategies.install(spark)
    try {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKey(k=1, partial)"), p)
      assert(q.collect().toSet == expected)
    } finally {
      spark.conf.unset("spark.graft.topk.partialFlushKeys")
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
    }
  }

  private def rankDf(k: Int, totalOrder: Boolean) = {
    // totalOrder=false orders by coarse l_quantity only — real rank ties
    val w =
      if (totalOrder) Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      else Window.partitionBy("l_returnflag").orderBy(col("l_quantity"))
    graft.Tables.lineitem(spark, sf0001)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= k)
  }

  test("rank() with a total order: fires and equals the WindowExec path") {
    for (k <- Seq(1, 3, 10)) {
      val expected = rankDf(k, totalOrder = true).collect().toSet // WindowExec
      GraftStrategies.install(spark)
      try {
        val df = rankDf(k, totalOrder = true)
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains(s"TopKPerKey(k=$k, final, rank)"), p)
        assert(df.collect().toSet == expected, s"k=$k")
      } finally {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
      }
    }
  }

  test("rank() with ties: ALL boundary ties kept, ranks gapped like WindowExec") {
    val expected = rankDf(3, totalOrder = false).collect().toSet // WindowExec
    // sanity: the coarse order really produced ties beyond k rows/group
    assert(expected.size > 12, s"want real ties, got ${expected.size} rows")
    GraftStrategies.install(spark)
    try {
      val got = rankDf(3, totalOrder = false).collect().toSet
      assert(got == expected, s"${got.size} vs ${expected.size}")
    } finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
    }
  }

  test("AQE interplay: strategy fires and survives into the final adaptive plan") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val expected = topkDf(4).collect().toSet // WindowExec
    GraftStrategies.install(spark)
    try {
      val df = topkDf(4)
      assert(df.collect().toSet == expected)
      // post-execution: the FINAL adaptive plan still runs both phases
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("TopKPerKey(k=4, final)") && p.contains("TopKPerKey(k=4, partial)"), p)
    } finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
    }
  }

  test("the rank predicate still composes with downstream projections") {
    GraftStrategies.install(spark)
    try {
      val rows = topkDf(2).select("l_returnflag", "rn").collect()
      assert(rows.map(_.getInt(1)).forall(r => r == 1 || r == 2))
      assert(rows.groupBy(_.getString(0)).values.forall(_.length == 2))
    } finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
    }
  }
}
