package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.Ns
import org.apache.spark.sql.functions._

class VecMeanAggSpec extends SparkSpec {

  test("vec_mean aggregator matches the exact decimal centroid path to 1e-9") {
    spark.udf.register("vec_mean", udaf(VecMeanAgg))
    val e = Tables.embeddings(spark, sf0001)
      .select(col("label"), expr(Ns.toDouble("embedding")).as("v"))
    val viaAgg = e.groupBy("label").agg(expr("vec_mean(v)").as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val viaDecimal = e.select(col("label"), posexplode(col("v")))
      .groupBy("label", "pos")
      .agg((sum(col("col").cast("decimal(28,12)")).cast("double") / count(lit(1))).as("c"))
      .collect().groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq).toMap
    assert(viaAgg.keySet == viaDecimal.keySet)
    viaAgg.foreach { case (label, c) =>
      val d = viaDecimal(label)
      assert(c.length == d.length)
      c.zip(d).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"label $label") }
    }
  }

  test("vec_mean is partitioning-insensitive within tolerance") {
    spark.udf.register("vec_mean", udaf(VecMeanAgg))
    val e = Tables.embeddings(spark, sf0001)
      .select(col("label"), expr(Ns.toDouble("embedding")).as("v"))
    val r1 = e.repartition(1).groupBy("label").agg(expr("vec_mean(v)").as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val r8 = e.repartition(8).groupBy("label").agg(expr("vec_mean(v)").as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    r1.foreach { case (l, c) =>
      c.zip(r8(l)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }
}
