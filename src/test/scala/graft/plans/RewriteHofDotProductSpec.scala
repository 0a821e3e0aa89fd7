package graft.plans

import graft.{SparkSpec, Tables}
import graft.operators.Ns
import org.apache.spark.sql.functions._

/** The optimizer rule must swap the portable HOF dot-product for the
  * native VecDot without changing a single bit of output.
  */
class RewriteHofDotProductSpec extends SparkSpec {

  test("rule rewrites aggregate(zip_with(...)) to vec_dot in the optimized plan") {
    GraftOptimizations.install(spark)
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), expr(Ns.toDouble("embedding")).as("v"))
    val q = e.select(col("vec_id"), expr(Ns.hofDot("v", "v")).as("nsq"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
  }

  test("rewritten plan returns bit-identical results") {
    GraftOptimizations.install(spark)
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), expr(Ns.toDouble("embedding")).as("v"))
    Ns.registerFast(spark)
    val viaRule = e.select(col("vec_id"), expr(Ns.hofDot("v", "v")).as("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = e.select(col("vec_id"), expr(Ns.dot("v", "v")).as("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRule == native)
  }

  test("rule leaves non-dot-product aggregates alone") {
    GraftOptimizations.install(spark)
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), expr(Ns.toDouble("embedding")).as("v"))
    // sum of absolute values — same shape, different lambda body
    val q = e.select(expr(
      "aggregate(zip_with(v, v, (x, y) -> abs(x)), CAST(0 AS DOUBLE), (acc, w) -> acc + w)").as("s"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("vec_dot"), optimized)
    assert(q.collect().forall(_.getDouble(0) > 0))
  }
}
