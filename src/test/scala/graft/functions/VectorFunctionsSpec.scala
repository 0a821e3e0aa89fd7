package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.Ns
import org.apache.spark.sql.functions._

/** The native codegen vector expressions must be BIT-identical to the
  * pure-built-in higher-order-function spellings (same fold order), on
  * real embedding data — this is what keeps the DuckDB oracles valid.
  */
class VectorFunctionsSpec extends SparkSpec {

  test("vec_dot == aggregate(zip_with(...)) bit-for-bit on all pairs") {
    Ns.registerFast(spark)
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), expr(Ns.toDouble("embedding")).as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val mismatches = a.join(b, col("ia") < col("ib"))
      .select(expr(Ns.dot("va", "vb")).as("fast"),
        expr(Ns.hofDot("va", "vb")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("vec_l2sq == HOF squared-distance bit-for-bit") {
    Ns.registerFast(spark)
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), expr(Ns.toDouble("embedding")).as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val mismatches = a.join(b, col("ia") < col("ib"))
      .select(expr(Ns.l2sq("va", "vb")).as("fast"),
        expr("aggregate(zip_with(va, vb, (x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("null inputs propagate null") {
    Ns.registerFast(spark)
    val r = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a, " +
        "vec_l2sq(array(1.0d), CAST(NULL AS ARRAY<DOUBLE>)) AS b").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("extensions class registers the functions") {
    // A second session in the same JVM picks up the extensions path.
    val s2 = spark.newSession()
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // injectFunction is exercised at session build; here assert the
    // imperative path against the fresh session's registry.
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head().getDouble(0) == 11.0)
  }
}
