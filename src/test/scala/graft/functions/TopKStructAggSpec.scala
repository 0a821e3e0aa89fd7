package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The topk_structs TypedImperativeAggregate: bounded heap state,
  * partial/merge correctness across shuffles and serialization, and
  * equality with the rank-window spelling.
  */
class TopKStructAggSpec extends SparkSpec {

  private def viaAgg(k: Int, parts: Int) = {
    graft.operators.Ns.registerFast(spark)
    graft.Tables.lineitem(spark, sf0001)
      .repartition(parts) // force real partial/merge trees + serialization
      .groupBy("l_returnflag")
      .agg(expr(s"topk_structs(struct(l_extendedprice, l_orderkey, l_linenumber), $k)").as("tk"))
      .select(col("l_returnflag"), posexplode(col("tk")))
      .select(col("l_returnflag"), (col("pos") + 1).cast("int").as("pos"),
        col("col.l_extendedprice"), col("col.l_orderkey"), col("col.l_linenumber"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
      .toSet
  }

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    graft.Tables.lineitem(spark, sf0001)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("l_returnflag"), col("rn").cast("int").as("pos"),
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
      .toSet
  }

  test("agg == rank window, across partition counts and k") {
    for (k <- Seq(1, 3, 7); parts <- Seq(1, 5, 32)) {
      assert(viaAgg(k, parts) == viaWindow(k), s"k=$k parts=$parts")
    }
  }

  test("null struct inputs are skipped, short groups return what exists") {
    graft.operators.Ns.registerFast(spark)
    val sp = spark
    import sp.implicits._
    val df = Seq(("a", Some(2), 1), ("a", None, 2), ("b", Some(5), 3))
      .toDF("g", "v", "id")
      .select(col("g"), when(col("v").isNotNull,
        struct(col("v").as("v"), col("id").as("id"))).as("s"))
    val got = df.groupBy("g")
      .agg(expr("topk_structs(s, 2)").as("tk"))
      .select(col("g"), size(col("tk")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 1, "b" -> 1))
  }
}
