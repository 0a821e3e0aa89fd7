package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew handling evidence: AQE splits a hot-key shuffle partition at
  * runtime, and the explicit salted join spreads the same hot key
  * deterministically — both with results identical to the plain join.
  */
class SkewSpec extends SparkSpec {

  test("AQE skew join splits the hot partition at runtime") {
    val sp = spark
    import sp.implicits._
    // one celebrity key carrying 200k rows vs 1k others
    val fact = sp.range(200000).select(lit(7L).as("k"), col("id").as("payload"))
      .unionAll(sp.range(1000).select((col("id") % 100).as("k"), col("id").as("payload")))
    val dim = sp.range(100).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> sp.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> sp.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> sp.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> sp.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"))
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    sp.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    sp.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    sp.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      val joined = fact.join(dim, "k")
      // collect the join itself so THIS queryExecution's AQE finalizes
      assert(joined.collect().length == 201000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(4000))
    } finally prev.foreach { case (k, v) => sp.conf.set(k, v) }
  }

  test("salted join output equals plain join output row-for-row") {
    val sp = spark
    import sp.implicits._
    val fact = sp.range(5000).select((col("id") % 40).as("k"), col("id").as("payload"))
    val dim = sp.range(40).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    val salted = Skew.saltedJoin(fact, dim, "k", col("payload"), salts = 8)
      .select("k", "payload", "name").orderBy("k", "payload").collect()
    val plain = fact.join(dim, "k")
      .select("k", "payload", "name").orderBy("k", "payload").collect()
    assert(salted.sameElements(plain))
  }
}
