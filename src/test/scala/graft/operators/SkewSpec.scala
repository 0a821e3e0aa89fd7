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

  /** Hot-prefix ladder for the d08 blocking-key de-skew: a synthetic
    * corpus where 30% of docs share ONE blocking prefix (the crawl
    * boilerplate pattern). Asserts (a) deskewedJoin == plain join
    * row-for-row, and (b) the per-reducer candidate bound: the hot
    * key's a-side rows spread over all `salts` buckets with no bucket
    * holding more than ~2x its fair share — so the max per-task
    * candidate count (bucket_a x full b side of that key) drops
    * ~salts-fold vs the unsalted join, at both ladder rungs.
    */
  test("deskewedJoin: hot-prefix ladder — equality + per-task candidate bound") {
    val sp = spark
    import sp.implicits._
    val salts = 8
    for (n <- Seq(1000, 4000)) {
      val nHot = (n * 3) / 10
      val docs = sp.range(n).select(col("id").as("doc_id"),
        when(col("id") < nHot, lit("HOTP"))
          .otherwise(concat(lit("p"), (col("id") % (n / 10)).cast("string"))).as("pfx"))
      val a = docs.select(col("doc_id").as("doc_a"), col("pfx"))
      val b = docs.select(col("doc_id").as("doc_b"), col("pfx"))
      val hot = docs.groupBy("pfx").agg(count(lit(1)).as("c"))
        .filter(col("c") >= n / 10).select("pfx")
      val got = Skew.deskewedJoin(a, b, "pfx", col("doc_a"), hot, salts)
        .filter(col("doc_a") < col("doc_b"))
        .orderBy("doc_a", "doc_b").collect()
      val want = a.join(b, Seq("pfx")).filter(col("doc_a") < col("doc_b"))
        .orderBy("doc_a", "doc_b").collect()
      assert(got.sameElements(want), s"n=$n row mismatch")
      // per-bucket candidate bound: recompute the deterministic salt
      // assignment and check the spread (hash-based, not data-ordered)
      val buckets = a.join(broadcast(hot), Seq("pfx"), "left_semi")
        .withColumn("_salt", pmod(hash(col("doc_a")), lit(salts)))
        .groupBy("_salt").agg(count(lit(1)).as("na"))
        .collect().map(r => r.getAs[Long]("na"))
      assert(buckets.length === salts, s"n=$n: hot rows missing from some salt buckets")
      val fair = nHot.toDouble / salts
      assert(buckets.max <= 2 * fair,
        s"n=$n: max salt bucket ${buckets.max} vs fair share $fair")
      // the bound that matters at 100 TB: max per-task candidates
      // (bucket_a x nHot) is ~1/salts of the unsalted key's nHot^2
      assert(buckets.max.toDouble * nHot <= 2.0 / salts * nHot.toDouble * nHot,
        s"n=$n: per-task candidate count not bounded")
    }
  }
}
