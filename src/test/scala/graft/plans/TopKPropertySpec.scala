package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized-property checks (seeded, deterministic) for both top-k
  * components: the TopKPerKey physical operator and the topk_structs
  * aggregate must equal a scalar group-sort-take reference on random
  * data — random key cardinalities, group sizes, duplicate order
  * values (tie-broken by a unique id), ks around group-size edges, and
  * partition counts that force real partial/merge trees.
  */
class TopKPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)

  private def randomData(n: Int, keys: Int): Seq[(Int, Double, Long)] =
    (0 until n).map { i =>
      // coarse-grained doubles force plenty of order ties
      (rnd.nextInt(keys), (rnd.nextInt(50) - 25).toDouble, i.toLong)
    }

  private def reference(data: Seq[(Int, Double, Long)], k: Int): Set[(Int, Double, Long, Int)] =
    data.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (r._2, r._3)).take(k)
        .zipWithIndex.map { case (r, i) => (r._1, r._2, r._3, i + 1) }
    }.toSet

  test("TopKPerKeyExec equals scalar reference on random data") {
    val sp = spark
    import sp.implicits._
    GraftStrategies.install(spark)
    try {
      for (trial <- 1 to 5) {
        val n = 200 + rnd.nextInt(800)
        val keys = 1 + rnd.nextInt(40)
        val k = 1 + rnd.nextInt(6)
        val parts = 1 + rnd.nextInt(7)
        val data = randomData(n, keys)
        val w = Window.partitionBy("key").orderBy(col("v"), col("id"))
        val df = data.toDF("key", "v", "id").repartition(parts)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("TopKPerKey"), s"trial $trial: strategy must fire\n$plan")
        val got = df.collect()
          .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
        assert(got == reference(data, k), s"trial $trial (n=$n keys=$keys k=$k parts=$parts)")
      }
    } finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
    }
  }

  /** rank() reference: rank = 1 + #rows strictly smaller; keep rank<=k
    * (ties at the boundary ALL kept, ranks gapped).
    */
  private def rankReference(data: Seq[(Int, Double, Long)], k: Int): Set[(Int, Double, Long, Int)] =
    data.groupBy(_._1).flatMap { case (_, rows) =>
      rows.map { r =>
        val rk = rows.count(_._2 < r._2) + 1
        (r._1, r._2, r._3, rk)
      }.filter(_._4 <= k)
    }.toSet

  test("TopKPerKeyExec rank() equals scalar rank reference on random tied data") {
    val sp = spark
    import sp.implicits._
    GraftStrategies.install(spark)
    try {
      for (trial <- 1 to 5) {
        val n = 200 + rnd.nextInt(800)
        val keys = 1 + rnd.nextInt(40)
        val k = 1 + rnd.nextInt(6)
        val parts = 1 + rnd.nextInt(7)
        val data = randomData(n, keys)
        // order by the coarse v ONLY — duplicate order values everywhere
        val w = Window.partitionBy("key").orderBy(col("v"))
        val df = data.toDF("key", "v", "id").repartition(parts)
          .withColumn("rk", rank().over(w))
          .filter(col("rk") <= k)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("rank"), s"trial $trial: rank mode must fire\n$plan")
        val got = df.collect()
          .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
        assert(got == rankReference(data, k), s"trial $trial (n=$n keys=$keys k=$k parts=$parts)")
      }
    } finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
    }
  }

  test("topk_structs equals scalar reference on random data") {
    graft.operators.Ns.registerFast(spark)
    val sp = spark
    import sp.implicits._
    for (trial <- 1 to 5) {
      val n = 200 + rnd.nextInt(800)
      val keys = 1 + rnd.nextInt(40)
      val k = 1 + rnd.nextInt(6)
      val parts = 1 + rnd.nextInt(7)
      val data = randomData(n, keys)
      val got = data.toDF("key", "v", "id").repartition(parts)
        .groupBy("key")
        .agg(expr(s"topk_structs(struct(v, id), $k)").as("tk"))
        .select(col("key"), posexplode(col("tk")))
        .select(col("key"), col("col.v"), col("col.id"), (col("pos") + 1).cast("int"))
        .collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
      assert(got == reference(data, k), s"trial $trial (n=$n keys=$keys k=$k parts=$parts)")
    }
  }
}
