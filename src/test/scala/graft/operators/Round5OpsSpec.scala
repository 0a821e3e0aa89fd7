package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-5 additions: the KMV bottom-k distinct
  * sketch (q84). The DuckDB oracle pins exact output; these pin the
  * sketch ALGEBRA against a scalar reimplementation — in particular
  * that the ALL row is a true sketch MERGE (k-min of the union of
  * per-group sketches) and identical to the sketch a single pass over
  * the base data would build, the property that makes per-executor
  * sketching + combine correct at cluster scale.
  */
class Round5OpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private val K = 256

  /** Scalar 52-bit md5 hash identical to Ns.hash52. */
  private def h52(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  private def estimate(sketch: Seq[Long]): Double =
    if (sketch.length < K) sketch.length.toDouble
    else (255L * 4503599627370496L).toDouble / sketch.max.toDouble

  test("q84: per-group and merged estimates equal a scalar KMV over collected keys") {
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderpriority").as("grp"), col("o_custkey"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val byGrp = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val sketches: Map[String, Seq[Long]] =
      byGrp.view.mapValues(_.map(k => h52(k.toString)).distinct.sorted.take(K).toSeq).toMap

    val got = run("q84_kmv_sketch").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    for ((g, sk) <- sketches) {
      val exact = byGrp(g).length.toLong
      val est = BigDecimal(estimate(sk)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      assert(got(g) == ((exact, sk.length.toLong, est.toDouble)), s"group $g")
    }

    // merge = k smallest of the union of per-group sketches; must equal
    // both the reported ALL row and a from-scratch global sketch
    val merged = sketches.values.flatten.toSeq.distinct.sorted.take(K)
    val global = rows.map(_._2).distinct.map(k => h52(k.toString)).sorted.take(K).toSeq
    assert(merged == global,
      "sketch union is not lossless vs a single-pass global sketch")
    val exactAll = rows.map(_._2).distinct.length.toLong
    assert(got("ALL") == ((exactAll, merged.length.toLong,
      BigDecimal(estimate(merged)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("q84: estimator is within the 3/sqrt(k) relative-error bound when full") {
    // sf0.001 sketches are not full (exact branch); build a full sketch
    // synthetically to exercise the bound the estimator promises
    val n = 10000
    val hashes = (1 to n).map(i => h52(i.toString)).sorted.take(K)
    val est = estimate(hashes)
    assert(math.abs(est - n) / n < 3.0 / math.sqrt(K.toDouble),
      s"estimate $est for true $n outside bound")
  }
}
