package graft.operators

import graft.SparkSpec

/** Differential for the round-6 first wave: g19 kNN-edge recall pin —
  * the blocked (multi-probe LSH) edge set every kNN-graph query now
  * runs on, scored against the exact all-pairs build.
  */
class Round6fOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("g19: recall pin equals a scalar two-arm replay; recall is high") {
    // exact arm: scalar exact kNN of the deterministic FIXED-COUNT query
    // sample — the 64 ids of smallest md5 rank (the round-9 O(K·n) arm)
    val rows = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val nrm = rows.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def mrank(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val smp = rows.map(_._1).sortBy(id => (mrank(id), id)).take(64).toSet
    // the sample size is an ABSOLUTE constant — the linearity guarantee
    assert(smp.size == 64 && graft.operators.Ns.SampleK == 64)
    val exKnn = rows.filter(r => smp(r._1)).flatMap { case (qid, qv) =>
      rows.filter(_._1 != qid)
        .map { case (id, v) => (id, round6(dot(qv, v) / (nrm(qid) * nrm(id)))) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(n => (qid, n._1))
    }.toSet
    // blocked arm: the shared scalar replay, restricted to the sample
    val blKnn = KnnGraphFixture.knnDirected(spark, sf0001)
      .filter(p => smp(p._1)).toSet
    val common = (exKnn & blKnn).size.toLong
    val want = (exKnn.size.toLong, blKnn.size.toLong, common,
      1000000L * common / exKnn.size, 1000000L * common / blKnn.size)
    val g = run("g19_knn_recall").collect().head
    val got = (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4))
    assert(got == want, s"recall pin mismatch: got $got want $want")
    // the pinned floor: LSH blocking keeps at least 70% of the exact
    // sampled lists on this fixture — a parameter/fixture drift that
    // sinks recall below this is a product regression, not noise
    assert(got._4 >= 700000L, s"blocked-builder recall ${got._4} ppm below floor")
    // the sampled exact arm must never degenerate to all-pairs: the plan
    // may only contain the bounded broadcast nested loop of the sample
    val plan = graft.operators.Graph
      .knnDirectedExactSampled(spark, sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "sampled exact arm plan contains a CartesianProduct")
  }
}
