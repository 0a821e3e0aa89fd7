package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirteenth wave (t27 lang-id confusion
  * matrix, g10 degree assortativity).
  */
class Round5lOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("t27: confusion matrix is the exact rollup of t01's predictions") {
    val pred = run("t01_lang_id").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val cm = pred.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowN = pred.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colN = pred.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = cm.toSeq.sortBy(_._1).map { case ((t, p), n) =>
      (t, p, n, 1000000L * n / rowN(t), 1000000L * n / colN(p))
    }
    val got = run("t27_langid_confusion").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"confusion mismatch: got ${got.take(4)} want ${want.take(4)}")
    // totals conserve: every document lands in exactly one cell
    assert(got.map(_._3).sum == pred.length.toLong)
    // the classifier beats chance: diagonal recall above 200000 ppm (1/5)
    val diag = got.filter(r => r._1 == r._2)
    assert(diag.nonEmpty && diag.forall(_._4 > 200000L),
      s"diagonal recall at or below chance: $diag")
  }

  test("g10: assortativity equals the scalar Newman estimator over the kNN graph") {
    // scalar replay of the BLOCKED kNN builder (round-6 contract)
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val und = KnnGraphFixture.und(spark, sf0001)
    val dirEdges = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = dirEdges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ends = dirEdges.map { case (s, d2) => (deg(s), deg(d2)) }
    val m = ends.length.toLong
    val sx = ends.map(_._1).sum; val sy = ends.map(_._2).sum
    val sxy = ends.map(e => e._1 * e._2).sum
    val sxx = ends.map(e => e._1 * e._1).sum
    val syy = ends.map(e => e._2 * e._2).sum
    val r = round6((m * sxy - sx * sy).toDouble /
      math.sqrt((m * sxx - sx * sx).toDouble) / math.sqrt((m * syy - sy * sy).toDouble))
    val got = run("g10_assortativity").collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == m)
    assert(got(0).getDouble(1) == r, s"got ${got(0).getDouble(1)} want $r")
    // defined and in range
    assert(got(0).getDouble(1) >= -1.0 && got(0).getDouble(1) <= 1.0)
  }
}
