package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fourteenth wave (q108 Holt-Winters,
  * d11 dup-rate threshold curve).
  */
class Round5mOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q108: state equals a scalar Holt-Winters fold (exact IEEE, array state)") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      if (xs.length < 2) None
      else {
        var l = xs.head; var b = 0.0
        val sArr = Array(0.0, 0.0, 0.0, 0.0)
        var i = 1
        xs.tail.foreach { x =>
          val si = i % 4
          val l2 = 0.5 * (x - sArr(si)) + 0.5 * (l + b)
          val b2 = 0.5 * (l2 - l) + 0.5 * b
          sArr(si) = 0.5 * (x - l2) + 0.5 * sArr(si)
          l = l2; b = b2; i += 1
        }
        Some((u, xs.length.toLong, l, b, sArr(0), sArr(1), sArr(2), sArr(3),
          l + b + sArr(i % 4)))
      }
    }
    val got = run("q108_holt_winters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .toSeq
    assert(got == want, s"holt-winters mismatch: got ${got.take(2)} want ${want.take(2)}")
    // seasonality bites: some user has a nonzero seasonal slot
    assert(got.exists(r => r._5 != 0.0 || r._6 != 0.0 || r._7 != 0.0 || r._8 != 0.0))
  }

  test("d11: curve equals the rollup of d02's own candidate pairs; counts fall with threshold") {
    val pairs = run("d02_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    val want = Seq(0.5, 0.75, 0.9, 1.0).map { thr =>
      val sel = pairs.filter(_._3 >= thr)
      val docs = sel.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong
      (thr, sel.length.toLong, docs, 1000000L * docs / nDocs)
    }
    val got = run("d11_dup_rate_curve").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"curve mismatch: got $got want $want")
    // monotone: raising the cut never adds pairs or documents
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 <= a._2 && b._3 <= a._3)
      case _ => ()
    }
    assert(got.head._2 > got.last._2 || got.head._2 == 0,
      "thresholds never discriminate — vacuous curve")
  }
}
