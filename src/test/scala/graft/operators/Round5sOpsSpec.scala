package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 twentieth wave (st19 streaming
  * drawdown batch twin, g12 label modularity, m11 histogram
  * equalization). The st19 stream==batch equivalence lives in
  * StreamingSpec; here the batch twin is checked against q100's rollup.
  */
class Round5sOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("st19: the per-row curve rolls up to exactly q100's per-user summary") {
    val rows = run("st19_stream_drawdown").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val rolled = rows.groupBy(_._1).view.mapValues { rs =>
      val last = rs.maxBy(_._2)
      (rs.length.toLong, last._3, rs.map(_._4).max, rs.map(_._5).max)
    }.toMap
    val q100 = run("q100_drawdown").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rolled == q100,
      s"curve rollup != q100: ${rolled.toSeq.sortBy(_._1).take(2)} vs ${q100.toSeq.sortBy(_._1).take(2)}")
    // pointwise invariants: drawdown = peak - eq >= 0, peak nondecreasing
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val ordered = rs.sortBy(_._2)
      ordered.foreach { case (_, _, eq, peak, dd) =>
        assert(dd == peak - eq && dd >= 0, s"user $u bad row")
      }
      ordered.map(_._4).sliding(2).foreach { w =>
        if (w.length == 2) assert(w(1) >= w(0), s"user $u peak decreased")
      }
    }
  }

  test("g12: modularity contributions equal a scalar count; total Q matches sign of structure") {
    // scalar replay of the BLOCKED kNN builder (round-6 contract)
    val rows = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val und = KnnGraphFixture.und(spark, sf0001)
    val m = und.size.toLong
    val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val labels = rows.map(r => r._1 -> r._2).toMap
    val want = rows.map(_._2).distinct.sorted.toSeq.map { cl =>
      val ec = und.count { case (a, b) => labels(a) == cl && labels(b) == cl }.toLong
      val dc = rows.filter(_._2 == cl).map(r => deg.getOrElse(r._1, 0L)).sum
      val num = 4 * m * ec - dc * dc
      val den = 4 * m * m
      (cl, ec, dc, (BigInt(1000000) * (num + den) / den - 1000000).toLong)
    }
    val got = run("g12_label_modularity").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"modularity mismatch: got ${got.take(3)} want ${want.take(3)}")
    // contributions bounded: each in [-1e6, 1e6] ppm
    assert(got.forall(r => r._4 >= -1000000L && r._4 <= 1000000L))
  }

  test("m11: equalization equals a scalar CDF remap; range never shrinks") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._2.nonEmpty)
    val want = docs.sortBy(_._1).toIndexedSeq.map { case (id, t) =>
      val vs = (0 until 64).map(i => if (i < t.length) t.charAt(i).toInt else 0)
      val hist = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val levels = hist.keys.toSeq.sorted
      var cum = 0L
      val cdf = levels.map { v => cum += hist(v); v -> cum }.toMap
      val cdfmin = hist(levels.head)
      val n = 64L
      val remap = levels.map(v => v ->
        ((cdf(v) - cdfmin) * 255) / math.max(n - cdfmin, 1L)).toMap
      (id, n, levels.length.toLong,
        (levels.max - levels.min).toLong,
        remap.values.max - remap.values.min)
    }.map { case (id, n, nl, rb, ra) => (id, n, nl, rb, ra, ra - rb) }
    val got = run("m11_hist_equalize").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == want, s"equalize mismatch: got ${got.take(2)} want ${want.take(2)}")
    // equalization stretches (or preserves) the dynamic range
    assert(got.forall(_._6 >= 0), "range shrank somewhere")
    assert(got.exists(_._6 > 0), "equalization never helped — vacuous")
  }
}
