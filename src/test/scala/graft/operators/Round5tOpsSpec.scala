package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 twenty-first wave (t29 burst n-grams,
  * q114 Markov transitions, s19 embedding drift).
  */
class Round5tOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("t29: risers equal a scalar half-split sweep; deltas are sorted") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    val perDoc = docs.map { case (id, t) => (id, id * 2 >= nDocs, shingles(t)) }
      .filter(_._3.nonEmpty)
    val nEarly = perDoc.count(!_._2).toLong
    val nLate = perDoc.count(_._2).toLong
    val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    perDoc.foreach { case (_, late, shs) =>
      shs.foreach { sh =>
        val (e, l) = counts.getOrElse(sh, (0L, 0L))
        counts(sh) = if (late) (e, l + 1) else (e + 1, l)
      }
    }
    val want = counts.toSeq.map { case (sh, (e, l)) =>
      val ep = 1000000L * e / nEarly
      val lp = 1000000L * l / nLate
      (sh, e, l, ep, lp, lp - ep)
    }.sortBy { case (sh, _, _, _, _, d) => (-d, sh) }
      .take(10).zipWithIndex
      .map { case ((sh, e, l, ep, lp, d), i) => (i + 1, sh, e, l, ep, lp, d) }
    val got = run("t29_burst_ngrams").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want, s"burst mismatch: got ${got.take(3)} want ${want.take(3)}")
    got.map(_._7).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(1) <= w(0), "deltas not sorted")
    }
  }

  test("q114: matrix equals a scalar lead sweep; rows sum to ~1e6 ppm") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4)
      seq.zip(seq.tail)
    }
    val cm = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowN = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = cm.toSeq.sortBy(_._1).map { case ((f, t), n) =>
      (f, t, n, 1000000L * n / rowN(f))
    }
    val got = run("q114_markov_transitions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"markov mismatch: got ${got.take(4)} want ${want.take(4)}")
    // each row of the stochastic matrix sums to 1e6 within floor slack
    got.groupBy(_._1).foreach { case (f, rs) =>
      val sum = rs.map(_._4).sum
      assert(sum > 1000000L - rs.length && sum <= 1000000L, s"row $f sums to $sum")
    }
  }

  test("s19: half-centroid drift equals a scalar replay; same-label halves stay aligned") {
    val rows = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def centroid(vs: Seq[Array[Double]]): Array[Double] =
      Array.tabulate(vs.head.length) { i =>
        vs.map(v => BigDecimal(v(i)).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
          .toDouble / vs.length
      }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val want = rows.map(_._2).distinct.sorted.toSeq.flatMap { cl =>
      val ea = rows.filter(r => r._2 == cl && r._1 < 250).map(_._3)
      val lb = rows.filter(r => r._2 == cl && r._1 >= 250).map(_._3)
      if (ea.isEmpty || lb.isEmpty) None
      else {
        val ca = centroid(ea); val cb = centroid(lb)
        var l2 = 0.0; var i = 0
        while (i < ca.length) { val d = ca(i) - cb(i); l2 += d * d; i += 1 }
        Some((cl, ea.length.toLong, lb.length.toLong,
          round6(math.sqrt(l2)),
          round6(dot(ca, cb) / (math.sqrt(dot(ca, ca)) * math.sqrt(dot(cb, cb))))))
      }
    }
    val got = run("s19_embedding_drift").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == want, s"drift mismatch: got ${got.take(3)} want ${want.take(3)}")
    // fixture property the metric correctly reports: with ~25 vectors
    // per (label, half), the label-mean signal is small relative to
    // noise, so half-centroids are nearly ORTHOGONAL (cosine ~ 0, L2
    // shift ~ 0.22-0.32) — a drift monitor must calibrate its baseline
    // on exactly this small-sample noise floor, not assume cosine ~ 1
    assert(got.forall(r => r._5 >= -1.0 && r._5 <= 1.0))
    assert(got.forall(r => math.abs(r._5) < 0.5), s"unexpectedly strong alignment: $got")
    assert(got.forall(r => r._4 > 0.1 && r._4 < 0.5), s"drift out of the noise band: $got")
  }
}
