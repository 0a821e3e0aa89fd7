package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirty-second wave (c05 GMM E-step,
  * s22 Rocchio feedback, q130 conversion latency).
  */
class Round5zeOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def vecsWithLabels = graft.Tables.embeddings(spark, sf0001)
    .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE))")
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exact-decimal per-label centroids (the s02/c05 recipe). */
  private def centroids(vecs: Array[(Long, Int, Array[Double])]): Map[Int, Array[Double]] =
    vecs.groupBy(_._2).view.mapValues { xs =>
      val dim = xs.head._3.length
      Array.tabulate(dim) { i =>
        xs.map(x => BigDecimal(x._3(i)).setScale(12, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble / xs.length
      }
    }.toMap

  test("c05: responsibilities equal a scalar log-sum-exp replay; ppm in (0, 1e6]") {
    val vecs = vecsWithLabels
    val cent = centroids(vecs)
    val want = vecs.sortBy(_._1).map { case (id, lab, v) =>
      val d2s = cent.toSeq.sortBy(_._1).map { case (cl, cv) =>
        var s = 0.0; var i = 0
        while (i < v.length) { val df = v(i) - cv(i); s += df * df; i += 1 }
        (cl, r6(s))
      }
      val mind2 = d2s.map(_._2).min
      val argmin = d2s.filter(_._2 == mind2).map(_._1).min
      val zsum = d2s.foldLeft(0.0) { case (acc, (_, d2)) =>
        acc + math.exp((mind2 - d2) / 2)
      }
      val ppm = math.floor(1000000 / zsum).toLong
      (id, lab, d2s.length.toLong, argmin, ppm, ppm > 900000L)
    }.toSeq
    val got = run("c05_gmm_estep").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == want, s"gmm mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.forall(r => r._5 > 0L && r._5 <= 1000000L))
    // soft assignment must agree with the hard argmin everywhere
    assert(got.forall(r => r._5 >= 1000000L / r._3))
  }

  test("s22: feedback rerank equals a scalar Rocchio replay; top3 mostly survives") {
    val vecs = vecsWithLabels.map(v => (v._1, v._3))
    val norms = vecs.map(v => v._1 -> math.sqrt(dot(v._2, v._2))).toMap
    val byId = vecs.toMap
    val want = vecs.filter(_._1 % 50 == 0).sortBy(_._1).flatMap { case (qid, qv) =>
      val r0 = vecs.filter(_._1 != qid)
        .map(v => (r6(dot(qv, v._2) / (norms(qid) * norms(v._1))), v._1))
        .sortBy(x => (-x._1, x._2))
      val rankBefore = r0.zipWithIndex.map { case ((_, id), i) => id -> (i + 1) }.toMap
      val top3 = r0.take(3).map(x => byId(x._2))
      val sum3 = top3.reduceLeft((a, b) => a.zip(b).map { case (x, y) => x + y })
      val q2 = qv.zip(sum3).map { case (a, b) => 0.5 * a + 0.5 * (b / 3) }
      val q2n = math.sqrt(dot(q2, q2))
      val r1 = vecs.filter(_._1 != qid)
        .map(v => (r6(dot(q2, v._2) / (q2n * norms(v._1))), v._1))
        .sortBy(x => (-x._1, x._2))
      r1.take(5).zipWithIndex.map { case ((cos, id), i) =>
        (qid, i + 1, id, rankBefore(id), cos)
      }
    }.toSeq
    val got = run("s22_rocchio_feedback").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      .toSeq
    assert(got == want, s"rocchio mismatch: got ${got.take(3)} want ${want.take(3)}")
    // feedback is anchored at the original query: each post-feedback top-5
    // keeps at least one of the original top-3
    got.groupBy(_._1).values.foreach { xs =>
      assert(xs.exists(_._4 <= 3), s"top3 wiped out for qid ${xs.head._1}")
    }
  }

  test("q130: latency distribution equals a scalar replay; p50 <= p90") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "unix_micros(ts)", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val lats = ev.groupBy(_._1).values.flatMap { xs =>
      val ord = xs.toSeq.sortBy(x => (x._3, x._2))
      var lastView: Option[Long] = None
      ord.flatMap { e =>
        val out = if (e._4 == "purchase" && lastView.isDefined)
          Some((e._2, e._3 - lastView.get)) else None
        if (e._4 == "view") lastView = Some(e._3)
        out
      }
    }.toSeq
    val n = lats.length.toLong
    val sorted = lats.sortBy(x => (x._2, x._1)).map(_._2)
    val p50 = sorted(((n + 1) / 2).toInt - 1)
    val p90 = sorted(((9 * n + 9) / 10).toInt - 1)
    val want = (n, lats.map(_._2).sum / n, p50, p90, sorted.head, sorted.last)
    val got = run("q130_time_to_convert").collect().head
    val gotT = (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5))
    assert(gotT == want, s"latency mismatch: got $gotT want $want")
    assert(gotT._3 <= gotT._4 && gotT._5 <= gotT._3 && gotT._4 <= gotT._6)
  }
}
