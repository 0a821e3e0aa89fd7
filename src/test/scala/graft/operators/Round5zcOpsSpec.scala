package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirtieth wave (q128 cohort LTV,
  * p19 boilerplate scrub, s21 MRR retrieval eval).
  */
class Round5zcOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q128: LTV matrix equals a scalar replay; curve is monotone") {
    val rows = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "datediff(ts, TIMESTAMP'1970-01-01 00:00:00') div 7", "event_type",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val firsts = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cohortSize = firsts.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = rows.filter(_._3 == "purchase")
      .map(r => ((firsts(r._1), r._2 - firsts(r._1)), (r._1, r._4)))
      .groupBy(_._1).toSeq
      .map { case ((cm, ms), xs) =>
        (cm, ms, xs.map(_._2._1).distinct.length.toLong, xs.map(_._2._2).sum)
      }.sortBy(c => (c._1, c._2))
    val want = cells.groupBy(_._1).toSeq.flatMap { case (cm, xs) =>
      var cum = 0L
      xs.sortBy(_._2).map { case (c, ms, nb, rev) =>
        cum += rev
        (c, ms, cohortSize(c), nb, rev, cum, cum / cohortSize(c))
      }
    }.sortBy(r => (r._1, r._2))
    val got = run("q128_cohort_ltv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want, s"ltv mismatch: got ${got.take(2)} want ${want.take(2)}")
    // cumulative revenue is nondecreasing within each cohort
    got.groupBy(_._1).values.foreach { xs =>
      val cums = xs.sortBy(_._2).map(_._6)
      assert(cums == cums.sorted)
    }
    assert(got.forall(r => r._4 <= r._3), "more buyers than cohort users")
  }

  test("p19: scrub equals a scalar replay; coverage counts overlaps once") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "split(text, ' ')").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toVector))
      .filter(_._2.length >= 8)
    val grams = docs.flatMap { case (id, ts) =>
      (0 to ts.length - 8).map(i => (id, i, ts.slice(i, i + 8).mkString(" ")))
    }
    val boiler = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.length >= 3).keySet
    val want = docs.flatMap { case (id, ts) =>
      val covered = grams.filter(g => g._1 == id && boiler(g._3))
        .flatMap(g => g._2 until g._2 + 8).toSet
      if (covered.isEmpty) None
      else {
        val n = ts.length.toLong
        val b = covered.size.toLong
        Some((id, n, b, 1000000L * b / n, n - b))
      }
    }.sortBy(_._1).toSeq
    val got = run("p19_boilerplate_scrub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"scrub mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.nonEmpty, "no boilerplate found at sf0.001 — threshold dead")
    assert(got.forall(r => r._3 >= 8L && r._3 <= r._2))
  }

  test("s21: MRR equals a scalar replay and agrees with s01's ranking") {
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE))")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val norms = vecs.map(v => v._1 -> math.sqrt(dot(v._3, v._3))).toMap
    val want = vecs.filter(_._1 % 50 == 0).sortBy(_._1).map { case (qid, ql, qv) =>
      val ranked = vecs.filter(_._1 != qid)
        .map(v => (r6(dot(qv, v._3) / (norms(qid) * norms(v._1))), v._1, v._2))
        .sortBy(x => (-x._1, x._2))
      val hit = ranked.indexWhere(_._3 == ql)
      val rank = if (hit < 0) 0 else hit + 1
      (qid, ql, rank, if (rank == 0) 0L else 1000000L / rank)
    }.toSeq
    val got = run("s21_mrr_eval").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == want, s"mrr mismatch: got ${got.take(3)} want ${want.take(3)}")
    // rr consistency: rr_ppm == 1000000 div rank for every hit
    assert(got.forall(r => r._3 == 0 || r._4 == 1000000L / r._3))
  }
}
