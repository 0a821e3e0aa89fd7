package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 eleventh wave (q104 Kaplan-Meier, q105
  * Theil-Sen, q106 winsorized/trimmed means, p15 token-budget curation):
  * scalar replays of each estimator over the collected fixture rows.
  */
class Round5jOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  private def cents(v: Double): Long =
    new java.math.BigDecimal(v).setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  private lazy val events = graft.Tables.events(spark, sf0001)
    .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type", "value")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("q104: KM table equals a scalar product-limit walk; survival is monotone") {
    val DAY = 86400000000L
    val times = events.groupBy(_._1).toSeq.map { case (_, rows) =>
      val t0 = rows.map(_._2).min
      val fp = rows.filter(r => r._4 == "purchase" && r._5 >= 100).map(_._2).minOption
      fp match {
        case Some(p) => ((p - t0) / DAY, 1)
        case None => ((rows.map(_._2).max - t0) / DAY, 0)
      }
    }
    val nTotal = times.length.toLong
    val byday = times.groupBy(_._1).toSeq.sortBy(_._1).map { case (day, ts) =>
      (day, ts.count(_._2 == 1).toLong, ts.count(_._2 == 0).toLong)
    }
    var atRisk = nTotal
    var surv = 1.0
    val want = byday.flatMap { case (day, dd, cc) =>
      val nRisk = atRisk
      if (dd > 0) surv = surv * (1.0 - dd.toDouble / nRisk)
      atRisk -= (dd + cc)
      if (dd > 0) Some((day, nRisk, dd, cc, round6(surv))) else None
    }
    val got = run("q104_kaplan_meier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want, s"km mismatch: got $got want $want")
    // survival is monotone nonincreasing and in (0, 1]
    got.map(_._5).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"survival increased: $a -> $b")
      case _ => ()
    }
    assert(got.forall(r => r._5 >= 0.0 && r._5 <= 1.0)) // 0 exactly when the last risk set all die
    // the fixture has both events and censoring (both code paths bite)
    assert(got.map(_._3).sum > 0 && times.exists(_._2 == 0),
      "no events or no censoring — vacuous fixture")
  }

  test("q105: Theil-Sen slope equals the scalar lower-median of pairwise slopes") {
    def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val want = events.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(r => cents(r._5) * 10000)
      val n = xs.length
      if (n < 2) None
      else {
        val slopes = (for {
          i <- 0 until n; j <- (i + 1) until n
        } yield floorDiv(1000000L * (xs(j) - xs(i)), (j - i).toLong)).sorted
        val med = slopes((slopes.length + 1) / 2 - 1)
        Some((u, slopes.length.toLong, med, round6(med.toDouble / 1e6)))
      }
    }
    val got = run("q105_theil_sen").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want, s"theil-sen mismatch: got ${got.take(3)} want ${want.take(3)}")
  }

  test("q106: winsorized/trimmed means equal a scalar clamp-and-average") {
    val o = graft.Tables.orders(spark, sf0001)
    val c = graft.Tables.customer(spark, sf0001)
    val orders = o.join(c, o("o_custkey") === c("c_custkey"))
      .selectExpr("c_mktsegment", "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = orders.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, rows) =>
      val cs = rows.map(_._2).sorted
      val n = cs.length
      val k = n / 20
      val lo = cs(k)       // ranked position k+1, 0-indexed
      val hi = cs(n - k - 1)
      val mid = cs.slice(k, n - k)
      val winso = (mid.sum + k * (lo + hi)).toDouble / n
      (seg, n.toLong, k.toLong,
        round6(cs.sum.toDouble / n), round6(winso), round6(mid.sum.toDouble / mid.length))
    }
    val got = run("q106_winsorized_mean").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSeq
    assert(got == want, s"winsor mismatch: got $got want $want")
    // the clamp actually moved something: winsorized differs from the
    // plain mean wherever k > 0 (the synthetic tails are not symmetric)
    assert(got.exists { case (_, _, k, m, wz, _) => k > 0 && m != wz })
  }

  test("p15: admission equals a scalar greedy walk; budget never exceeded") {
    val BUDGET = 500L
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, rows) =>
      val scored = rows.map { case (id, _, text) =>
        val toks = text.split(" ", -1)
        val prio = 1000000L * toks.distinct.length / toks.length
        (id, toks.length.toLong, prio)
      }.sortBy { case (id, _, p) => (-p, id) }
      var used = 0L; var admitted = 0L
      scored.foreach { case (_, t, _) => if (used + t <= BUDGET) { used += t; admitted += 1 } }
      (src, scored.length.toLong, admitted, scored.length - admitted, used,
        1000000L * used / BUDGET)
    }
    val got = run("p15_token_budget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == want, s"budget mismatch: got ${got.take(3)} want ${want.take(3)}")
    got.foreach { case (src, _, _, skipped, used, _) =>
      assert(used <= BUDGET, s"$src used $used > $BUDGET")
      assert(skipped > 0, s"$src admitted everything — budget never binds")
    }
  }
}
