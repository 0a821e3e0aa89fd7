package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 forty-fourth wave (q144 Haar wavelet
  * energy, q145 lagged cross-correlation, q146 Horvitz-Thompson audit).
  */
class Round5zrOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q144: level energies equal a literal recursive Haar transform") {
    val rows = graft.Tables.orders(spark, sf0001)
      .selectExpr("CAST(o_orderdate AS DATE)",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val d0 = rows.map(_._1).min
    val daily = rows.groupBy(r => java.time.temporal.ChronoUnit.DAYS.between(d0, r._1))
      .map { case (i, g) => i -> g.map(_._2).sum }
    // the textbook pairwise transform the closed form must reproduce
    var level = Array.tabulate(4096)(i => BigInt(daily.getOrElse(i.toLong, 0L)))
    val want = (1 to 12).map { j =>
      val approx = level.grouped(2).map(p => p(0) + p(1)).toArray
      val detail = level.grouped(2).map(p => p(0) - p(1)).toArray
      level = approx
      j -> detail.map(dd => dd * dd).sum
    }.toMap
    val got = run("q144_haar_energy").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == (1 to 12).toSet)
    (1 to 12).foreach { j =>
      assert(got(j)._2 == (want(j) / 1000000).toLong,
        s"level $j energy ${got(j)._2} != ${want(j) / 1000000}")
    }
    // shares sum to ~1
    val shares = run("q144_haar_energy").collect().map(_.getDouble(3)).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum $shares")
  }

  test("q145: exact lagged correlation equals a dense scalar series replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("unix_micros(ts)", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val us0 = ev.map(_._1).min
    val d = ev.map(e => (e._1 - us0) / 3600000000L).max.toInt + 1
    val x = Array.fill(d)(0L); val y = Array.fill(d)(0L)
    ev.foreach { case (us, t) =>
      val b = ((us - us0) / 3600000000L).toInt
      if (t == "view") x(b) += 1
      if (t == "purchase") y(b) += 1
    }
    def mean(a: Array[Long]) = a.sum.toDouble / d
    val (mx, my) = (mean(x), mean(y))
    val sdx = math.sqrt(x.map(v => (v - mx) * (v - mx)).sum)
    val sdy = math.sqrt(y.map(v => (v - my) * (v - my)).sum)
    val got = run("q145_xcorr_lead_lag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    got.foreach { case (lag, nh, sxy, r) =>
      assert(nh == d.toLong, s"span $nh != $d")
      val l = lag.toInt
      assert(sxy == (0 until d - l).map(i => x(i) * y(i + l)).sum, s"sxy lag $l")
      val num = (0 until d - l).map(i => (x(i) - mx) * (y(i + l) - my)).sum
      val wantR = num / (sdx * sdy)
      assert(math.abs(r - wantR) < 1e-5, s"lag $l: $r vs $wantR")
    }
    // synthetic events carry no real lead-lag structure — require only
    // a well-formed correlation
    assert(got.forall(r => math.abs(r._4) <= 1.0))
  }

  test("q146: HT estimate replays the hash sample and bounds the error") {
    val o = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)",
        s"${graft.operators.Ns.hash60("CONCAT('ht#', CAST(o_orderkey AS STRING))")} % 10 = 0")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val want = o.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, g) =>
      val samp = g.filter(_._3)
      val total = g.map(_._2).sum
      val ht = samp.map(_._2).sum * 10
      (p, g.length.toLong, total, samp.length.toLong, ht, ht - total,
        (samp.map(r => BigInt(r._2) * r._2 * 90).sum / 1000000).toLong,
        (BigInt((ht - total).abs) * 1000000 / total).toLong)
    }
    val got = run("q146_ht_estimate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSeq
    assert(got == want, s"HT mismatch: got ${got.take(2)} want ${want.take(2)}")
    // the 10% hash sample is near-uniform: every stratum lands within
    // [5%, 15%] of its population even at the smallest fixture
    got.foreach { case (p, n, _, ns, _, _, _, _) =>
      assert(ns * 100 >= n * 5 && ns * 100 <= n * 15, s"$p sample rate off: $ns/$n")
    }
  }
}
