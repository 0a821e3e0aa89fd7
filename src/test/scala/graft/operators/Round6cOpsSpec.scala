package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fifty-fifth wave (q156 control-chart
  * rules, q157 exact knapsack curation).
  */
class Round6cOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q156: rule hits equal a scalar Western-Electric replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("event_type", "event_id", "unix_micros(ts)",
        "CAST(round(value * 1000, 0) AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val us0 = ev.map(_._3).min
    val cut = us0 + 1296000000000L
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, g) =>
      val base = g.filter(_._3 < cut)
      val n = base.length.toLong
      val sv = base.map(_._4).sum
      val svv = base.map(r => BigInt(r._4) * r._4).sum
      val vvar = BigInt(n) * svv - BigInt(sv) * sv
      val mon = g.filter(_._3 >= cut).sortBy(r => (r._3, r._2))
      val devs = mon.map(r => BigInt(r._4) * n - sv)
      def beyond(i: Int, k: Int) = devs(i) * devs(i) > k * k * vvar
      val flags = devs.indices.map { i =>
        def cnt(win: Int, p: Int => Boolean) =
          (math.max(0, i - win + 1) to i).count(p)
        val r1 = beyond(i, 3)
        val r2 = cnt(3, j => beyond(j, 2) && devs(j) > 0) >= 2 ||
          cnt(3, j => beyond(j, 2) && devs(j) < 0) >= 2
        val r3 = cnt(5, j => beyond(j, 1) && devs(j) > 0) >= 4 ||
          cnt(5, j => beyond(j, 1) && devs(j) < 0) >= 4
        val r4 = cnt(8, j => devs(j) > 0) == 8 || cnt(8, j => devs(j) < 0) == 8
        (r1, r2, r3, r4)
      }
      val first = flags.indexWhere(f => f._1 || f._2 || f._3 || f._4)
      (et, mon.length.toLong, flags.count(_._1).toLong, flags.count(_._2).toLong,
        flags.count(_._3).toLong, flags.count(_._4).toLong,
        if (first < 0) None else Some(first + 1L))
    }
    val got = run("q156_control_chart").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSeq
    assert(got == want, s"WE mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.length == 5)
  }

  test("q157: DP optimum equals a scalar knapsack and dominates greedy") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("source", "doc_id", "CAST(size(split(text, ' ')) AS BIGINT)",
        "CAST(size(array_distinct(split(text, ' '))) AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), (r.getLong(2) + 99) / 100, r.getLong(3)))
      .filter(_._3 <= 100)
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, g) =>
      val items = g.sortBy(_._2)
      val dp = Array.fill(101)(0L)
      items.foreach { case (_, _, w, v) =>
        var c = 100
        while (c >= w) { dp(c) = math.max(dp(c), dp((c - w).toInt) + v); c -= 1 }
      }
      var rem = 100L; var gval = 0L
      g.sortBy(r => (-r._4, r._2)).foreach { case (_, _, w, v) =>
        if (w <= rem) { rem -= w; gval += v }
      }
      val best = dp(100)
      (src, g.length.toLong, 100L, best, gval, best - gval,
        if (best > 0) Some((best - gval) * 1000000L / best) else None)
    }
    val got = run("q157_knapsack_curation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSeq
    assert(got == want, s"knapsack mismatch: got ${got.take(2)} want ${want.take(2)}")
    // exactness guarantee: the DP never loses to greedy
    got.foreach(r => assert(r._6 >= 0, s"${r._1}: dp < greedy"))
  }
}
