package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fifty-sixth wave (st24 KMV sketch
  * batch twin, q158 forecast reconciliation).
  */
class Round6dOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def h52(u: Long): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5").digest(u.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13), 16)

  test("st24 batch twin: sketch and estimate equal a scalar KMV replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, g) =>
      val users = g.map(_._2).distinct
      val hashes = users.map(h52).distinct.sorted.take(64)
      val est =
        if (hashes.length < 64) hashes.length.toDouble
        else BigDecimal((63L * 4503599627370496L).toDouble / hashes.last.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (et, users.length.toLong, hashes.length.toLong, hashes.last, est)
    }
    val got = run("st24_stream_kmv").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == want, s"kmv mismatch: got ${got.take(2)} want ${want.take(2)}")
    // the estimate lands within 30% of truth when the sketch saturates
    got.filter(_._3 == 64L).foreach { r =>
      assert((r._5 - r._2).abs / r._2.toDouble < 0.3, s"${r._1} est ${r._5} vs ${r._2}")
    }
  }

  test("q158: bottom-up and top-down forecasts equal a scalar replay") {
    val cust = graft.Tables.customer(spark, sf0001)
      .selectExpr("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nat = graft.Tables.nation(spark, sf0001)
      .selectExpr("n_nationkey", "n_regionkey").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val om = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "date_format(CAST(o_orderdate AS DATE), 'yyyy-MM')",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").collect()
      .map { r =>
        val nk = cust(r.getLong(0)); (nk, nat(nk), r.getString(1), r.getLong(2))
      }
    val months = om.map(_._3).distinct.sorted.reverse.zipWithIndex
      .map { case (m, i) => m -> (i + 1) }.toMap
    def sumIf(f: ((Int, Int, String, Long)) => Boolean) = om.filter(f).map(_._4).sum
    val want = om.map(r => (r._1, r._2)).distinct.sorted
      .filter { case (nk, _) => om.exists(r => r._1 == nk && months(r._3) <= 4) }
      .map { case (nk, rk) =>
        val own = sumIf(r => r._1 == nk && months(r._3) <= 4) / 4
        val rfc = sumIf(r => r._2 == rk && months(r._3) <= 4) / 4
        val n12 = sumIf(r => r._1 == nk && months(r._3) <= 12)
        val r12 = sumIf(r => r._2 == rk && months(r._3) <= 12)
        val td = (BigInt(rfc) * n12 / r12).toLong
        (nk, rk, own, rfc, td, own - td)
      }.toSeq
    val got = run("q158_forecast_reconcile").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"reconcile mismatch: got ${got.take(2)} want ${want.take(2)}")
    // top-down allocations never overshoot the region forecast (shares
    // sum to <= 1; nations absent from the 4-month window keep their
    // 12-month share unallocated)
    got.groupBy(_._2).foreach { case (_, g) =>
      assert(g.head._4 - g.map(_._5).sum >= 0, "region split overshoots")
    }
  }
}
