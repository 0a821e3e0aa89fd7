package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 forty-sixth wave (q147 exact-rational
  * NPV, q148 Benjamini-Hochberg FDR screen, s26 decile lift/gains).
  */
class Round5ztOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q147: segment NPV equals a scalar rational-discounting replay") {
    val cust = graft.Tables.customer(spark, sf0001)
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val o = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_custkey",
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)",
        "year(CAST(o_orderdate AS DATE))").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val y0 = o.map(_._3).min
    val want = o.groupBy(r => cust(r._1)).toSeq.sortBy(_._1).map { case (seg, g) =>
      val terms = g.map { case (_, cents, yr) =>
        val k = yr - y0
        BigInt(cents) * 1000000 * BigInt(10).pow(k) / BigInt(11).pow(k)
      }
      val nominal = g.map(_._2).sum
      val npv = (terms.sum / 1000000).toLong
      (seg, g.length.toLong, nominal, npv, npv * 1000000L / nominal)
    }
    val got = run("q147_npv_exact").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"NPV mismatch: got ${got.take(2)} want ${want.take(2)}")
    // discounting strictly shrinks a multi-year stream
    got.foreach(r => assert(r._4 < r._3 && r._4 > 0, s"${r._1} npv out of range"))
  }

  test("q148: BH screen equals a scalar step-up replay") {
    val c = graft.Tables.customer(spark, sf0001)
      .selectExpr("c_nationkey", "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val n = c.length.toLong
    val sSum = c.map(_._2).sum
    val ssq = c.map(r => BigInt(r._2) * r._2).sum
    val per = c.groupBy(_._1).map { case (k, g) =>
      (k, g.length.toLong, g.map(_._2).sum)
    }.toSeq
    val scored = per.map { case (k, ni, si) =>
      val diff = BigInt(si) * n - BigInt(sSum) * ni
      val num = diff * diff
      val den = BigInt(ni) * (BigInt(n) * ssq - BigInt(sSum) * sSum)
      (k, ni, num, den, (num * 1000000 / den).toLong)
    }.sortBy(r => (-r._5, r._1))
    val m = scored.length.toLong
    val ranked = scored.zipWithIndex.map { case ((k, ni, num, den, z2), i) =>
      val rank = i + 1L
      (k, ni, rank, z2, num, den, 20 * BigInt(m) * den <= BigInt(rank) * num)
    }
    val kstar = ranked.filter(_._7).map(_._3).sorted.lastOption
    val want = ranked.map { case (k, ni, rank, z2, num, den, _) =>
      val p = if (num == 0) 1000000L else (den * 1000000 / num).min(1000000).toLong
      (k, ni, rank, z2, p, rank * 1000000L / (20 * m),
        kstar.exists(rank <= _))
    }
    val got = run("q148_bh_fdr").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(got == want, s"BH mismatch: got ${got.take(3)} want ${want.take(3)}")
    // significance is a prefix of the ranking (the step-up property)
    val sig = got.filter(_._7).map(_._3)
    assert(sig == (1L to sig.length).toSeq, s"significant set not a rank prefix: $sig")
  }

  test("s26: lift table equals a scalar decile replay and is monotone-capture") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("event_id", "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)",
        "CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sorted = ev.sortBy(r => (-r._2, r._1))
    val nTot = sorted.length
    // ntile semantics: first (n mod 10) tiles get the extra row
    val base = nTot / 10; val extra = nTot % 10
    val sizes = (1 to 10).map(t => base + (if (t <= extra) 1 else 0))
    val cuts = sizes.scanLeft(0)(_ + _)
    val pp = sorted.map(_._3).sum
    var cum = 0L
    val want = (1 to 10).map { t =>
      val g = sorted.slice(cuts(t - 1), cuts(t))
      val pos = g.map(_._3).sum
      cum += pos
      (t, g.length.toLong, pos, pos * 1000000L / g.length,
        pos * nTot * 1000000L / (g.length * pp), cum * 1000000L / pp)
    }
    val got = run("s26_lift_gains").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"lift mismatch: got ${got.take(3)} want ${want.take(3)}")
    // cumulative capture is nondecreasing and ends at 100%
    assert(got.map(_._6) == got.map(_._6).sorted && got.last._6 == 1000000L)
  }
}
