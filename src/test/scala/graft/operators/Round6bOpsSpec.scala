package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fifty-fourth wave (q154
  * difference-in-differences, q155 ABC-XYZ matrix).
  */
class Round6bOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def hash60(s0: String): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5").digest(s0.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16)

  test("q154: DiD cells and estimator equal a scalar replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts)",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val us0 = ev.map(_._2).min
    val cells = ev.groupBy(e => (hash60(e._1.toString) % 2, e._2 >= us0 + 1296000000000L))
      .map { case (k, g) => k -> (g.length.toLong, g.map(_._3).sum) }
    def mean(v: Long, p: Boolean) = {
      val (n, s0) = cells((v, p)); s0 * 1000000L / n
    }
    val did = mean(1, true) - mean(1, false) - mean(0, true) + mean(0, false)
    val want = cells.toSeq.sortBy(_._1).map { case ((v, p), (n, s0)) =>
      (v, p, n, s0, s0 * 1000000L / n, did)
    }
    val got = run("q154_diff_in_diff").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"did mismatch: got $got want $want")
    assert(got.length == 4)
  }

  test("q155: ABC-XYZ matrix equals a scalar classification replay") {
    val orders = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_orderkey", "date_format(CAST(o_orderdate AS DATE), 'yyyy-MM')")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = graft.Tables.lineitem(spark, sf0001)
      .selectExpr("l_partkey", "l_orderkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)",
        "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getLong(0), orders(r.getLong(1)), r.getLong(2), r.getLong(3)))
    val nm = li.map(_._2).distinct.length.toLong
    val xyz = li.groupBy(_._1).map { case (pk, g) =>
      val mq = g.groupBy(_._2).map(_._2.map(_._4).sum).toSeq
      val sq = mq.sum; val sqq = mq.map(v => BigInt(v) * v).sum
      val cv2 = ((BigInt(nm) * sqq - BigInt(sq) * sq) * 1000000 / (BigInt(sq) * sq)).toLong
      pk -> (if (cv2 < 250000L) "X" else if (cv2 < 1000000L) "Y" else "Z")
    }
    val rev = li.groupBy(_._1).map { case (pk, g) => pk -> g.map(_._3).sum }
    val trc = rev.values.sum
    var cum = 0L
    val abc = rev.toSeq.sortBy(r => (-r._2, r._1)).map { case (pk, r) =>
      val cls = if (5 * cum < 4 * trc) "A" else if (20 * cum < 19 * trc) "B" else "C"
      cum += r
      pk -> (cls, r)
    }.toMap
    val want = abc.toSeq.map { case (pk, (a, r)) => (a, xyz(pk), r) }
      .groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1)
      .map { case ((a, x), g) =>
        (a, x, g.length.toLong, g.map(_._3).sum, g.map(_._3).sum * 1000000L / trc)
      }
    val got = run("q155_abc_xyz").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"abcxyz mismatch: got ${got.take(4)} want ${want.take(4)}")
    // shares sum to ~100% and A rows dominate revenue
    assert((1000000L - got.map(_._5).sum).abs <= got.length)
    val aShare = got.filter(_._1 == "A").map(_._5).sum
    assert(aShare >= 700000L, s"A share only $aShare")
  }
}
