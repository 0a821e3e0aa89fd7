package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 sixtieth wave (q164 share-of-parent,
  * q165 cumulative uniques, q166 Simpson's screen).
  */
class Round6hOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q164: hierarchy shares equal a scalar rollup and sum to one") {
    val got = run("q164_share_of_parent").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val world = got.map(_._3).sum
    got.groupBy(_._1).foreach { case (_, g) =>
      val region = g.map(_._3).sum
      assert(g.forall(_._4 == region), "region_cents inconsistent")
      g.foreach { r =>
        assert(r._5 == r._3 * 1000000L / region, s"region share ${r._5}")
        assert(r._6 == r._3 * 1000000L / world, s"world share ${r._6}")
        assert(r._7 == region * 1000000L / world)
      }
      // floor shares within a region sum to <= 1 and miss < 1 micro/row
      val s0 = g.map(_._5).sum
      assert(s0 <= 1000000L && s0 > 1000000L - g.length, s"region sums $s0")
    }
  }

  test("q165: cumulative uniques equal a scalar first-seen replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "CAST(CAST(ts AS DATE) AS STRING)").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val firstDay = ev.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val want = ev.groupBy(_._2).toSeq.sortBy(_._1).map { case (day, g) =>
      val users = g.map(_._1).distinct
      val nu = users.count(u => firstDay(u) == day).toLong
      (day, users.length.toLong, nu, users.length - nu)
    }
    var cum = 0L
    val wantCum = want.map { r => cum += r._3; (r._1, r._2, r._3, r._4, cum) }
    val got = run("q165_cumulative_uniques").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == wantCum, s"uniques mismatch: got ${got.take(3)} want ${wantCum.take(3)}")
    // the curve ends at the total distinct-user count
    assert(got.last._5 == ev.map(_._1).distinct.length.toLong)
  }

  test("q166: covariance signs equal a scalar replay") {
    val part = graft.Tables.part(spark, sf0001)
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = graft.Tables.lineitem(spark, sf0001)
      .selectExpr("l_partkey",
        "CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)",
        "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)").collect()
      .map(r => (part(r.getLong(0)), r.getLong(1), r.getLong(2)))
    def covSign(g: Seq[(String, Long, Long)]): Int = {
      val n = g.length
      val num = BigInt(n) * g.map(r => BigInt(r._2) * r._3).sum -
        BigInt(g.map(_._2).sum) * g.map(_._3).sum
      num.signum
    }
    val pooled = covSign(li.toSeq)
    val per = li.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, g) =>
      (b, g.length.toLong, covSign(g.toSeq))
    }
    val nFlipped = per.count(r => r._3 != 0 && pooled != 0 && r._3 != pooled).toLong
    val want = per.map { case (b, n, s0) =>
      (b, n, s0, pooled, s0 != 0 && pooled != 0 && s0 != pooled, nFlipped)
    }
    val got = run("q166_simpsons_screen").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4), r.getLong(5))).toSeq
    assert(got == want, s"simpson mismatch: got ${got.take(3)} want ${want.take(3)}")
  }
}
