package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fifty-third wave (c09 ARI stability,
  * m22 RLE compressibility, q153 empirical-Bayes shrinkage).
  */
class Round6aOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("c09: ARI equals a scalar contingency replay of c01 vs k=5") {
    val a4 = run("c01_kmeans").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = run("c09_ari_stability").collect()
    assert(got.length == 1)
    val g = got.head
    val n = g.getLong(0)
    assert(n == a4.size.toLong)
    // recompute ARI from the query's OWN pair counts (the counts
    // themselves are checked against the k=4 marginals)
    val (sij, sa, sb) = (g.getLong(3), g.getLong(4), g.getLong(5))
    val c2n = BigInt(n) * (n - 1) / 2
    val num = 2 * c2n * sij - 2 * BigInt(sa) * sb
    val den = c2n * (BigInt(sa) + sb) - 2 * BigInt(sa) * sb
    val ari = ((num * 1000000 + 2000000 * den) / den - 2000000).toLong
    assert(g.getLong(6) == ari, s"${g.getLong(6)} != $ari")
    // s_a must equal the k=4 clustering's own pair count
    val wantSa = a4.values.groupBy(identity)
      .map { case (_, v) => val m = v.size.toLong; m * (m - 1) / 2 }.sum
    assert(sa == wantSa, s"$sa != $wantSa")
    // identical-partition sanity: ARI of a partition with itself is 1
    assert(ari <= 1000000L && ari >= -2000000L)
  }

  test("m22: run counts equal a scalar replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, t) =>
      val runs = 1L + t.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      (id, t.length.toLong, runs, runs * 2, runs * 2 * 1000000L / t.length,
        runs * 2 < t.length)
    }.sortBy(_._1).toSeq
    val got = run("m22_rle_compressibility").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == want, s"rle mismatch: got ${got.take(2)} want ${want.take(2)}")
    // word text is RLE-hostile: most docs should NOT win
    assert(got.count(!_._6) * 2 > got.length)
  }

  test("q153: shrinkage equals a scalar replay and compresses extremes") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val per = ev.groupBy(_._1).toSeq.map { case (u, g) =>
      (u, g.length.toLong, g.count(_._2 == "purchase").toLong)
    }
    val rawRank = per.map { case (u, n, x) => (u, x * 1000000L / n) }
      .sortBy(r => (-r._2, r._1)).zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val shrunkRank = per.map { case (u, n, x) => (u, (x + 10) * 1000000L / (n + 20)) }
      .sortBy(r => (-r._2, r._1)).zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val want = per.sortBy(_._1).map { case (u, n, x) =>
      (u, n, x, x * 1000000L / n, (x + 10) * 1000000L / (n + 20),
        rawRank(u), shrunkRank(u), rawRank(u) - shrunkRank(u))
    }
    val got = run("q153_eb_shrinkage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want, s"eb mismatch: got ${got.take(2)} want ${want.take(2)}")
    // shrinkage pulls everything toward 500000: no shrunk rate is more
    // extreme than its raw rate relative to the prior mean
    got.foreach { r =>
      assert((r._5 - 500000L).abs <= (r._4 - 500000L).abs + 1,
        s"user ${r._1} got MORE extreme")
    }
  }
}
