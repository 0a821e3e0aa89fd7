package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 forty-third wave (q142 Gini decision
  * stump, q143 consistent-hashing rebalance audit, t36 Good-Turing
  * frequency-of-frequencies).
  */
class Round5zqOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q142: best stump equals an exhaustive scalar split search") {
    val rows = graft.Tables.events(spark, sf0001)
      .selectExpr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) div 100",
        "CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length.toLong
    val p = rows.map(_._2).sum
    def side(c: Long, pos: Long) = BigInt(pos) * pos + BigInt(c - pos) * (c - pos)
    val cands = rows.map(_._1).distinct.sorted.flatMap { t =>
      val nl = rows.count(_._1 <= t).toLong
      val pl = rows.filter(_._1 <= t).map(_._2).sum
      val (nr, pr) = (n - nl, p - pl)
      if (nr == 0) None
      else Some((t, nl, nr, pl, pr,
        ((side(nl, pl) * nr + side(nr, pr) * nl) * BigInt("1000000000000")
          / (BigInt(nl) * nr)).toLong))
    }
    val parent = (side(n, p) * BigInt("1000000000000") / n).toLong
    val want = cands.minBy(c => (-c._6, c._1))
    val got = run("q142_gini_stump").collect()
    assert(got.length == 1)
    val g = got.head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4),
      g.getLong(5)) == want, s"stump mismatch: got ${g} want $want")
    assert(g.getLong(6) == want._6 - parent, "gain mismatch")
    // a split on value must actually beat the no-split parent: purchases
    // in the fixture carry a different value profile than other types
    assert(g.getLong(6) >= 0, "negative Gini gain")
  }

  test("q143: consistent-hash movement only flows INTO the new shard") {
    val got = run("q143_consistent_hash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val total = got.map(_._3).sum
    val moved = got.filter(_._4).map(_._3).sum
    // the consistent-hashing contract: every moved user lands on the NEW
    // shard (8); no old->old churn, unlike hash-mod resharding
    got.filter(_._4).foreach { case (s8, s9, _, _) =>
      assert(s9 == 8L, s"user moved $s8 -> $s9, not into the new shard")
    }
    assert(got.forall(r => r._4 == (r._1 != r._2)))
    // moved fraction ~ 1/9 (8 of 72 ring points): generous envelope
    assert(moved > 0 && moved.toDouble / total < 0.35,
      s"moved $moved of $total — ring is not balancing")
    // old-shard ids stay in 0..7, new in 0..8
    assert(got.forall(r => r._1 >= 0 && r._1 <= 7 && r._2 >= 0 && r._2 <= 8))
  }

  test("q143: scalar ring replay agrees for every user") {
    val ring = (0 until 72).map { i =>
      val shard = i / 8
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ring#$shard:${i % 8}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (shard.toLong, java.lang.Long.parseLong(h, 16))
    }
    def assign(upos: Long, shards: Int): Long = {
      val pts = ring.filter(_._1 < shards)
      val succ = pts.filter(_._2 >= upos)
      (if (succ.nonEmpty) succ.minBy(_._2) else pts.minBy(_._2))._1
    }
    val users = graft.Tables.events(spark, sf0001)
      .select("user_id").distinct().collect().map(_.getLong(0))
    val want = users.map { u =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"u#$u".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      val upos = java.lang.Long.parseLong(h, 16)
      (assign(upos, 8), assign(upos, 9))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = run("q143_consistent_hash").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, s"matrix mismatch: got $got want $want")
  }

  test("t36: Good-Turing table equals a scalar counts-of-counts replay") {
    val words = graft.Tables.documents(spark, sf0001)
      .selectExpr("text").collect().map(_.getString(0))
      .flatMap(t => t.split(" ", -1).sliding(3).filter(_.length == 3).map(_.mkString(" ")))
    val wc = words.groupBy(identity).map(_._2.length.toLong)
    val cc = wc.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    val t = cc.map { case (r, nr) => r * nr }.sum
    val want = cc.filter(_._1 <= 20).toSeq.sortBy(_._1).map { case (r, nr) =>
      val nNext = cc.getOrElse(r + 1, 0L)
      val rStar = (r + 1) * nNext * 1000000L / nr
      (r, nr, nNext, t, rStar, nr * rStar / t)
    }
    val got = run("t36_good_turing").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"GT mismatch: got ${got.take(3)} want ${want.take(3)}")
    // trigram types ARE hapax-rich — the regime Good-Turing exists for
    assert(got.headOption.exists(r => r._1 == 1 && r._2 > 0), "no hapax row")
  }
}
