package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 seventeenth wave (q110 Poisson
  * bootstrap, q111 Neyman allocation, t28 n-gram novelty).
  */
class Round5pOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  // floor(PoissonCDF(k) * 2^16) for k = 0..5 — the 16-bit lane thresholds
  private val T = Seq(24109L, 48218L, 60273L, 64291L, 65296L, 65497L)

  test("q110: replica means equal a scalar Poisson-bootstrap replay; CI brackets the mean") {
    val o = graft.Tables.orders(spark, sf0001)
    val c = graft.Tables.customer(spark, sf0001)
    val base = o.join(c, o("o_custkey") === c("c_custkey"))
      .selectExpr("c_mktsegment", "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def md5hex(s2: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s2.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // replica rep reads 16-bit lane rep%8 of md5("boot:a:<id>") (rep < 8)
    // or md5("boot:b:<id>") (rep >= 8) — the two-digest lane scheme
    def lane(id: Long, rep: Int): Long = {
      val hex = if (rep < 8) md5hex(s"boot:a:$id") else md5hex(s"boot:b:$id")
      val off = 4 * (rep % 8)
      java.lang.Long.parseLong(hex.substring(off, off + 4), 16)
    }
    def pois(h: Long): Long = T.indexWhere(h < _) match { case -1 => 6L; case k => k.toLong }
    val want = base.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, rows) =>
      val means = (0 until 16).flatMap { rep =>
        var wsum = BigInt(0); var wn = 0L
        rows.foreach { case (_, id, cents) =>
          val w = pois(lane(id, rep))
          wsum += BigInt(w) * cents; wn += w
        }
        if (wn == 0) None
        else Some(((2 * wsum * 10000 + wn) / (2 * BigInt(wn))).toLong)
      }.sorted
      val point = {
        val ssum = rows.map(r => BigInt(r._3)).sum
        ((2 * ssum * 10000 + rows.length) / (2 * BigInt(rows.length))).toLong
      }
      (seg, rows.length.toLong, means.length.toLong,
        point.toDouble / 1e6, means(1).toDouble / 1e6, means(14).toDouble / 1e6)
    }
    val got = run("q110_poisson_bootstrap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toSeq
    assert(got == want, s"bootstrap mismatch: got ${got.take(2)} want ${want.take(2)}")
    got.foreach { case (seg, _, nr, m, lo, hi) =>
      assert(nr == 16, s"$seg lost replicas")
      assert(lo <= hi, s"$seg inverted CI")
      assert(lo <= m && m <= hi, s"$seg CI [$lo, $hi] does not bracket mean $m")
    }
  }

  test("q111: allocation equals a scalar largest-remainder split and conserves the budget") {
    val o = graft.Tables.orders(spark, sf0001)
    val c = graft.Tables.customer(spark, sf0001)
    val rows = o.join(c, o("o_custkey") === c("c_custkey"))
      .selectExpr("c_mktsegment", "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val stats = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, rs) =>
      val n = rs.length.toLong
      val sx = rs.map(r => BigInt(r._2)).sum
      val sx2 = rs.map(r => BigInt(r._2) * r._2).sum
      val sd = math.sqrt((BigInt(n) * sx2 - sx * sx).toDouble) / n
      val w6 = java.math.BigDecimal.valueOf(n * sd * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      (seg, n, sd, w6)
    }
    val wtot = stats.map(s2 => BigInt(s2._4)).sum
    val based = stats.map { case (seg, n, sd, w6) =>
      (seg, n, sd, (BigInt(1000) * w6 / wtot).toLong, (BigInt(1000) * w6 % wtot))
    }
    val leftover = 1000L - based.map(_._4).sum
    val topUp = based
      .sortWith((a, b) => a._5 > b._5 || (a._5 == b._5 && a._1 < b._1))
      .take(leftover.toInt).map(_._1).toSet
    val want = based.map { case (seg, n, sd, b, _) =>
      (seg, n,
        java.math.BigDecimal.valueOf(sd).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue,
        b + (if (topUp(seg)) 1L else 0L))
    }
    val got = run("q111_neyman_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == want, s"allocation mismatch: got $got want $want")
    assert(got.map(_._4).sum == 1000L, "budget not conserved")
  }

  test("t28: novelty equals a scalar first-seen sweep and decays over ingestion order") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, t) =>
      shingles(t).foreach(sh => if (!firstDoc.contains(sh)) firstDoc(sh) = id)
    }
    val want = docs.sortBy(_._1).toSeq.flatMap { case (id, t) =>
      val shs = shingles(t)
      if (shs.isEmpty) None
      else {
        val novel = shs.count(firstDoc(_) == id).toLong
        Some((id, shs.size.toLong, novel, 1000000L * novel / shs.size))
      }
    }
    val got = run("t28_ngram_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"novelty mismatch: got ${got.take(3)} want ${want.take(3)}")
    // the corpus repeats itself: late documents are less novel on average
    val half = got.length / 2
    val early = got.take(half).map(_._4).sum / half
    val late = got.drop(half).map(_._4).sum / (got.length - half)
    assert(late < early, s"novelty did not decay: early=$early late=$late")
  }
}
