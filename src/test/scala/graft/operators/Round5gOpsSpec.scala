package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-5 seventh-wave additions (g07 personalized
  * PageRank, q97 Holt smoothing, q98 burstiness, m09 average pooling).
  */
class Round5gOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("g07: seeds anchor the rank; disconnected non-seeds score zero") {
    val got = run("g07_ppr").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2), r.getLong(3)))
    assert(got.nonEmpty)
    // teleport goes only to seeds: an isolated non-seed can never
    // receive mass; an isolated seed keeps exactly the 0.15 restart
    got.foreach { case (id, ppr, seed, deg) =>
      if (deg == 0 && !seed) assert(ppr == 0.0, s"isolated non-seed $id has rank $ppr")
      if (deg == 0 && seed) assert(ppr == 0.15, s"isolated seed $id has rank $ppr")
      assert(ppr >= 0.0)
    }
    // the personalization bites: the uniform-teleport g01 ranks every
    // node positively, g07 must leave some node at zero
    assert(got.exists(_._2 == 0.0), "no zero-rank node — looks like uniform teleport")
    assert(got.exists(r => r._2 > 0.0 && !r._3), "rank never propagated off the seed set")
  }

  test("q97: level/trend equal a scalar Holt fold (exact IEEE, no rounding)") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      if (xs.length < 2) None
      else {
        var l = xs.head; var b = 0.0
        xs.tail.foreach { x =>
          val l2 = 0.5 * x + 0.5 * (l + b)
          b = 0.5 * (l2 - l) + 0.5 * b
          l = l2
        }
        Some((u, xs.length.toLong, l, b, l + b))
      }
    }
    val got = run("q97_holt_smoothing").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == want, s"holt mismatch: got ${got.take(3)} want ${want.take(3)}")
  }

  test("q98: burstiness equals scalar exact-moment computation; B in [-1, 1)") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, rows) =>
      val us = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val gaps = us.sliding(2).collect { case Array(a, b) => b - a }.toSeq
      if (gaps.isEmpty) None
      else {
        val n = BigInt(gaps.length)
        val sg = gaps.map(BigInt(_)).sum
        val sgg = gaps.map(g => BigInt(g) * g).sum
        val sd = math.sqrt((n * sgg - sg * sg).toDouble) / gaps.length
        val mean = sg.toDouble / gaps.length
        val bd = BigDecimal((sd - mean) / (sd + mean))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((u, gaps.length.toLong, (sg / n).toLong, bd))
      }
    }
    val got = run("q98_burstiness").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want, s"burstiness mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.forall(r => r._4 >= -1.0 && r._4 < 1.0), "B out of [-1, 1)")
  }

  test("q99: chi-square equals a scalar Benford computation; the audit fires") {
    val digits = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderpriority",
        "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT) AS digit")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val p6 = (1 to 9).map(dg => math.round(math.log10(1.0 + 1.0 / dg) * 1e6))
    val want = digits.groupBy(_._1).toSeq.sortBy(_._1).map { case (pri, rows) =>
      val n = rows.length.toLong
      val cnt = rows.groupBy(_._2).map { case (dg, g) => dg -> g.length.toLong }
      val chi2 = cnt.toSeq.sortBy(_._1).map { case (dg, obs) =>
        val e = n.toDouble * p6(dg - 1) / 1e6
        (obs.toDouble - e) * (obs.toDouble - e) / e
      }.foldLeft(0.0)(_ + _)
      val r6 = BigDecimal(chi2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (pri, n, cnt.size, r6, r6 > 20.09)
    }
    val got = run("q99_benford").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == want, s"benford mismatch: got $got want $want")
    // the fixture's price generator is NOT a naturally-grown magnitude
    // distribution — the screen must flag at least one class
    assert(got.exists(_._5), "Benford audit never fired on synthetic prices")
  }

  test("g08: coefficients equal scalar triangle/degree counts; cc in [0, 1]") {
    val tris = run("g02_triangles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tcount = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (id, g) => id -> g.length.toLong }
    val edges = Dedup.simhashPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (id, g) => id -> g.length.toLong }
    val got = run("g08_clustering_coef").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == deg.keySet)
    got.foreach { case (id, d, tri, cc) =>
      assert(d == deg(id), s"degree mismatch for $id")
      assert(tri == tcount.getOrElse(id, 0L), s"triangle count mismatch for $id")
      val want = if (d >= 2)
        BigDecimal(2.0 * tri / (d.toDouble * (d - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(cc == want, s"cc mismatch for $id")
      assert(cc >= 0.0 && cc <= 1.0)
    }
    // dup neighborhoods ARE clique-like: some node must close a triangle
    assert(got.exists(_._4 > 0.0), "no clustering anywhere in the dup graph")
  }

  test("m09: pooled cells equal a scalar 2x2 average over the zero-padded 8x8 decode") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("n_chars") > 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      def px(r: Int, c: Int): Long =
        if (r * 8 + c < text.length) text.charAt(r * 8 + c).toLong else 0L
      for (cell <- 0 until 16) yield {
        val (py, pxc) = (cell / 4, cell % 4)
        val sum = px(2 * py, 2 * pxc) + px(2 * py, 2 * pxc + 1) +
          px(2 * py + 1, 2 * pxc) + px(2 * py + 1, 2 * pxc + 1)
        (id, py, pxc, sum, sum / 4.0)
      }
    }.sortBy(r => (r._1, r._2, r._3)).toSeq
    val got = run("m09_avg_pool").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want, s"pool mismatch: got ${got.take(3)} want ${want.take(3)}")
  }
}
