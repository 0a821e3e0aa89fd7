package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 twenty-eighth wave (q126 one-way ANOVA,
  * q127 STL-lite seasonal decomposition, t31 Heaps'-law fit).
  */
class Round5zaOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q126: F and eta^2 equal a scalar replay; eta^2 in [0,1]") {
    val rows = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_orderpriority", "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val k = groups.length
    val terms = groups.map { case (_, xs) =>
      val n = xs.length.toLong
      val s = xs.map(_._2).sum
      (n, s, xs.map(x => BigInt(x._2) * x._2).sum)
    }
    val nTot = terms.map(_._1).sum
    val sTot = terms.map(_._2).sum
    val ssTot = terms.map(_._3).sum
    // fold in sorted-group order, mirroring the query's aggregate()
    val t = terms.foldLeft(0.0) { case (acc, (n, s, _)) =>
      acc + s.toDouble * s.toDouble / n.toDouble
    }
    val grand = sTot.toDouble * sTot.toDouble / nTot.toDouble
    val ssb = t - grand
    val sst = ssTot.toDouble - grand
    val ssw = sst - ssb
    val f = (ssb / (k - 1)) / (ssw / (nTot - k))
    val eta2 = ssb / sst
    val got = run("q126_anova_f").collect().head
    assert(got.getLong(0) == k.toLong && got.getLong(1) == nTot)
    assert(got.getLong(2) == math.floor(1000000 * f).toLong,
      s"F mismatch: got ${got.getLong(2)} want ${math.floor(1000000 * f).toLong}")
    assert(got.getLong(3) == math.floor(1000000 * eta2).toLong)
    assert(got.getLong(3) >= 0L && got.getLong(3) <= 1000000L)
    assert(got.getLong(4) == (k - 1).toLong && got.getLong(5) == nTot - k)
  }

  test("q127: decomposition equals a scalar replay; parts re-sum exactly") {
    val daily = graft.Tables.orders(spark, sf0001)
      .selectExpr("date_format(to_date(o_orderdate), 'yyyy-MM-dd')",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val days = daily.map(_._1)
    val revs = daily.map(_._2)
    def dow(d: String): Int = {
      val epoch = java.time.LocalDate.parse(d).toEpochDay
      (epoch % 7).toInt
    }
    val trended = (3 until days.length - 3).map { i =>
      val t7 = (i - 3 to i + 3).map(revs).sum
      (days(i), dow(days(i)), revs(i), t7, 7 * revs(i) - t7)
    }
    val seasonal = trended.groupBy(_._2).view.mapValues { xs =>
      val num = xs.map(_._5).sum
      Math.floorDiv(num, xs.length.toLong)
    }.toMap
    val want = trended.map { case (d, w, r, t7, det) =>
      (d, w, r, t7, seasonal(w), det - seasonal(w))
    }
    val got = run("q127_seasonal_decompose").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"decompose mismatch: got ${got.take(2)} want ${want.take(2)}")
    // identity: 7*rev == trend + seasonal + remainder (exact, by construction)
    assert(got.forall(r => 7 * r._3 == r._4 + r._5 + r._6))
    // the seasonal component must be mean-free enough: |sum over dows| < 7
    val sdows = got.map(r => (r._2, r._5)).distinct
    assert(sdows.size <= 7)
  }

  test("t31: Heaps fit equals a scalar replay; 0 < beta < 1") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "split(text, ' ')").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).filter(_.nonEmpty)))
      .sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    var cumN = 0L
    var cumV = 0L
    val pts = docs.filter(_._2.nonEmpty).flatMap { case (_, ts) =>
      cumN += ts.length
      ts.foreach(seen.add)
      cumV = seen.size.toLong
      if (cumN > 0 && cumV > 0)
        Some((math.floor(1000 * math.log(cumN.toDouble)).toLong,
          math.floor(1000 * math.log(cumV.toDouble)).toLong))
      else None
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val num = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble
    val den = (BigInt(n) * sxx - BigInt(sx) * sx).toDouble
    val slope = num / den
    val inter = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    val got = run("t31_heaps_law").collect().head
    assert(got.getLong(0) == n && got.getLong(1) == cumN && got.getLong(2) == cumV)
    assert(got.getLong(3) == math.floor(1000000 * slope).toLong,
      s"beta mismatch: got ${got.getLong(3)} want ${math.floor(1000000 * slope).toLong}")
    assert(got.getLong(4) == math.floor(1000 * inter).toLong)
    // Heaps: sublinear vocabulary growth
    assert(got.getLong(3) > 0L && got.getLong(3) < 1000000L)
  }
}
