package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirty-eighth wave (d14 weighted
  * Jaccard, q136 zone-map skipping, q137 price-volume-mix).
  */
class Round5zkOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("d14: weighted Jaccard equals a scalar replay; IDF reweights vs plain Jaccard") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "lang", "split(text, ' ')").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toVector))
      .filter(_._3.length >= 3)
    val n = docs.length.toLong
    val tokSets = docs.map(d => d._1 -> d._3.filter(_.nonEmpty).distinct.toSet).toMap
    val df = tokSets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val idf = df.map { case (t, c) =>
      t -> math.floor(1000000 * math.log(n.toDouble / c)).toLong
    }
    val shingles = docs.map { d =>
      d._1 -> d._3.sliding(3).map(_.mkString(" ")).toVector.distinct.toSet
    }.toMap
    val langOf = docs.map(d => d._1 -> d._2).toMap
    val ids = docs.map(_._1).sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (a, b) = (ids(i), ids(j))
      if langOf(a) == langOf(b)
      ns = (shingles(a) & shingles(b)).size.toLong
      if ns >= 2
    } yield {
      val sharedIdf = (tokSets(a) & tokSets(b)).toSeq.map(idf).sum
      val union = tokSets(a).toSeq.map(idf).sum + tokSets(b).toSeq.map(idf).sum - sharedIdf
      (a, b, ns, sharedIdf, union, 1000000L * sharedIdf / union)
    }).sortBy(r => (r._1, r._2)).toSeq
    val got = run("d14_weighted_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"wj mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.nonEmpty, "no blocked candidates at sf0.001")
    assert(got.forall(r => r._6 >= 0L && r._6 <= 1000000L))
  }

  test("q136: skipping audit equals a scalar replay; zone maps never skip a match") {
    val rows = graft.Tables.orders(spark, sf0001)
      .selectExpr("datediff(o_orderdate, DATE'1970-01-01') div 7",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val zones = rows.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max)).toMap
    val preds = Seq(("p1_gt_30m", 3000000000L, Long.MaxValue),
      ("p2_band_1m_2m", 100000000L, 200000000L),
      ("p3_lt_500k", Long.MinValue, 50000000L))
    val want = preds.map { case (pid, lo, hi) =>
      val skipped = zones.filter { case (_, (_, zmin, zmax)) => zmax < lo || zmin > hi }
      val rowsSkipped = skipped.values.map(_._1).sum
      val total = rows.length.toLong
      val matching = rows.count(r => r._2 >= lo && r._2 <= hi).toLong
      (pid, zones.size.toLong, skipped.size.toLong, rowsSkipped, total, matching,
        1000000L * rowsSkipped / total, 1000000L * matching / total)
    }.sortBy(_._1)
    val got = run("q136_zone_map_skipping").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want, s"skip audit mismatch: got $got want $want")
    // soundness: a skipped file can never contain a matching row, so
    // matching_rows + rows_skipped <= total_rows
    assert(got.forall(r => r._6 + r._4 <= r._5))
  }

  test("q137: PVM bridge equals a scalar replay; the bridge closes exactly") {
    val liDf = graft.Tables.lineitem(spark, sf0001)
    val partDf = graft.Tables.part(spark, sf0001)
    val li = liDf
      .join(partDf, liDf("l_partkey") === partDf("p_partkey"))
      .selectExpr("p_brand", "year(l_shipdate)", "CAST(l_quantity AS BIGINT)",
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .filter(r => r._2 == 1995 || r._2 == 1996)
    val want = li.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (brand, xs) =>
      val qa = xs.filter(_._2 == 1995).map(_._3).sum
      val qb = xs.filter(_._2 == 1996).map(_._3).sum
      val va = xs.filter(_._2 == 1995).map(_._4).sum
      val vb = xs.filter(_._2 == 1996).map(_._4).sum
      if (qa == 0 || qb == 0) None
      else {
        val ve = Math.floorDiv((qb - qa) * va, qa)
        val pe = vb - Math.floorDiv(qb * va, qa)
        Some((brand, qa, qb, va, vb, vb - va, ve, pe, vb - va - ve - pe))
      }
    }
    val got = run("q137_price_volume_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    assert(got == want, s"pvm mismatch: got ${got.take(2)} want ${want.take(2)}")
    // the rational identity dV = VE + PE means the floor residual is 0 or 1
    assert(got.forall(r => r._9 >= 0L && r._9 <= 1L), s"residual out of range")
  }
}
