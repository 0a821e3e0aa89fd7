package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirty-first wave (g14 local bridges,
  * q129 golden-record survivorship, p20 temperature mixture).
  */
class Round5zdOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("g14: embeddedness equals a scalar adjacency replay; both tie classes exist") {
    // rebuild the kNN graph from g14's own edge output is circular; take
    // the edge list from the query and re-derive cn/deg from scratch
    val rows = run("g14_local_bridges").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6)))
    val edges = rows.map(r => (r._1, r._2)).toSet
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (a, b, cn, da, db, bridge, ppm) =>
      val wantCn = (adj(a) & adj(b)).size.toLong
      assert(cn == wantCn, s"cn($a,$b): $cn != $wantCn")
      assert(da == adj(a).size.toLong && db == adj(b).size.toLong)
      assert(bridge == (cn == 0L))
      val den = da + db - 2 - cn
      assert(ppm == (if (den > 0) 1000000L * cn / den else 0L))
    }
    assert(rows.exists(_._6), "no local bridge in the kNN graph")
    assert(rows.exists(!_._6), "no embedded tie in the kNN graph")
  }

  test("q129: golden record equals a scalar survivorship replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "unix_micros(ts)", "event_type",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)",
        "CAST(get_json_object(props, '$.k') AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, xs) =>
      val ord = xs.sortBy(x => (x._3, x._2))
      val lastClickK = ord.reverse.collectFirst {
        case x if x._4 == "click" && x._6.isDefined => x._6.get
      }
      val lastPurchase = ord.reverse.collectFirst {
        case x if x._4 == "purchase" => x._5
      }
      val purchases = xs.filter(_._4 == "purchase").map(_._5)
      (u, xs.length.toLong, xs.map(_._3).min, xs.map(_._3).max, ord.last._4,
        lastClickK, lastPurchase,
        if (purchases.isEmpty) None else Some(purchases.max))
    }
    val got = run("q129_golden_record").collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getLong(7)))
    }.toSeq
    assert(got == want, s"golden mismatch: got ${got.take(2)} want ${want.take(2)}")
    // survivorship sanity: last purchase never exceeds the max purchase
    assert(got.forall(r => (r._7, r._8) match {
      case (Some(lp), Some(mp)) => lp <= mp
      case (None, None) => true
      case _ => false
    }))
  }

  test("p20: temperature mixture equals a scalar replay; small sources upweighted") {
    val toks = graft.Tables.documents(spark, sf0001)
      .selectExpr("source", "CAST(size(split(text, ' ')) AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val g = toks.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toSeq.sortBy(_._1)
    val total = g.map(_._2._2).sum
    val zsum = g.foldLeft(0.0) { case (acc, (_, (_, t))) => acc + math.sqrt(t.toDouble) }
    val want = g.map { case (src, (nd, t)) =>
      val p = math.sqrt(t.toDouble) / zsum
      (src, nd, t, 1000000L * t / total,
        math.floor(1000000 * math.sqrt(t.toDouble) / zsum).toLong,
        math.floor(1000000 * ((total.toDouble / 5.0) * p / t.toDouble)).toLong)
    }
    val got = run("p20_temperature_mixture").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"mixture mismatch: got ${got.take(2)} want ${want.take(2)}")
    // temperature flattens: the smallest source's p exceeds its raw share,
    // the largest source's p sits below its raw share
    val smallest = got.minBy(_._3)
    val largest = got.maxBy(_._3)
    assert(smallest._5 >= smallest._4, "temperature did not upweight the small source")
    assert(largest._5 <= largest._4, "temperature did not downweight the large source")
  }
}
