package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fortieth wave (t35 Jensen-Shannon vs
  * corpus, q139 RFM segmentation, c06 k-means elbow curve).
  */
class Round5znOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("t35: JS divergence equals a scalar replay; bounded by ln 2 and symmetric-safe") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val st = docs.flatMap { case (s, t) => t.split(" ").map(tok => (s, tok)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sTot = st.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val corpus = st.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val tc = corpus.values.sum
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = sTot.keys.toSeq.sorted.map { src =>
      val present = st.filter(_._1._1 == src)
      val t = sTot(src)
      var jsum = BigDecimal(0)
      var ccp = 0L
      present.foreach { case ((_, tok), c) =>
        val pa = c.toDouble / t
        val pc = corpus(tok).toDouble / tc
        val m = (pa + pc) / 2.0
        jsum += r9(0.5 * pa * math.log(pa / m) + 0.5 * pc * math.log(pc / m))
        ccp += corpus(tok)
      }
      val js = r6(jsum.toDouble + 0.5 * math.log(2.0) * ((tc - ccp).toDouble / tc))
      (src, t, present.size.toLong, js, r6(math.sqrt(js)))
    }
    val got = run("t35_js_divergence").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(got == want, s"js mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.forall(g => g._4 >= 0.0 && g._4 <= math.log(2.0) + 1e-9))
  }

  test("q139: RFM scores equal a scalar ntile replay; segments follow the rules") {
    val orders = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE)",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val anchor = orders.map(_._2).maxBy(_.toEpochDay)
    val per = orders.groupBy(_._1).map { case (ck, os) =>
      val last = os.map(_._2).maxBy(_.toEpochDay)
      (ck, anchor.toEpochDay - last.toEpochDay, os.length.toLong, os.map(_._3).sum)
    }.toSeq
    val n = per.size
    // SQL-standard ntile: first (n mod k) buckets get one extra row
    def ntile5(pos: Int): Int = {
      val q = n / 5; val rem = n % 5
      if (pos < rem * (q + 1)) pos / (q + 1) + 1
      else rem + (pos - rem * (q + 1)) / q + 1
    }
    val rOf = per.sortBy(c => (-c._2, c._1)).zipWithIndex
      .map { case (c, i) => c._1 -> ntile5(i) }.toMap
    val fOf = per.sortBy(c => (c._3, c._1)).zipWithIndex
      .map { case (c, i) => c._1 -> ntile5(i) }.toMap
    val mOf = per.sortBy(c => (c._4, c._1)).zipWithIndex
      .map { case (c, i) => c._1 -> ntile5(i) }.toMap
    def seg(r: Int, f: Int, m: Int): String =
      if (r >= 4 && f >= 4 && m >= 4) "champion"
      else if (r >= 4 && f <= 2) "new"
      else if (r <= 2 && f >= 4) "at_risk"
      else if (r <= 2 && f <= 2) "hibernating"
      else "regular"
    val want = per.sortBy(_._1).map { case (ck, rec, fr, mon) =>
      (ck, rec, fr, mon, rOf(ck), fOf(ck), mOf(ck), seg(rOf(ck), fOf(ck), mOf(ck)))
    }
    val got = run("q139_rfm_segmentation").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))).toSeq
    assert(got == want, s"rfm mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.map(_._8).distinct.size >= 3, "segmentation collapsed to <3 segments")
  }

  test("c06: k=4 inertia matches c01's summed d2 exactly; inertia falls as k grows") {
    val c01d2 = run("c01_kmeans").collect().map(r => BigDecimal(r.getDouble(2)))
      .foldLeft(BigDecimal(0))(_ + _)
    val rows = run("c06_elbow_inertia").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.map(_._1).toSeq == Seq(2, 3, 4))
    assert(rows.map(_._2).distinct.length == 1, "n_vectors differs across k")
    val k4 = rows.find(_._1 == 4).get
    assert(BigDecimal(k4._3) == c01d2,
      s"k=4 inertia ${k4._3} != c01 replay sum $c01d2")
    assert(rows(0)._4.isEmpty && rows(1)._4.isDefined && rows(2)._4.isDefined)
    // drop_vs_prev is exactly the pairwise decimal difference
    assert(BigDecimal(rows(1)._4.get) == BigDecimal(rows(0)._3) - BigDecimal(rows(1)._3))
    assert(BigDecimal(rows(2)._4.get) == BigDecimal(rows(1)._3) - BigDecimal(rows(2)._3))
  }
}
