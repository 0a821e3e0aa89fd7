package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirty-fifth wave (t33 TextRank,
  * q133 data-vault satellite, p22 best-survivor dedup).
  */
class Round5zhOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("t33: keyword ranks equal a scalar PageRank replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("split(text, ' ')").collect()
      .map(_.getSeq[String](0).toVector).filter(_.length >= 2)
    val und = docs.flatMap(ts => ts.zip(ts.tail))
      .filter(p => p._1.nonEmpty && p._2.nonEmpty && p._1 != p._2)
      .map(p => (if (p._1 < p._2) p else p.swap)).distinct
    val adj = und.flatMap(e => Seq(e, e.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val deg = adj.view.mapValues(_.length.toLong).toMap
    var rank = adj.keys.map(_ -> 1.0).toMap
    (1 to 4).foreach { _ =>
      rank = adj.keys.map { t =>
        // fold in sorted-src order, mirroring the query's aggregate()
        val csum = adj(t).foldLeft(0.0)((acc, src) => acc + rank(src) / deg(src))
        t -> (0.15 + 0.85 * csum)
      }.toMap
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = rank.toSeq.map { case (t, r) => (t, r6(r), deg(t)) }
      .sortBy(x => (-x._2, x._1)).take(20).zipWithIndex
      .map { case ((t, r, dg), i) => (i + 1, t, r, dg) }
    val got = run("t33_textrank_keywords").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == want, s"textrank mismatch: got ${got.take(3)} want ${want.take(3)}")
    // stopword-like hubs rise: the top keyword's degree is above the mean
    val meanDeg = deg.values.sum / deg.size
    assert(got.head._4 >= meanDeg)
  }

  test("q133: satellite rows equal a scalar hashdiff-delta replay") {
    val orders = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "o_orderkey",
        "date_format(o_orderdate, 'yyyy-MM-dd')",
        "md5(concat_ws('|', o_orderstatus, o_orderpriority))",
        "o_orderstatus", "o_orderpriority",
        "md5(concat_ws('|', o_custkey))").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6)))
    val want = orders.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ord = xs.sortBy(x => (x._3, x._2))
      var prev: Option[String] = None
      ord.flatMap { o =>
        val keep = prev.isEmpty || prev.get != o._4
        val out = if (keep)
          Some((o._7, o._1, o._2, o._3, o._4, o._5, o._6, prev.isEmpty)) else None
        prev = Some(o._4)
        out
      }
    }.sortBy(r => (r._1, r._3)).toSeq
    val got = run("q133_data_vault").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6), r.getBoolean(7))).toSeq
    assert(got == want, s"satellite mismatch: got ${got.take(2)} want ${want.take(2)}")
    // append-only contract: consecutive surviving rows never repeat a hashdiff
    got.groupBy(_._1).values.foreach { xs =>
      val hds = xs.sortBy(x => (x._4, x._3)).map(_._5)
      hds.zip(hds.tail).foreach { case (a, b) => assert(a != b) }
    }
    // every customer contributes exactly one first version
    assert(got.count(_._8) == got.map(_._1).distinct.length)
  }

  test("p22: survivors equal a scalar union-find replay; reclaim accounting is exact") {
    val pairs = graft.operators.Dedup.minhashPairs(spark, sf0001)
      .filter("est_jaccard >= 0.5").selectExpr("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "n_chars", "CAST(size(split(text, ' ')) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byCluster = docs.groupBy(d => find(d._1)).filter(_._2.length > 1)
    val want = byCluster.toSeq.sortBy(_._1).map { case (cl, xs) =>
      val surv = xs.minBy(x => (-x._2, x._1))
      (cl, xs.length.toLong, surv._1, surv._2, surv._3,
        xs.map(_._3).sum - surv._3)
    }
    val got = run("p22_best_survivor").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"survivor mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.nonEmpty, "no multi-doc near-dup cluster at sf0.001")
    // the survivor is at least as long as any doc it replaced (by construction)
    assert(got.forall(r => r._4 >= 0))
  }
}
