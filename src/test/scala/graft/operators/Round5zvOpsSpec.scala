package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 forty-eighth wave (c08 Davies-Bouldin
  * index, p24 top-p nucleus coverage).
  */
class Round5zvOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("c08: Davies-Bouldin pieces are internally consistent with c01") {
    val assign = run("c01_kmeans").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val emb = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE))").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // scalar replay: exact BigDecimal means per cluster, then the
    // floor-micro distance/ratio arithmetic of the query
    val byCl = assign.groupBy(_._2).map { case (cl, m) => cl -> m.keys.toSeq.sorted }
    val dims = emb.head._2.length
    val means = byCl.map { case (cl, ids) =>
      cl -> Array.tabulate(dims) { p =>
        val s = ids.map(id => BigDecimal(emb(id)(p)).setScale(12, BigDecimal.RoundingMode.HALF_UP))
          .foldLeft(BigDecimal(0))(_ + _)
        s.toDouble / ids.length
      }
    }
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < dims) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val sMicro = byCl.map { case (cl, ids) =>
      val dsum = ids.map(id => math.floor(math.sqrt(l2(emb(id), means(cl))) * 1e6).toLong).sum
      cl -> (ids.length.toLong, dsum / ids.length)
    }
    val cls = byCl.keys.toSeq.sorted
    val want = cls.map { ci =>
      val ratios = cls.filter(_ != ci).map { cj =>
        val d = math.floor(math.sqrt(l2(means(ci), means(cj))) * 1e6).toLong
        cj -> (sMicro(ci)._2 + sMicro(cj)._2) * 1000000L / d
      }
      val (wj, r) = ratios.minBy { case (j, r2) => (-r2, j) }
      (ci.toLong, sMicro(ci)._1, sMicro(ci)._2, wj.toLong, r)
    }
    val dbIdx = want.map(_._5).sum / want.length
    val got = run("c08_davies_bouldin").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getInt(3).toLong,
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) == want,
      s"DB mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.forall(_._6 == dbIdx))
    // a sane clustering separates: every ratio positive, index too
    assert(dbIdx > 0)
  }

  test("p24: nucleus coverage equals a scalar per-source replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("source", "doc_id", "CAST(size(split(text, ' ')) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, g) =>
      val total = g.map(_._3).sum
      val sorted = g.sortBy(r => (-r._3, r._2))
      var cum = 0L
      val kept = sorted.takeWhile { r => val ok = 10 * cum < 9 * total; cum += r._3; ok }
      (src, g.length.toLong, total, kept.length.toLong, kept.map(_._3).sum,
        kept.length * 1000000L / g.length, kept.map(_._3).sum * 1000000L / total)
    }
    val got = run("p24_top_p_coverage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want, s"p24 mismatch: got ${got.take(2)} want ${want.take(2)}")
    // the nucleus always reaches >= 90% of tokens and keeps fewer docs
    got.foreach { r =>
      assert(r._7 >= 900000L, s"${r._1} covers only ${r._7}")
      assert(r._4 <= r._2)
    }
  }
}
