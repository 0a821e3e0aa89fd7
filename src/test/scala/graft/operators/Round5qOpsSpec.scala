package graft.operators

import graft.SparkSpec

/** Differential for the round-5 eighteenth-wave c04 silhouette score. */
class Round5qOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("c04: per-cluster silhouette equals a scalar all-pairs replay; labels separate") {
    val rows = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def d6(a: Array[Double], b: Array[Double]): Long = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      java.math.BigDecimal.valueOf(math.sqrt(acc) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }
    val sPpm = rows.map { case (id, lb, v) =>
      val byCl = rows.filter(_._1 != id).groupBy(_._2).map { case (cl, os) =>
        val ds = os.map(o => BigInt(d6(v, o._3)))
        cl -> ((2 * ds.sum + os.length) / (2 * BigInt(os.length))).toLong
      }
      val a6 = byCl(lb)
      val b6 = byCl.collect { case (cl, m) if cl != lb => m }.min
      val g = math.max(a6, b6)
      (lb, (BigInt(1000000) * (b6 - a6 + g) / g - 1000000).toLong)
    }
    val want = sPpm.groupBy(_._1).toSeq.sortBy(_._1).map { case (lb, ss) =>
      val n = ss.length.toLong
      val sum = ss.map(x => BigInt(x._2)).sum
      (lb, n, ((sum + BigInt(1000000) * n) / n - 1000000).toLong,
        ss.count(_._2 < 0).toLong)
    }
    val got = run("c04_silhouette").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"silhouette mismatch: got ${got.take(3)} want ${want.take(3)}")
    // range: silhouette lives in [-1, 1] -> ppm in [-1e6, 1e6]
    assert(got.forall(r => r._3 >= -1000000L && r._3 <= 1000000L))
    // the fixture's labels do NOT separate in raw L2 (synthetic
    // embeddings cluster by cosine direction — s16's AUC > 0.5 — but
    // high-dim L2 silhouette is negative): the metric must REPORT that,
    // misfit counts agreeing with the negative means
    assert(got.forall(r => r._3 >= -100000L), s"implausibly bad separation: $got")
    got.foreach { case (lb, n, mean, misfit) =>
      if (mean < 0) assert(misfit > n / 2, s"label $lb: mean $mean but only $misfit/$n misfits")
    }
  }
}
