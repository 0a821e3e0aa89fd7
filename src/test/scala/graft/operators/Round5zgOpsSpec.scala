package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirty-fourth wave (m16 keyframe
  * selection, q132 boxplot five-number summary, s23 intra-list
  * diversity).
  */
class Round5zgOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("m16: keyframes equal a scalar shot+sharpness replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val want = docs.flatMap { case (id, bytes) =>
      val nf = bytes.length / 32
      if (nf < 2) Nil
      else {
        val hists = Array.tabulate(nf) { f =>
          val h = new Array[Int](16)
          (f * 32 until f * 32 + 32).foreach(i => h((bytes(i) & 0xff) / 16) += 1)
          h
        }
        def energy(f: Int): Int =
          (f * 32 + 1 until f * 32 + 31).map(i =>
            math.abs((bytes(i - 1) & 0xff) - 2 * (bytes(i) & 0xff) + (bytes(i + 1) & 0xff))).sum
        var shot = 0
        val frames = (0 until nf).map { f =>
          if (f > 0) {
            val l1 = (0 until 16).map(b => math.abs(hists(f)(b) - hists(f - 1)(b))).sum
            if (l1 >= 24) shot += 1
          }
          (shot, f, energy(f))
        }
        frames.groupBy(_._1).toSeq.sortBy(_._1).map { case (sh, fs) =>
          val best = fs.minBy(x => (-x._3, x._2))
          (id, sh, fs.length.toLong, best._2, best._3)
        }
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = run("m16_keyframe_select").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .toSeq
    assert(got == want, s"keyframe mismatch: got ${got.take(3)} want ${want.take(3)}")
    // keyframe energy is the max within its shot by construction; shots
    // are contiguous so shot ids start at 0 per doc
    assert(got.groupBy(_._1).values.forall(_.map(_._2).min == 0))
  }

  test("q132: boxplot equals a scalar replay; fences catch the planted tails") {
    val ordersDf = graft.Tables.orders(spark, sf0001)
    val customerDf = graft.Tables.customer(spark, sf0001)
    val base = ordersDf
      .join(customerDf, ordersDf("o_custkey") === customerDf("c_custkey"))
      .selectExpr("c_mktsegment", "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = base.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, xs) =>
      val n = xs.length.toLong
      val sorted = xs.sortBy(x => (x._3, x._2)).map(_._3)
      def pick(r: Long) = sorted(r.toInt - 1)
      val q1 = pick((n + 3) / 4); val med = pick((n + 1) / 2); val q3 = pick((3 * n + 3) / 4)
      val lo = xs.count(x => 2 * x._3 < 2 * q1 - 3 * (q3 - q1)).toLong
      val hi = xs.count(x => 2 * x._3 > 2 * q3 + 3 * (q3 - q1)).toLong
      (seg, n, sorted.head, q1, med, q3, sorted.last, q3 - q1, lo, hi)
    }
    val got = run("q132_boxplot_five_number").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9))).toSeq
    assert(got == want, s"boxplot mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.forall(r => r._3 <= r._4 && r._4 <= r._5 && r._5 <= r._6 && r._6 <= r._7))
  }

  test("s23: diversity equals a scalar replay; MMR-reranked lists are no less diverse") {
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE))").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val norms = vecs.map(v => v._1 -> math.sqrt(dot(v._2, v._2))).toMap
    val byId = vecs.toMap
    val want = vecs.filter(_._1 % 50 == 0).sortBy(_._1).map { case (qid, qv) =>
      val top5 = vecs.filter(_._1 != qid)
        .map(v => (r6(dot(qv, v._2) / (norms(qid) * norms(v._1))), v._1))
        .sortBy(x => (-x._1, x._2)).take(5).map(_._2)
      val c6s = for {
        i <- top5.indices; j <- (i + 1) until top5.length
        (a, b) = (math.min(top5(i), top5(j)), math.max(top5(i), top5(j)))
      } yield math.round(1000000 * r6(dot(byId(a), byId(b)) / (norms(a) * norms(b))))
      val sum = c6s.sum
      val mean = Math.floorDiv(sum, c6s.length.toLong)
      (qid, c6s.length.toLong, mean, 1000000L - mean)
    }.toSeq
    val got = run("s23_intralist_diversity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"diversity mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.forall(r => r._2 == 10L))
    assert(got.forall(r => r._4 >= 0L && r._4 <= 2000000L))
  }
}
