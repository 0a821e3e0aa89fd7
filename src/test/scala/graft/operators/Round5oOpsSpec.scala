package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 sixteenth wave (d12 LSH band curve,
  * s18 quantization error curve, g11 two-hop reach).
  */
class Round5oOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  test("d12: the 4x4 point reproduces d02's pair count; shorter bands never lose pairs") {
    val d02pairs = run("d02_minhash_lsh").collect().length.toLong
    val got = run("d12_lsh_band_curve").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got.map(g => (g._1, g._2)) == Seq((8, 2), (4, 4), (2, 8)))
    val p44 = got.find(g => g._1 == 4 && g._2 == 4).get
    assert(p44._3 == d02pairs, s"4x4 candidates ${p44._3} != d02's $d02pairs")
    // recall ordering: more, shorter bands can only add candidate pairs
    // (any pair matching a longer band matches both its halves) — so
    // n_pairs(8x2) >= n_pairs(4x4) >= n_pairs(2x8)
    assert(got(0)._3 >= got(1)._3 && got(1)._3 >= got(2)._3, s"pair counts not monotone: $got")
    // and precision moves the other way or stays equal on this fixture
    assert(got(0)._5 <= got(2)._5, s"precision did not improve with longer bands: $got")
  }

  test("s18: per-depth error equals a scalar quantize-reconstruct sweep; error falls with bits") {
    val rows = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val want = Seq((8, 127.0), (4, 7.0), (1, 1.0)).map { case (bits, lv) =>
      val e6s = rows.map { case (_, v) =>
        var maxabs = 0.0
        v.foreach(x => maxabs = math.max(maxabs, math.abs(x)))
        var err = 0.0
        v.foreach { x =>
          val dq = math.rint(x * lv / maxabs) * maxabs / lv
          err += (x - dq) * (x - dq)
        }
        java.math.BigDecimal.valueOf(err * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      }
      val total = e6s.sum
      val n = e6s.length.toLong
      (bits, n, total, ((2 * total + n) / (2 * n)).toDouble / 1e6)
    }
    val got = run("s18_quant_error_curve").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want, s"quant curve mismatch: got $got want $want")
    // fewer bits -> strictly more reconstruction error on real data
    assert(got(0)._3 < got(1)._3 && got(1)._3 < got(2)._3, s"error not monotone: $got")
  }

  test("g11: two-hop sets equal a scalar BFS layer; disjoint from direct neighbors") {
    // scalar replay of the BLOCKED kNN builder (round-6 contract)
    val und = KnnGraphFixture.und(spark, sf0001)
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = adj.toSeq.sortBy(_._1).map { case (u, ns) =>
      val two = ns.flatMap(adj(_)).filter(x => x != u && !ns(x))
      (u, ns.size.toLong, two.size.toLong)
    }
    val got = run("g11_two_hop_reach").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"two-hop mismatch: got ${got.take(4)} want ${want.take(4)}")
    // the graph expands somewhere: someone's two-hop set is nonempty
    assert(got.exists(_._3 > 0))
  }
}
