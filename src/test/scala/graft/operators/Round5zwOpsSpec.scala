package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 forty-ninth wave (t37 Markov entropy
  * rate, t38 greedy bigram generation, g17 degree power-law card).
  */
class Round5zwOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def bigrams: Map[(String, String), Long] = {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("text").collect().map(_.getString(0))
    docs.flatMap(t => t.split(" ", -1).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
  }

  test("t37: entropy rate equals a scalar quantized-term replay") {
    val big = bigrams
    val cv = big.groupBy(_._1._1).map { case (v, g) => v -> g.values.sum }
    val nb = big.values.sum
    def q9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val hCond = big.map { case ((v, _), c) =>
      q9(-(c.toDouble / nb) * math.log(c.toDouble / cv(v)))
    }.foldLeft(BigDecimal(0))(_ + _)
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("text").collect().map(_.getString(0))
    val uni = docs.flatMap(_.split(" ", -1)).groupBy(identity)
      .map { case (_, g) => g.length.toLong }
    val nt = uni.sum
    val hUni = uni.map(c => q9(-(c.toDouble / nt) * math.log(c.toDouble / nt)))
      .foldLeft(BigDecimal(0))(_ + _)
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = run("t37_entropy_rate").collect().head
    assert(got.getLong(0) == nb)
    assert(got.getLong(1) == cv.size.toLong)
    assert(math.abs(got.getDouble(2) - r6(hCond)) < 2e-6, s"${got.getDouble(2)} vs $hCond")
    assert(math.abs(got.getDouble(3) - r6(hUni)) < 2e-6)
    // context helps: conditional entropy strictly below unigram entropy
    assert(got.getDouble(4) > 0, s"no info gain: ${got.getDouble(4)}")
  }

  test("t38: generations equal a scalar greedy walk") {
    val big = bigrams
    val nxt = big.groupBy(_._1._1).map { case (v, g) =>
      v -> g.toSeq.map { case ((_, w), c) => (w, c) }.minBy { case (w, c) => (-c, w) }._1
    }
    val seeds = graft.Tables.documents(spark, sf0001).selectExpr("text").collect()
      .flatMap(r => r.getString(0).split(" ", -1).toSeq)
    val want = seeds.distinct.sorted.map { s0 =>
      var cur = s0; val buf = scala.collection.mutable.ListBuffer(s0)
      var i = 0; var dead = false
      while (i < 10 && !dead) {
        nxt.get(cur) match {
          case Some(w) => buf += w; cur = w
          case None => dead = true
        }
        i += 1
      }
      (s0, buf.length.toLong, buf.mkString(" "))
    }.toSeq
    val got = run("t38_greedy_generate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == want, s"gen mismatch: got ${got.take(2)} want ${want.take(2)}")
    // every full walk emits 11 tokens (seed + 10 steps)
    assert(got.exists(_._2 == 11L))
  }

  test("g17: power-law card equals a scalar degree-histogram replay") {
    val pairs = run("d02_minhash_lsh").collect()
      .filter(_.getDouble(2) >= 0.5).map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map { case (_, g) => g.length.toLong }.toSeq
    val hist = deg.groupBy(identity).map { case (d0, g) => d0 -> g.length.toLong }
    def lq(x: Long) = BigDecimal(math.log(x.toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val xy = hist.toSeq.map { case (d0, n0) => (lq(d0), lq(n0)) }
    val n = xy.length.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val got = run("g17_degree_powerlaw").collect().head
    assert(got.getLong(0) == deg.length.toLong, "n_nodes")
    assert(got.getLong(1) == pairs.length.toLong, "n_edges")
    assert(got.getLong(2) == deg.max, "max_degree")
    assert(got.getLong(3) == n, "n_degree_classes")
    if (n * sxx - sx * sx > 0) {
      val alpha = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      assert(math.abs(got.getDouble(4) - alpha) < 2e-6, s"${got.getDouble(4)} vs $alpha")
    } else assert(got.isNullAt(4))
  }
}
