package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 twenty-fifth wave (s20 farthest-first
  * k-center seeding, q120 SAX words, q121 Cohen's kappa).
  */
class Round5xOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  test("s20: seeds equal a scalar Gonzalez walk; selection radii non-increasing, coverage below last") {
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      round6(acc)
    }
    var seeds = Vector(0L)
    var want = Vector((0, 0L, 0.0))
    for (t <- 1 to 7) {
      val cands = vecs.keys.filterNot(seeds.contains).map { id =>
        (id, seeds.map(s => l2(vecs(id), vecs(s))).min)
      }
      val (nid, nd) = cands.toSeq.sortBy { case (id, md) => (-md, id) }.head
      seeds = seeds :+ nid
      want = want :+ ((t, nid, nd))
    }
    val coverage = vecs.keys.filterNot(seeds.contains)
      .map(id => seeds.map(s => l2(vecs(id), vecs(s))).min).max
    val wantAll = want :+ ((8, -1L, coverage))
    val got = run("s20_kcenter_seed").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == wantAll, s"kcenter mismatch: got $got want $wantAll")
    // Gonzalez invariants: selection distances are non-increasing, and
    // the final coverage radius cannot exceed the last selection radius
    val radii = got.filter(r => r._1 >= 1 && r._1 <= 7).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"selection radii increased: $radii")
    assert(got.last._3 <= radii.last, "coverage radius above the last selection radius")
  }

  test("q120: SAX words equal a scalar PAA+z replay; all words are 8 letters of a-d") {
    val rows = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts)", "event_id",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val series = rs.sortBy(r => (r._2, r._3)).map(_._4)
      val n = series.length.toLong
      val tot = series.sum
      val sumsq = series.map(c => BigInt(c) * c).sum
      if (n < 8 || BigInt(n) * sumsq <= BigInt(tot) * tot) None
      else {
        val sd = math.sqrt((BigInt(n) * sumsq - BigInt(tot) * tot).toDouble) / n
        val mean = tot.toDouble / n
        val word = (0 until 8).map { seg =>
          val vals = series.zipWithIndex.filter { case (_, i) => i.toLong * 8 / n == seg }.map(_._1)
          val z = (vals.sum.toDouble / vals.length - mean) / sd
          if (z < -0.6745) 'a' else if (z < 0) 'b' else if (z < 0.6745) 'c' else 'd'
        }.mkString
        Some((u, n, word))
      }
    }.sortBy(_._1)
    val got = run("q120_sax").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == want, s"sax mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.forall(r => r._3.length == 8 && r._3.forall("abcd".contains(_))))
    // z-normalization makes the alphabet actually used: both below-mean
    // (a/b) and above-mean (c/d) letters must appear. (The sf0.001
    // fixture's right-skewed values never push a segment mean under
    // -0.67 sigma, so demanding the full 4-letter alphabet would
    // overfit the fixture; 3 letters with both sides present pins the
    // breakpoints without that.)
    val letters = got.flatMap(_._3).toSet
    assert(letters.size >= 3, s"letters used: $letters")
    assert(letters.intersect(Set('a', 'b')).nonEmpty && letters.intersect(Set('c', 'd')).nonEmpty,
      s"one-sided alphabet: $letters")
  }

  test("q121: kappa equals the scalar confusion-matrix formula; bounded above by 1") {
    val rows = graft.Tables.documents(spark, sf0001)
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT)", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def r1(t: Long) = if (t < 40) "short" else if (t < 70) "medium" else "long"
    def r2(c: Long) = if (c < 220) "short" else if (c < 390) "medium" else "long"
    val pairs = rows.map { case (t, c) => (r1(t), r2(c)) }
    val n = pairs.length.toLong
    val diag = pairs.count(p => p._1 == p._2).toLong
    val rowm = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val colm = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val peNum = rowm.keys.toSeq.intersect(colm.keys.toSeq)
      .map(k => rowm(k) * colm(k)).sum
    def fdiv(a: Long, b: Long): Long = (a + 1000000L * b) / b - 1000000L
    val want = (n, 1000000L * diag / n, 1000000L * peNum / (n * n),
      fdiv(1000000L * (n * diag - peNum), n * n - peNum))
    val got = run("q121_cohens_kappa").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(got == want, s"kappa mismatch: got $got want $want")
    assert(got._4 <= 1000000L && got._4 >= -1000000L)
    // the two length raters are genuinely correlated on this fixture:
    // agreement must beat chance (kappa > 0), else the differential is vacuous
    assert(got._4 > 0L, s"kappa unexpectedly non-positive: ${got._4}")
  }
}
