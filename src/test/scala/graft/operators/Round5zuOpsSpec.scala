package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 forty-seventh wave (d13 MinHash
  * accuracy audit, s27 embedding dim-variance audit, q149 rolling
  * correlation).
  */
class Round5zuOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("d13: per-pair true Jaccard equals a scalar shingle replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] =
      t.split(" ", -1).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val cand = run("d02_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = cand.map { case (a, b, est) =>
      val (sa, sb) = (shingles(docs(a)), shingles(docs(b)))
      val common = (sa & sb).size.toLong
      val tru = common * 1000000L / (sa.size + sb.size - common)
      val estM = (est * 1000000L).toLong
      (a, b, estM, tru, (estM - tru).abs)
    }.sortBy(r => (r._1, r._2))
    val got = run("d13_minhash_accuracy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"d13 mismatch: got ${got.take(3)} want ${want.take(3)}")
    // candidates from a 4x4 LSH at this fixture are genuinely similar:
    // the sketch should usually be within 25 points of truth
    assert(got.nonEmpty && got.count(_._5 <= 250000) * 2 >= got.length,
      s"estimator wildly off: ${got.map(_._5).sorted.reverse.take(3)}")
  }

  test("s27: dimension moments equal a scalar floor-quantized replay") {
    val rows = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = rows.head.length
    val scored = (0 until dims).map { p =>
      val q = rows.map(r => math.floor(r(p).toDouble * 1000000).toLong)
      val n = q.length.toLong
      val sq = q.sum
      val sqq = q.map(x => BigInt(x) * x).sum
      val mean = (sq + 10000000L * n) / n - 10000000L
      val varM = ((BigInt(n) * sqq - BigInt(sq) * sq) / (BigInt(n) * n)).toLong
      (p, n, mean, varM)
    }
    val ranks = scored.sortBy(r => (-r._4, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val want = scored.map(r => (r._1, r._2, r._3, r._4, ranks(r._1)))
    val got = run("s27_dim_variance_audit").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"s27 mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.map(_._5).sorted == (1L to dims).toSeq)
  }

  test("q149: rolling correlation equals a scalar 24h-window replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("unix_micros(ts)", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val us0 = ev.map(_._1).min
    val maxB = ev.map(e => (e._1 - us0) / 3600000000L).max.toInt
    val x = Array.fill(maxB + 1)(0L); val y = Array.fill(maxB + 1)(0L)
    ev.foreach { case (us, t) =>
      val b = ((us - us0) / 3600000000L).toInt
      if (t == "view") x(b) += 1
      if (t == "purchase") y(b) += 1
    }
    val present = ev.map(e => ((e._1 - us0) / 3600000000L).toInt).distinct.sorted
    val want = present.map { b =>
      val lo = math.max(0, b - 23)
      val w = (b + 1).min(24).toLong
      val (xs, ys) = ((lo to b).map(x(_)), (lo to b).map(y(_)))
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(v => v * v).sum
      val syy = ys.map(v => v * v).sum
      val sxy = xs.zip(ys).map { case (a2, b2) => a2 * b2 }.sum
      val (dx, dy) = (w * sxx - sx * sx, w * syy - sy * sy)
      val r = if (dx > 0 && dy > 0)
        Some(BigDecimal((w * sxy - sx * sy).toDouble / math.sqrt(dx.toDouble * dy.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
      (b.toLong, w, sx, sy, r)
    }
    val got = run("q149_rolling_corr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got.length == want.length, s"${got.length} != ${want.length}")
    got.zip(want).foreach { case (g, w2) =>
      assert(g._1 == w2._1 && g._2 == w2._2 && g._3 == w2._3 && g._4 == w2._4, s"$g != $w2")
      (g._5, w2._5) match {
        case (Some(a), Some(b2)) => assert(math.abs(a - b2) < 2e-6, s"hour ${g._1}: $a vs $b2")
        case (a, b2) => assert(a == b2, s"hour ${g._1}: $a vs $b2")
      }
    }
    assert(got.exists(_._5.isDefined))
  }
}
