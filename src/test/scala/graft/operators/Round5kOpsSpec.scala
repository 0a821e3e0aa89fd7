package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 twelfth wave (q107 changepoint, t26
  * vocabulary coverage, s17 IVF probe-recall curve). s17 is replayed as
  * a complete scalar IVF (centroids, assignment, probing, ranking) so
  * the whole curve — not just its shape — is independently derived.
  */
class Round5kOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  test("q107: split equals the scalar argmax of the two-segment fit; gain >= 0") {
    val events = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = events.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val n = xs.length
      if (n < 2) None
      else {
        val st = xs.map(BigInt(_)).sum
        var s1 = BigInt(0)
        val scored = (1 until n).map { k =>
          s1 += xs(k - 1)
          val s2 = st - s1
          val q6 = (s1 * s1 * (n - k) + s2 * s2 * k) * 1000000 / (BigInt(k) * (n - k))
          (k, q6, s1)
        }
        val base6 = st * st * 1000000 / n
        val (kStar, q6Star, s1Star) = scored.maxBy { case (k, q6, _) => (q6, -k) }
        def rhu(a: BigInt, b: BigInt): Long = ((2 * a * 10000 + b) / (2 * b)).toLong
        Some((u, n.toLong, kStar.toLong, (q6Star - base6).toLong,
          rhu(s1Star, BigInt(kStar)).toDouble / 1e6,
          rhu(st - s1Star, BigInt(n - kStar)).toDouble / 1e6))
      }
    }
    val got = run("q107_changepoint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toSeq
    assert(got == want, s"changepoint mismatch: got ${got.take(3)} want ${want.take(3)}")
    got.foreach { case (u, _, _, g, _, _) => assert(g >= 0, s"user $u negative gain $g") }
    // the fixture genuinely shifts somewhere: some user has positive gain
    assert(got.exists(_._4 > 0), "zero gain everywhere — vacuous")
  }

  test("t26: coverage curve equals a scalar frequency walk and is concave-ish") {
    val texts = graft.Tables.documents(spark, sf0001)
      .selectExpr("text").collect().map(_.getString(0))
    val freq = texts.flatMap(_.split(" ", -1)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val ranked = freq.toSeq.sortBy { case (t, f) => (-f, t) }
    val total = freq.values.sum
    val want = Seq(1, 2, 4, 8, 16, 32).map { k =>
      val top = ranked.take(k)
      val cum = top.map(_._2).sum
      (k, top.length.toLong, cum, 1000000L * cum / total)
    }
    val got = run("t26_vocab_coverage").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"coverage mismatch: got $got want $want")
    // nondecreasing, and the marginal gain of doubling K shrinks
    got.map(_._4).sliding(2).foreach {
      case Seq(a, b) => assert(b >= a)
      case _ => ()
    }
  }

  test("s17: curve equals a scalar IVF replay; recall is monotone in nprobe") {
    val rows = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val cents = rows.groupBy(_._2).view.mapValues { vs =>
      Array.tabulate(vs.head._3.length) { i =>
        vs.map(v => BigDecimal(v._3(i)).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
          .toDouble / vs.length
      }
    }.toMap
    def l2r6(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      round6(acc)
    }
    val nrm = rows.map { case (id, _, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val bucket = rows.map { case (id, _, v) =>
      id -> cents.toSeq.map { case (cl, cv) => (l2r6(v, cv), cl) }.min._2
    }.toMap
    val queries = rows.filter(_._1 % 50 == 0)
    val exact = queries.map { case (qid, _, qv) =>
      qid -> rows.filter(_._1 != qid)
        .map { case (id, _, v) => (id, round6(dot(qv, v) / (nrm(qid) * nrm(id)))) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    }.toMap
    val want = (1 to 4).map { p =>
      val hits = queries.map { case (qid, _, qv) =>
        val probed = cents.toSeq.map { case (cl, cv) => (l2r6(qv, cv), cl) }
          .sorted.take(p).map(_._2).toSet
        val approx = rows.filter { case (id, _, _) => id != qid && probed(bucket(id)) }
          .map { case (id, _, v) => (id, round6(dot(qv, v) / (nrm(qid) * nrm(id)))) }
          .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
        (approx & exact(qid)).size.toLong
      }.sum
      (p, queries.length.toLong, round6(hits.toDouble / (queries.length * 5.0)))
    }
    val got = run("s17_ivf_probe_curve").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, s"probe curve mismatch: got $got want $want")
    got.map(_._3).sliding(2).foreach {
      case Seq(a, b) => assert(b >= a, s"recall decreased with more probes: $a -> $b")
      case _ => ()
    }
    assert(got.head._3 < got.last._3 || got.head._3 == 1.0,
      "probing more buckets never helped — suspicious")
  }
}
