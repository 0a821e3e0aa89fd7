package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fifty-seventh wave (s28 hubness audit,
  * q159 Little's law).
  */
class Round6eOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("s28: k-occurrence histogram is consistent and skewness exact") {
    val got = run("s28_hubness_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val n = got.map(_._2).sum
    // 500 vectors, 3 out-edges each: occurrence mass conserves exactly
    assert(n == 500L, s"vector count $n")
    assert(got.map(r => r._1 * r._2).sum == 3 * 500L, "total k-occurrence != 3n")
    // replay the skewness from the histogram itself
    val so = got.map(r => r._1 * r._2).sum
    val soo = got.map(r => BigInt(r._1) * r._1 * r._2).sum
    val sooo = got.map(r => BigInt(r._1) * r._1 * r._1 * r._2).sum
    val m2 = BigInt(n) * soo - BigInt(so) * so
    val m3 = BigInt(n) * n * sooo - 3 * BigInt(n) * so * soo + 2 * BigInt(so) * so * so
    val want = BigDecimal(m3.toDouble / (m2.toDouble * math.sqrt(m2.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach(r => assert(r._3.exists(v => math.abs(v - want) < 2e-6), s"$r vs $want"))
    // hubness exists: someone is never listed or someone is over-listed
    assert(got.exists(r => r._1 == 0L) || got.exists(r => r._1 > 6L))
  }

  test("q159: queue card equals a scalar hourly replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("unix_micros(ts)", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val us0 = ev.map(_._1).min
    val byHour = ev.groupBy(e => (e._1 - us0) / 3600000000L).toSeq.sortBy(_._1)
      .map { case (b, g) =>
        (b, g.count(_._2 == "view").toLong, g.count(_._2 == "purchase").toLong)
      }
    var depth = 0L; var depthSum = 0L
    byHour.foreach { case (_, a, c) => depth += a - c; depthSum += depth }
    val nObs = byHour.length.toLong
    val ta = byHour.map(_._2).sum; val tc = byHour.map(_._3).sum
    def shDiv(a: Long, b: Long) = (a * 1000 + 1000000000L * b) / b - 1000000000L
    val want = (nObs, ta, tc, depth, shDiv(depthSum, nObs), ta * 1000 / nObs,
      shDiv(depthSum, ta))
    val got = run("q159_littles_law").collect().head
    val g = (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5), got.getLong(6))
    assert(g == want, s"littles mismatch: $g vs $want")
    // Little's law self-consistency at milli precision: L ≈ λ·W
    val l = g._5 / 1000.0; val lam = g._6 / 1000.0; val w = g._7 / 1000.0
    assert(math.abs(l - lam * w) <= math.abs(l) * 0.01 + 0.01, s"L=$l λW=${lam * w}")
  }
}
