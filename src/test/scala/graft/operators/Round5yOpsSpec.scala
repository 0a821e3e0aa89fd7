package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 twenty-sixth wave (q122 Bollinger
  * bands, q123 RSI, q124 peak concurrency).
  */
class Round5yOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  /** (user_id, us, event_id, cents) ordered per user. */
  private lazy val series: Map[Long, Seq[(Long, Long, Long)]] =
    graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts)", "event_id",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(r => (r._2, r._3)).map(r => (r._2, r._3, r._4)).toSeq).toMap

  test("q122: bands and breach flags equal a scalar rolling replay; breach implies outside band") {
    val want = series.toSeq.flatMap { case (u, rs) =>
      rs.indices.filter(_ >= 7).map { i =>
        val w = rs.slice(i - 7, i + 1).map(_._3)
        val x = rs(i)._3
        val s8 = w.sum; val sq8 = w.map(c => BigInt(c) * c).sum
        val varNum = BigInt(8) * sq8 - BigInt(s8) * s8
        val mid = (2 * (1000000L * s8) + 8) / 16
        val half = math.floor(1000000.0 * math.sqrt(varNum.toDouble) / 4).toLong
        val breach = BigInt(8 * x - s8) * (8 * x - s8) > 4 * varNum
        (u, rs(i)._2, x, mid, half, breach, 8 * x - s8 > 0)
      }
    }.sortBy(r => (r._1, r._2))
    val got = run("q122_bollinger").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5), r.getBoolean(6))).toSeq
    assert(got == want, s"bollinger mismatch: got ${got.take(2)} want ${want.take(2)}")
    // the exact-integer breach test and the float band must agree up to
    // the 1-micro floor slack: breach == |x*1e6 - mid| > half (+/-1)
    got.foreach { case (_, _, x, mid, half, breach, _) =>
      val dev = math.abs(1000000L * x - mid)
      if (breach) assert(dev >= half - 1, s"breach but dev $dev < half $half")
      else assert(dev <= half + 1, s"no breach but dev $dev > half $half")
    }
    assert(got.exists(_._6) && got.exists(!_._6), "breach flag never varies")
  }

  test("q123: RSI equals a scalar 14-move window replay; bounded and anti-symmetric") {
    val want = series.toSeq.flatMap { case (u, rs) =>
      val deltas = rs.zip(rs.tail).map { case (a, b) => (b._1, b._2, b._3 - a._3) }
      deltas.indices.filter(_ >= 13).flatMap { i =>
        val w = deltas.slice(i - 13, i + 1).map(_._3)
        val up = w.map(d => math.max(d, 0L)).sum
        val down = w.map(d => math.max(-d, 0L)).sum
        if (up + down == 0) None
        else {
          val rsi = 1000000L * up / (up + down)
          Some((u, deltas(i)._2, up, down, rsi, rsi > 700000L, rsi < 300000L))
        }
      }
    }.sortBy(r => (r._1, r._2))
    val got = run("q123_rsi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5), r.getBoolean(6))).toSeq
    assert(got == want, s"rsi mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.forall(r => r._5 >= 0L && r._5 <= 1000000L))
    // up and down sum to the total absolute movement: rsi_ppm +
    // "inverse rsi" of the mirrored series = 1e6 (up to floor slack)
    got.foreach { case (_, _, up, down, rsi, _, _) =>
      val inv = 1000000L * down / (up + down)
      assert(rsi + inv >= 999999L - 1 && rsi + inv <= 1000000L, s"rsi $rsi + inv $inv")
    }
  }

  test("q124: peak concurrency equals a scalar sweep over gap sessions") {
    val sessions = series.toSeq.flatMap { case (_, rs) =>
      val uss = rs.map(_._1)
      val newFlags = uss.zipWithIndex.map { case (us, i) =>
        i == 0 || us - uss(i - 1) > 1800000000L
      }
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = uss.head
      for (i <- uss.indices) {
        if (newFlags(i) && i > 0) { bounds += ((start, uss(i - 1))); start = uss(i) }
      }
      bounds += ((start, uss.last))
      bounds.toSeq
    }
    val deltas = (sessions.map(s => (s._1, 1L)) ++ sessions.map(s => (s._2 + 1, -1L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((us, d), cnt) => (us, d, d * cnt) }
      .sortBy(r => (r._1, r._2))
    var conc = 0L; var peak = 0L; var peakUs = 0L
    deltas.foreach { case (us, _, ds) =>
      conc += ds
      if (conc > peak) { peak = conc; peakUs = us }
    }
    val got = run("q124_peak_concurrency").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(got == ((sessions.length.toLong, peak, peakUs)),
      s"concurrency mismatch: got $got want (${sessions.length}, $peak, $peakUs)")
    // sanity: peak cannot exceed the number of users (one open session
    // per user at a time by construction of per-user gap sessions)
    assert(peak <= series.size.toLong && peak >= 1L)
  }
}
