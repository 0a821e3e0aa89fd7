package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 twenty-ninth wave (st20 streaming
  * one-step forecaster's batch twin, m15 loudness normalization,
  * p18 per-source dataset card).
  */
class Round5zbOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("st20 batch fold: per-event forecasts equal a scalar walk; errors re-derive q125") {
    val rows = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts)", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val evs = rs.sortBy(r => (r._2, r._3))
      if (evs.length < 2) Nil
      else {
        var l = evs.head._4; var b = 0.0
        evs.tail.zipWithIndex.map { case (e, i) =>
          val f = l + b
          val out = (u, e._3, i + 2, f, e._4 - f)
          val nl = 0.5 * e._4 + 0.5 * (l + b)
          b = 0.5 * (nl - l) + 0.5 * b
          l = nl
          out
        }
      }
    }.sortBy(r => (r._1, r._3))
    val got = run("st20_stream_forecast").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(got == want, s"forecast walk mismatch: got ${got.take(2)} want ${want.take(2)}")
    // per-user mean of |err| must equal q125's mae exactly (same fold)
    val mae = got.groupBy(_._1).view
      .mapValues(xs => xs.map(x => math.abs(x._5)).foldLeft(0.0)(_ + _) / xs.length).toMap
    val q125 = run("q125_forecast_backtest").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(mae.keySet == q125.keySet)
    assert(mae.forall { case (u, m) => m == q125(u) },
      "st20 |err| fold disagrees with q125 sae fold")
  }

  test("m15: loudness stats equal a scalar PCM replay; clip flag is integer-exact") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val want = docs.flatMap { case (id, bytes) =>
      val n = bytes.length / 2
      if (n == 0) None
      else {
        var sumSq = 0L; var peak = 0L
        (0 until n).foreach { k =>
          val raw = (bytes(2 * k) & 0xff) | ((bytes(2 * k + 1) & 0xff) << 8)
          val sgn = if (raw >= 32768) raw - 65536 else raw
          sumSq += sgn.toLong * sgn
          peak = math.max(peak, math.abs(sgn.toLong))
        }
        if (sumSq == 0L) None
        else {
          val loud = 10.0 * math.log10(sumSq.toDouble / n.toDouble / 1073741824.0)
          val gain = -20.0 - loud
          val head = 20.0 * math.log10(peak.toDouble / 32767.0)
          val lu = math.floor(1000000 * loud).toLong
          val gu = math.floor(1000000 * gain).toLong
          val hu = math.floor(1000000 * head).toLong
          Some((id, n, sumSq, peak, lu, gu, hu, gu > -hu))
        }
      }
    }.sortBy(_._1).toSeq
    val got = run("m15_loudness_gain").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toSeq
    assert(got == want, s"loudness mismatch: got ${got.take(2)} want ${want.take(2)}")
    // dBFS loudness of 16-bit PCM is never positive; headroom <= 0
    assert(got.forall(r => r._5 <= 0L && r._7 <= 0L))
  }

  test("p18: dataset card equals a scalar replay; dup and median are exact") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "source", "lang", "n_chars",
        "CAST(size(split(text, ' ')) AS BIGINT)", "sha2(text, 256)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    val hashCounts = docs.groupBy(_._6).view.mapValues(_.size).toMap
    val want = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, xs) =>
      val nDocs = xs.length.toLong
      val topLang = xs.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1
      val dup = xs.count(x => hashCounts(x._6) > 1).toLong
      val sorted = xs.sortBy(x => (x._4, x._1))
      val med = sorted(((nDocs + 1) / 2).toInt - 1)._4
      (src, nDocs, xs.map(_._4).sum, xs.map(_._5).sum,
        xs.map(_._3).distinct.length.toLong, topLang, dup,
        1000000L * dup / nDocs, med)
    }
    val got = run("p18_dataset_card").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSeq
    assert(got == want, s"card mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.forall(r => r._8 >= 0L && r._8 <= 1000000L))
  }
}
