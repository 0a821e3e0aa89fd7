package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 twenty-seventh wave (t30 Burrows'
  * Delta, m14 entropy segmentation, q125 forecast backtest).
  */
class Round5zOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("t30: delta equals a scalar z-score replay; metric properties hold") {
    val toks = graft.Tables.documents(spark, sf0001)
      .selectExpr("lang", "split(text, ' ')").collect()
      .flatMap(r => r.getSeq[String](1).filter(_.nonEmpty).map(t => (r.getString(0), t)))
    val top = toks.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(20).map(_._1)
    val ltot = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val langs = ltot.keys.toSeq.sorted
    val ppm = (for { l <- langs; t <- top } yield {
      val c = toks.count(x => x._1 == l && x._2 == t).toLong
      (l, t) -> 1000000L * c / ltot(l)
    }).toMap
    val markers = top.filter { t =>
      val vs = langs.map(l => ppm((l, t)))
      val n = vs.length.toLong; val s = vs.sum
      val sq = vs.map(v => BigInt(v) * v).sum
      BigInt(n) * sq > BigInt(s) * s
    }
    def z(l: String, t: String): Double = {
      val vs = langs.map(x => ppm((x, t)))
      val n = vs.length.toLong; val s = vs.sum
      val sq = vs.map(v => BigInt(v) * v).sum
      val sd = math.sqrt((BigInt(n) * sq - BigInt(s) * s).toDouble) / n
      (ppm((l, t)).toDouble - s.toDouble / n) / sd
    }
    val want = (for {
      i <- langs.indices; j <- (i + 1) until langs.length
    } yield {
      val (a, b) = (langs(i), langs(j))
      val diffs = markers.sorted.map(t => math.abs(z(a, t) - z(b, t)))
      val sum = diffs.foldLeft(0.0)(_ + _)
      (a, b, markers.length.toLong,
        math.floor(1000000.0 * sum / markers.length).toLong)
    }).toSeq
    val got = run("t30_burrows_delta").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"delta mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.forall(_._4 >= 0L))
    // stylometry sanity: at least one pair differs from another (the
    // languages are genuinely distinguishable on marker frequencies)
    assert(got.map(_._4).distinct.length > 1)
  }

  test("m14: window entropy equals a scalar histogram replay; bounds [0, ln16]") {
    val docs = graft.Tables.documents(spark, sf0001)
      .filter("length(text) >= 64").selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, t) =>
      (0 until t.length / 64).map { w =>
        val counts = t.slice(w * 64, w * 64 + 64).map(_.toInt / 16)
          .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        val h = counts.map { case (_, c) =>
          c * (math.log(64.0) - math.log(c.toDouble))
        }.foldLeft(0.0)(_ + _) / 64
        val hMicro = math.floor(1000000.0 * h).toLong
        (id, w, counts.length.toLong, hMicro, hMicro > 2000000L)
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = run("m14_entropy_segments").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .map(r => (r._1, r._2: Int, r._3, r._4, r._5)).toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) == want,
      s"entropy mismatch: got ${got.take(3)} want ${want.take(3)}")
    // 0 <= H <= ln(16) in micro-nats (floor slack)
    assert(got.forall(r => r._4 >= 0L && r._4 <= 2772589L))
    // natural-language byte windows should NOT look uniformly random:
    // some windows must sit well under the ln16 ceiling
    assert(got.exists(_._4 < 2500000L))
  }

  test("q125: backtest equals a scalar walk-forward replay; MAE dominates |bias|") {
    val rows = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts)", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val vals = rs.sortBy(r => (r._2, r._3)).map(_._4)
      if (vals.length < 2) None
      else {
        var l = vals.head; var b = 0.0; var sae = 0.0; var sb = 0.0
        vals.tail.foreach { x =>
          val f = l + b
          sae += math.abs(x - f); sb += (x - f)
          val nl = 0.5 * x + 0.5 * (l + b)
          b = 0.5 * (nl - l) + 0.5 * b
          l = nl
        }
        val m = (vals.length - 1).toLong
        Some((u, vals.length.toLong, m, sae / m, sb / m))
      }
    }.sortBy(_._1)
    val got = run("q125_forecast_backtest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == want, s"backtest mismatch: got ${got.take(2)} want ${want.take(2)}")
    // |mean signed error| can never exceed mean absolute error
    assert(got.forall(r => math.abs(r._5) <= r._4 + 1e-12))
    assert(got.forall(r => r._4 >= 0.0))
  }
}
