package graft.operators

import graft.SparkSpec

/** Differentials for the round-6 second wave (q168 Markov removal-effect
  * attribution, p26 Efraimidis-Spirakis weighted sampling): scalar
  * replays at sf0.001 plus structural properties.
  */
class Round6jOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q168: removal effects equal a scalar replay of journeys + 8 exact sweeps") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    // journeys: per user ordered by (us, event_id), cut at first purchase
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val cut = ordered.indexOf("purchase") match {
        case -1 => ordered
        case i  => ordered.take(i + 1)
      }
      val states = cut.map(t => if (t == "purchase") "CONV" else t)
      ("START" +: states).sliding(2).foreach {
        case Seq(a, b) => trans((a, b)) += 1L
        case _ =>
      }
      if (states.last != "CONV") trans((states.last, "END")) += 1L
    }
    def absorb(t: Map[(String, String), Long]): Long = {
      val rowN = t.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val states = rowN.keys.toSeq
      var v = Map("CONV" -> 1000000L, "END" -> 0L).withDefaultValue(0L)
      for (_ <- 1 to 8) {
        val nv = states.map { st =>
          st -> t.collect { case ((f, to), n) if f == st => n * v(to) }.sum / rowN(st)
        }.toMap
        v = (nv + ("CONV" -> 1000000L) + ("END" -> 0L)).withDefaultValue(0L)
      }
      v("START")
    }
    val base = absorb(trans.toMap)
    val channels = trans.keys.map(_._1).filter(_ != "START").toSeq.distinct.sorted
    val want = channels.map { c =>
      val rt = trans.toSeq.filter(_._1._1 != c)
        .map { case ((f, to), n) => ((f, if (to == c) "END" else to), n) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val r = absorb(rt)
      (c, base, r, if (base == 0L) 0L else (base - r) * 1000000L / base)
    }
    val got = run("q168_markov_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"q168 mismatch: got $got want $want")
    // removing a channel can only LOSE conversion mass at a fixed horizon
    got.foreach { case (_, b, r, eff) =>
      assert(r <= b && eff >= 0L && eff <= 1000000L)
    }
    assert(got.exists(_._4 > 0L), "no channel carries any removal effect?")
  }

  test("d18: blocking card equals a scalar all-pairs replay of the j>=0.5 truth") {
    val sh = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "lang", "split(text, ' ')").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toArray))
      .filter(_._3.length >= 3)
      .map { case (id, lang, toks) =>
        (id, lang, (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet)
      }
    // ALL same-lang pairs scored exactly — independent of the product's
    // shared-shingle blocking (which must be lossless for j >= 0.5)
    val truth = (for {
      a <- sh; b <- sh
      if a._1 < b._1 && a._2 == b._2
      inter = (a._3 & b._3).size
      if 2 * inter >= a._3.size + b._3.size - inter
    } yield (a._1, b._1)).toSet
    val cands = Dedup.minhashPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = truth.count(cands.contains).toLong
    val n = graft.Tables.documents(spark, sf0001).count()
    val all = n * (n - 1) / 2
    val want = (n, all, cands.size.toLong, truth.size.toLong, hit,
      if (truth.isEmpty) 1000000L else hit * 1000000L / truth.size,
      (all - cands.size) * 1000000L / all)
    val got = run("d18_blocking_quality").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).head
    assert(got == want, s"d18 mismatch: got $got want $want")
    assert(got._4 > 0L, "fixture has no j>=0.5 pairs — the card is vacuous")
    // the 4x4-band S-curve catches >= ~23% at the j=0.5 edge; a measured
    // completeness of zero or a full miss of the reduction goal is a bug
    assert(got._6 > 0L && got._6 <= 1000000L)
    assert(got._7 > 900000L, "blocking explores >10% of the all-pairs space?!")
  }

  test("t40: per-source keyness equals a scalar G2 replay; keyness flags match raw ratios") {
    val tok = graft.Tables.documents(spark, sf0001)
      .selectExpr("source", "explode(split(text, ' ')) AS token").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val nn = tok.size.toLong
    val ra = tok.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ab = tok.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val a = tok.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = a.keys.toSeq.map { case (src, t) =>
      val ai = a((src, t)); val bi = ab(t) - ai
      val ta = if (ai == 0) 0.0
               else ai.toDouble * math.log(ai.toDouble * nn.toDouble / (ra(src).toDouble * ab(t).toDouble))
      val tb = if (bi == 0) 0.0
               else bi.toDouble * math.log(bi.toDouble * nn.toDouble / ((nn - ra(src)).toDouble * ab(t).toDouble))
      (src, t, ai, bi, halfUp(2000000.0 * (ta + tb)), ai * (nn - ra(src)) > bi * ra(src))
    }.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(x => (-x._5, x._2)).take(5).zipWithIndex
        .map { case ((s2, t, ai, bi, g, o), i) => (s2, t, ai, bi, g, o, i + 1) }
    }.sortBy(x => (x._1, x._7))
    val got = run("t40_llr_keyness").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getInt(6))).toSeq
    assert(got == want, s"t40 mismatch: got ${got.take(3)} want ${want.take(3)}")
    // a top-keyness token must have nonnegative G2 and a well-defined flag
    got.foreach { case (_, _, ai, bi, g, _, _) =>
      assert(g >= 0L || ai == 0L || bi == 0L)
    }
  }

  test("m23: frame-pair SSIM equals a scalar replay; identical frames score exactly 1.0") {
    val texts = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = texts.flatMap { case (id, t) =>
      val nf = t.length / 64
      if (nf < 2) Seq.empty
      else (0 until nf - 1).map { f =>
        val x = (0 until 64).map(i => t.charAt(f * 64 + i).toInt.toDouble)
        val y = (0 until 64).map(i => t.charAt((f + 1) * 64 + i).toInt.toDouble)
        val (mx, my) = (x.sum / 64.0, y.sum / 64.0)
        val vx = x.map(v => v * v).sum / 64.0 - mx * mx
        val vy = y.map(v => v * v).sum / 64.0 - my * my
        val cov = x.zip(y).map { case (a, b) => a * b }.sum / 64.0 - mx * my
        val ssim = ((2 * mx * my + 6.5025) * (2 * cov + 58.5225)) /
          ((mx * mx + my * my + 6.5025) * (vx + vy + 58.5225))
        val micro = math.floor(1000000 * ssim).toLong
        (id, f, micro, micro < 300000L)
      }
    }.sortBy(x => (x._1, x._2))
    val got = run("m23_ssim_frames").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == want, s"m23 mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.nonEmpty && got.exists(!_._4), "every frame pair a cut?")
    // SSIM self-test: a frame against itself is exactly 1.0 (floor(1e6*1.0))
    val t0 = texts.find(_._2.length >= 64).get._2
    val x = (0 until 64).map(i => t0.charAt(i).toInt.toDouble)
    val mx = x.sum / 64.0
    val vx = x.map(v => v * v).sum / 64.0 - mx * mx
    val self = ((2 * mx * mx + 6.5025) * (2 * vx + 58.5225)) /
      ((mx * mx + mx * mx + 6.5025) * (vx + vx + 58.5225))
    assert(math.floor(1000000 * self).toLong == 1000000L)
  }

  test("p26: weighted sample equals a scalar replay; keys are sorted and ranks dense") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = docs.map { case (id, w) =>
      val u = java.lang.Long.parseLong(md5hex(id.toString).take(13), 16) /
        4503599627370496.0
      val key = math.floor(1e9 * math.log(u) / w.toDouble).toLong
      (id, w, key)
    }.sortBy(x => (-x._3, x._1)).take(100)
      .zipWithIndex.map { case ((id, w, k), i) => (id, w, k, i + 1) }
    val got = run("p26_weighted_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == want, s"p26 mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.map(_._4) == (1 to 100), "ranks not dense 1..100")
    assert(got.map(_._3) == got.map(_._3).sorted.reverse, "keys not non-increasing")
    // E-S property on this draw: the sample's mean weight should exceed the
    // corpus mean (heavier docs are proportionally more likely in-sample)
    val corpusMean = docs.map(_._2).sum.toDouble / docs.size
    val sampleMean = got.map(_._2).sum.toDouble / got.size
    assert(sampleMean > corpusMean * 0.9,
      s"sample mean weight $sampleMean improbably below corpus mean $corpusMean")
  }
}
