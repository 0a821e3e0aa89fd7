package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirty-seventh wave (g15 k-truss,
  * t34 tokenizer fertility, m18 silence trim).
  */
class Round5zjOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("g15: truss equals a scalar peel replay; the peel reaches its fixpoint") {
    val edges0 = graft.operators.Dedup.simhashPairs(spark, sf0001)
      .selectExpr("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def support(live: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = live.toSeq.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      live.toSeq.map { case (a, b) =>
        (a, b) -> (adj(a) & adj(b)).size.toLong
      }.toMap
    }
    val sup0 = support(edges0)
    var live = edges0
    (1 to 4).foreach { _ =>
      val sup = support(live)
      live = live.filter(e => sup(e) >= 2L)
    }
    // fixpoint: a 5th round would change nothing
    val sup5 = support(live)
    assert(live.forall(e => sup5(e) >= 2L), "peel did not converge in 4 rounds")
    val supF = support(live)
    val want = edges0.toSeq.sorted.map { case (a, b) =>
      (a, b, sup0((a, b)), live((a, b)), supF.getOrElse((a, b), 0L))
    }
    val got = run("g15_ktruss").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"truss mismatch: got ${got.take(3)} want ${want.take(3)}")
    // the truss is strictly stronger than trivial: something survives AND
    // something is peeled (otherwise the operator is vacuous here)
    assert(got.exists(_._4) && got.exists(!_._4),
      s"degenerate truss: ${got.count(_._4)}/${got.size} survive")
  }

  test("t34: fertility equals a scalar re-aggregation of t19's encode map") {
    val enc = run("t19_bpe_encode").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "lang", "split(text, ' ')").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getSeq[String](2).filter(_.nonEmpty)))
    val want = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (lang, xs) =>
      val nWords = xs.map(x => enc(x._1)._1).sum
      val nBytes = xs.map(_._3.map(_.length.toLong).sum).sum
      val nToks = xs.map(x => enc(x._1)._2).sum
      (lang, nWords, nBytes, nToks, 1000000L * nToks / nWords, 1000000L * nBytes / nToks)
    }
    val got = run("t34_tokenizer_fertility").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"fertility mismatch: got ${got.take(2)} want ${want.take(2)}")
    // every word yields at least one token (so fertility >= 1); bytes per
    // token can dip below 1.0 because the end-of-word symbol is a token
    // with zero text bytes — only positivity is guaranteed
    assert(got.forall(r => r._5 >= 1000000L), "fewer tokens than words?")
    assert(got.forall(r => r._6 > 0L))
  }

  test("m18: trim indices equal a scalar replay; trims bound the track") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val want = docs.flatMap { case (id, bytes) =>
      val n = bytes.length / 2
      if (n == 0) None
      else {
        val nw = (n + 63) / 64
        val silent = (0 until nw).map { w =>
          val lo = w * 64; val hi = math.min(lo + 64, n)
          var ss = 0L
          (lo until hi).foreach { k =>
            val raw = (bytes(2 * k) & 0xff) | ((bytes(2 * k + 1) & 0xff) << 8)
            val sg = if (raw >= 32768) raw - 65536 else raw
            ss += sg.toLong * sg
          }
          ss < 1000L * (hi - lo)
        }
        val voiced = silent.zipWithIndex.filter(!_._1).map(_._2)
        if (voiced.isEmpty)
          Some((id, nw.toLong, -1, -1, nw.toLong, 0L, true))
        else
          Some((id, nw.toLong, voiced.head, voiced.last,
            voiced.head.toLong, (nw - 1 - voiced.last).toLong, false))
      }
    }.sortBy(_._1).toSeq
    val got = run("m18_silence_trim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(got == want, s"trim mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.forall(r => r._7 || (r._3 >= 0 && r._3 <= r._4 && r._4 < r._2)))
  }
}
