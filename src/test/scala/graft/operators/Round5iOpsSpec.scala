package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 ninth wave (s16 Mann-Whitney AUC, g09
  * kNN-graph link prediction, t25 RAKE keywords). s16's rank-based AUC
  * is checked against the O(P*N) pair-counting definition — a genuinely
  * different algorithm for the same statistic — g09 and t25 against
  * scalar reimplementations.
  */
class Round5iOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  test("s16: rank-based AUC equals the pair-counting definition per label") {
    // reconstruct the per-(label, vector) cosine scores exactly as the
    // query does: exact-decimal centroids, sequential-fold dot products
    val rows = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val cents = rows.groupBy(_._2).view.mapValues { vs =>
      val dim = vs.head._3.length
      Array.tabulate(dim) { i =>
        val s = vs.map(v => BigDecimal(v._3(i)).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
        s.toDouble / vs.length
      }
    }.toMap
    val want = cents.toSeq.sortBy(_._1).map { case (cl, cv) =>
      val cn = math.sqrt(dot(cv, cv))
      val scored = rows.map { case (id, lb, v) =>
        (id, lb, round6(dot(v, cv) / (math.sqrt(dot(v, v)) * cn)))
      }
      val pos = scored.filter(_._2 == cl).map(_._3)
      val neg = scored.filter(_._2 != cl).map(_._3)
      // pair counting: concordant + half ties, over every (pos, neg) pair
      val num2 = (for (p <- pos; n <- neg) yield {
        if (p > n) 2L else if (p == n) 1L else 0L
      }).sum
      val auc = round6(num2.toDouble / (2.0 * pos.length * neg.length))
      (cl, pos.length.toLong, neg.length.toLong, auc)
    }
    val got = run("s16_auc_eval").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want, s"auc mismatch: got ${got.take(3)} want ${want.take(3)}")
    // centroid-cosine genuinely separates labels in the fixture
    assert(got.count(_._4 > 0.5) >= 8, s"AUC barely above chance everywhere: $got")
  }

  test("g09: candidates equal a scalar wedge sweep; no candidate is an edge") {
    // scalar replay of the BLOCKED kNN builder (round-6 contract)
    val und = KnnGraphFixture.und(spark, sf0001)
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val cands = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    adj.foreach { case (w, ns) =>
      val sorted = ns.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
        val (u, v) = (sorted(i), sorted(j))
        if (!und.contains((u, v))) {
          val (cn, ra) = cands.getOrElse((u, v), (0L, 0L))
          cands((u, v)) = (cn + 1, ra + 1000000L / deg(w))
        }
      }
    }
    val want = cands.toSeq
      .map { case ((u, v), (cn, ra)) => (u, v, cn, ra) }
      .sortBy { case (u, v, cn, ra) => (-ra, -cn, u, v) }
      .take(20).zipWithIndex
      .map { case ((u, v, cn, ra), i) => (i + 1, u, v, cn, ra) }
    val got = run("g09_link_prediction").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"linkpred mismatch: got ${got.take(5)} want ${want.take(5)}")
    assert(got.nonEmpty, "kNN graph produced no open wedges — vacuous")
    got.foreach { case (_, u, v, _, _) =>
      assert(!und.contains((u, v)), s"predicted pair ($u,$v) is already an edge")
    }
  }

  test("t25: phrase scores equal a scalar RAKE; phrases reassemble stopword-free runs") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stop = Set("the", "a")
    // phrase segmentation per doc
    val phrases: Seq[(Long, Int, Seq[String])] = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Seq[String])]
      var pid = 0
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      var curPid = 0
      toks.foreach { t =>
        if (stop(t)) {
          if (cur.nonEmpty) { out += ((id, curPid, cur.toSeq)); cur.clear() }
          pid += 1
        } else {
          if (cur.isEmpty) curPid = pid
          cur += t
        }
      }
      if (cur.nonEmpty) out += ((id, curPid, cur.toSeq))
      out
    }
    val freq = phrases.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = phrases.flatMap(p => p._3.map(w => w -> p._3.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val score6 = freq.keys.map(w => w -> (1000000L * deg(w)) / freq(w)).toMap
    val want = phrases.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (id, ps) =>
      ps.map { case (_, _, ws) => (id, ws.mkString(" "), ws.length.toLong, ws.map(score6).sum) }
        .sortBy { case (_, phrase, _, s) => (-s, phrase) }
        .take(3).zipWithIndex
        .map { case ((i2, phrase, nw, s), i) => (i2, i + 1, phrase, nw, s) }
    }
    val got = run("t25_rake_keywords").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"rake mismatch: got ${got.take(3)} want ${want.take(3)}")
    // no stopword survives inside any extracted phrase
    got.foreach { case (id, _, phrase, _, _) =>
      assert(phrase.split(" ").forall(w => !stop(w)), s"doc $id phrase '$phrase' contains a stopword")
    }
  }
}
