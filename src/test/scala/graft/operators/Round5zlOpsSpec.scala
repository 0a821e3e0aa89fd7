package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirty-ninth wave (s25 hard-negative
  * mining, q138 EMD drift, g16 mutual-kNN components).
  */
class Round5zlOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def vecs = graft.Tables.embeddings(spark, sf0001)
    .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE))")
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("s25: triplets equal a scalar replay; positives beat negatives in general") {
    val vs = vecs
    val norms = vs.map(v => v._1 -> math.sqrt(dot(v._3, v._3))).toMap
    val want = vs.filter(_._1 % 50 == 0).sortBy(_._1).map { case (qid, ql, qv) =>
      val scored = vs.filter(_._1 != qid).map { v =>
        (math.round(1000000 * r6(dot(qv, v._3) / (norms(qid) * norms(v._1)))), v._1, v._2)
      }
      val pos = scored.filter(_._3 == ql).minBy(x => (-x._1, x._2))
      val neg = scored.filter(_._3 != ql).minBy(x => (-x._1, x._2))
      (qid, ql, pos._2, pos._1, neg._2, neg._1, pos._1 - neg._1, pos._1 - neg._1 <= 0L)
    }.toSeq
    val got = run("s25_hard_negative_mining").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toSeq
    assert(got == want, s"triplet mismatch: got ${got.take(2)} want ${want.take(2)}")
    // labels carry signal: at least one anchor has a positive margin
    assert(got.exists(_._7 > 0L))
  }

  test("q138: EMD equals a scalar replay; EMD sees shift that PSI bins hide") {
    val base = graft.Tables.orders(spark, sf0001)
      .selectExpr("year(o_orderdate)",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .filter(r => r._1 == 1995 || r._1 == 1996)
    val lo = base.map(_._2).min
    val hi = base.map(_._2).max
    def bin(c: Long) = math.min(32L * (c - lo) / (hi - lo + 1), 31L).toInt
    val ca = new Array[Long](32); val cb = new Array[Long](32)
    base.foreach { case (yr, c) =>
      if (yr == 1995) ca(bin(c)) += 1 else cb(bin(c)) += 1
    }
    val na = ca.sum; val nb = cb.sum
    val binsUsed = (0 until 32).count(b => ca(b) + cb(b) > 0).toLong
    var cumA = 0L; var cumB = 0L; var cross = 0L
    (0 until 32).foreach { b =>
      if (ca(b) + cb(b) > 0) {
        cumA += ca(b); cumB += cb(b)
        cross += math.abs(cumA * nb - cumB * na)
      }
    }
    val emd = math.floor(1000000.0 * cross.toDouble / (na.toDouble * nb.toDouble * 32.0)).toLong
    val got = run("q138_emd_drift").collect().head
    val gotT = (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
    assert(gotT == ((na, nb, binsUsed, emd)), s"emd mismatch: got $gotT want ${(na, nb, binsUsed, emd)}")
    assert(gotT._4 >= 0L && gotT._4 <= 1000000L)
  }

  test("g16: mutual graph equals a scalar replay; mutuality prunes one-way links") {
    val vs = vecs
    // since round 6 the product builds the directed lists with the BLOCKED
    // builder (multi-probe LSH + exact rerank) — replay that, not all-pairs
    val knn = KnnGraphFixture.knnDirected(spark, sf0001)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .withDefaultValue(Set.empty[Long])
    val mutual = (for {
      (q, nbs) <- knn.toSeq; nb <- nbs if q < nb && knn(nb)(q)
    } yield (q, nb)).toSet
    val parent = scala.collection.mutable.Map(vs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    mutual.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val mdeg = mutual.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val comp = vs.map(v => v._1 -> find(v._1)).toMap
    val csize = comp.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = vs.map(_._1).sorted.map { id =>
      (id, 3, mdeg.getOrElse(id, 0L), comp(id), csize(comp(id)))
    }.toSeq
    val got = run("g16_mutual_knn").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"mutual-knn mismatch: got ${got.take(3)} want ${want.take(3)}")
    // mutuality prunes: total mutual edges < total directed knn edges / 2
    assert(mutual.size.toLong < vs.length * 3L / 2)
    assert(got.exists(_._3 > 0L), "no mutual edge at all")
  }
}
