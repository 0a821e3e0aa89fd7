package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirty-third wave (st21 decayed
  * trending counter's batch twin, q131 AR aging, p21 lexicon filter).
  */
class Round5zfOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("st21 batch fold: decayed scores equal a scalar walk; decay truncates per step") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("CAST(get_json_object(props, '$.k') AS BIGINT)", "event_id",
        "unix_micros(ts)", "datediff(ts, TIMESTAMP'1970-01-01 00:00:00')").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (k, xs) =>
      val ord = xs.sortBy(x => (x._3, x._2))
      var lastDay = 0; var score = 0L; var cnt = 0
      ord.map { e =>
        score =
          if (cnt == 0) 1L
          else {
            val gap = e._4 - lastDay
            (if (gap > 62) 0L else score >> gap) + 1L
          }
        lastDay = e._4; cnt += 1
        (k, cnt, e._2, e._4, score)
      }
    }.sortBy(r => (r._1, r._2))
    val got = run("st21_decayed_counter").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"decay mismatch: got ${got.take(3)} want ${want.take(3)}")
    // a same-day run increments by exactly 1; a gap shrinks the score
    assert(got.forall(_._5 >= 1L))
    assert(got.exists(r => r._2 > 1 && r._5 > 1L), "no accumulation observed")
  }

  test("q131: aging report equals a scalar replay; shares sum to ~1e6 per status") {
    val orders = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_orderstatus", "datediff(o_orderdate, DATE'1970-01-01')",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val asof = orders.map(_._2).max
    def bucket(age: Int) =
      if (age <= 30) "0-30" else if (age <= 60) "31-60"
      else if (age <= 90) "61-90" else "90+"
    val g = orders.map(o => (o._1, bucket(asof - o._2), asof - o._2, o._3))
      .groupBy(x => (x._1, x._2)).toSeq
      .map { case ((st, b), xs) =>
        (st, b, xs.length.toLong, xs.map(_._4).sum, xs.map(_._3).min.toLong,
          xs.map(_._3).max.toLong)
      }
    val statusCents = g.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val want = g.map(x => (x._1, x._2, x._3, x._4, x._5, x._6,
      1000000L * x._4 / statusCents(x._1))).sortBy(r => (r._1, r._2))
    val got = run("q131_ar_aging").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4).toLong, r.getInt(5).toLong, r.getLong(6))).toSeq
    assert(got == want, s"aging mismatch: got ${got.take(2)} want ${want.take(2)}")
    // per-status ppm shares sum to 1e6 within integer-floor slack
    got.groupBy(_._1).values.foreach { xs =>
      val tot = xs.map(_._7).sum
      assert(tot > 1000000L - xs.length && tot <= 1000000L, s"share sum $tot")
    }
  }

  test("p21: lexicon filter equals a scalar replay; all three actions fire") {
    val lex = Map("slow" -> "defect", "error" -> "defect", "dup" -> "defect",
      "spark" -> "infra", "table" -> "infra", "join" -> "infra")
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "split(text, ' ')").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val want = docs.sortBy(_._1).map { case (id, ts) =>
      val n = ts.length.toLong
      val defect = ts.count(t => lex.get(t).contains("defect")).toLong
      val infra = ts.count(t => lex.get(t).contains("infra")).toLong
      val dppm = 1000000L * defect / n
      val action = if (dppm > 100000L) "drop" else if (dppm > 50000L) "flag" else "keep"
      (id, n, defect, infra, dppm, 1000000L * infra / n, action)
    }.toSeq
    val got = run("p21_lexicon_filter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))).toSeq
    assert(got == want, s"lexicon mismatch: got ${got.take(2)} want ${want.take(2)}")
    val actions = got.map(_._7).toSet
    assert(actions == Set("drop", "flag", "keep"),
      s"expected all three actions, got $actions")
  }
}
