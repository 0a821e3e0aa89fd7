package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fifteenth wave (q109 rule-table DQ
  * engine, p16 dedup-aware mixture, m10 Sobel gradient energy).
  */
class Round5nOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q109: rule rollup equals scalar evaluation; pass and fail rules both present") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("event_id", "event_type", "value", "year(ts) AS yr",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val known = Set("view", "click", "purchase", "signup", "error")
    val rules: Seq[(String, ((Long, String, Double, Int, Option[Long])) => Boolean)] = Seq(
      "r1_value_nonneg" -> (e => e._3 < 0),
      "r2_value_cap_100" -> (e => e._3 > 100),
      "r3_ts_in_2024" -> (e => e._4 != 2024),
      "r4_campaign_le_50" -> (e => e._5.exists(_ > 50)),
      "r5_type_known" -> (e => !known(e._2)))
    val want = rules.map { case (name, f) =>
      val bad = ev.filter(f)
      (name, ev.length.toLong, bad.length.toLong,
        1000000L * bad.length / ev.length,
        if (bad.isEmpty) None else Some(bad.map(_._1).min))
    }
    val got = run("q109_dq_rules").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == want, s"dq mismatch: got $got want $want")
    assert(got.exists(_._3 > 0), "no rule ever fires — vacuous rule set")
    assert(got.exists(_._3 == 0), "every rule fires — no clean baseline")
  }

  test("p16: dedup-aware shares equal a scalar replay; duplicate mass is conserved") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val canonOf = docs.groupBy(_._3.take(64)).values.map(g => g.map(_._1).min).toSet
    val want = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, rows) =>
      val tok = rows.map(r => (r._1, r._3.split(" ", -1).length.toLong))
      val total = tok.map(_._2).sum
      val canonTok = tok.filter(t => canonOf(t._1)).map(_._2).sum
      (src, rows.length.toLong, rows.count(r => canonOf(r._1)).toLong,
        total, canonTok, 1000000L * (total - canonTok) / total)
    }
    val got = run("p16_dedup_aware_mixture").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == want, s"mixture mismatch: got ${got.take(3)} want ${want.take(3)}")
    // some source genuinely sheds duplicate tokens (d01 finds exact dups)
    assert(got.exists(_._6 > 0), "no duplicate mass anywhere — vacuous")
  }

  test("m10: Sobel energies equal a scalar convolution over the byte image") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._2.nonEmpty)
    def pix(t: String, r: Int, c: Int): Long = {
      val i = r * 8 + c
      if (i < t.length) t.charAt(i).toLong else 0L
    }
    val want = docs.sortBy(_._1).toSeq.map { case (id, t) =>
      val g2s = for (y <- 1 to 6; x <- 1 to 6) yield {
        val gx = pix(t, y - 1, x + 1) + 2 * pix(t, y, x + 1) + pix(t, y + 1, x + 1) -
          pix(t, y - 1, x - 1) - 2 * pix(t, y, x - 1) - pix(t, y + 1, x - 1)
        val gy = pix(t, y + 1, x - 1) + 2 * pix(t, y + 1, x) + pix(t, y + 1, x + 1) -
          pix(t, y - 1, x - 1) - 2 * pix(t, y - 1, x) - pix(t, y - 1, x + 1)
        gx * gx + gy * gy
      }
      (id, g2s.sum, g2s.max, g2s.count(_ > 10000).toLong)
    }
    val got = run("m10_sobel_energy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"sobel mismatch: got ${got.take(2)} want ${want.take(2)}")
    // edges exist somewhere (ascii text has real gradients)
    assert(got.exists(_._4 > 0))
  }
}
