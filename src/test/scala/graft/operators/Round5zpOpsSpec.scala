package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 forty-second wave (st22 streaming
  * 3-sigma guardrail batch twin, q141 SPRT monitor, p23 Hamilton
  * budget apportionment).
  */
class Round5zpOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("st22 batch twin: flags equal an exact-integer scalar replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("event_type", "event_id", "unix_micros(ts)",
        "CAST(round(value * 1000, 0) AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      var n = 0L; var s = BigInt(0); var ss = BigInt(0)
      rows.sortBy(r => (r._3, r._2)).zipWithIndex.map { case (r, i) =>
        val dev = BigInt(r._4) * n - s
        val flag = n >= 10 && dev * dev > 9 * (BigInt(n) * ss - s * s)
        val out = (et, r._2, i + 1, n, flag)
        n += 1; s += r._4; ss += BigInt(r._4) * r._4
        out
      }
    }.sortBy(r => (r._1, r._3))
    val got = run("st22_stream_zscore_guardrail").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
      .toSeq
    assert(got == want, s"guardrail mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.exists(_._5), "no anomaly flagged")
  }

  test("q141: SPRT walk equals a scalar replay and crosses a boundary") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr(
        s"pmod(${graft.operators.Ns.hash60("CAST(user_id AS STRING)")}, 2)",
        "unix_micros(ts)", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (v, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      var cum = 0L
      var h1: Option[Long] = None; var h0: Option[Long] = None
      var conv = 0L
      ordered.zipWithIndex.foreach { case (r, i) =>
        val x = r._4 == "purchase"
        if (x) conv += 1
        cum += (if (x) 182322L else -22473L)
        if (cum >= 2944439L && h1.isEmpty) h1 = Some(i + 1L)
        if (cum <= -2944439L && h0.isEmpty) h0 = Some(i + 1L)
      }
      val (cross, dec) =
        if (h1.isDefined && (h0.isEmpty || h1.get <= h0.get)) (h1, "accept_h1")
        else if (h0.isDefined) (h0, "accept_h0")
        else (None, "continue")
      (v, ordered.length.toLong, conv, cum, cross, dec)
    }
    val got = run("q141_sprt_monitor").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getString(5))).toSeq
    assert(got == want, s"sprt mismatch: got $got want $want")
    // 20% observed conversion vs H1 12%: both arms must accept H1 quickly
    assert(got.forall(_._6 == "accept_h1"))
  }

  test("p23: Hamilton apportionment spends the budget exactly, floor-faithful") {
    val got = run("p23_budget_apportion").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5))).toSeq
    val totalToks = got.map(_._3).sum
    // exact-spend invariant: allocations sum to the full budget
    assert(got.map(_._6).sum == 1000000L, s"allocated ${got.map(_._6).sum}")
    got.foreach { case (src, _, toks, base, extra, alloc) =>
      assert(base == 1000000L * toks / totalToks, s"$src base wrong")
      assert(alloc == base + (if (extra) 1 else 0), s"$src alloc wrong")
      assert(alloc - base <= 1, s"$src got more than one quantum")
    }
    // remainder ranking hands out exactly B - sum(floor) extras
    val extras = got.count(_._5)
    assert(extras == (1000000L - got.map(_._4).sum), "extra count mismatch")
  }
}
