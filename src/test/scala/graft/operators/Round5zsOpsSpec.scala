package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 forty-fifth wave (st23 absence-alert
  * batch twin, m20 pitch-by-autocorrelation).
  */
class Round5zsOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("st23 batch twin: statuses equal a scalar first-purchase replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "unix_micros(ts)", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val wmMs = ev.map(_._3).max / 1000L
    val byUser = ev.groupBy(_._1)
    val want = ev.filter(_._4 == "view").map { case (u, vid, vus, _) =>
      val firstP = byUser(u).filter(e => e._4 == "purchase"
          && e._3 > vus && e._3 <= vus + 21600000000L)
        .sortBy(e => (e._3, e._2)).headOption.map(_._2)
      val dl = vus / 1000L + 21600001L
      val status = if (firstP.isDefined) "converted"
        else if (dl <= wmMs) "alert" else "pending"
      (u, vid, dl, status, firstP)
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = run("st23_absence_alert").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == want, s"absence mismatch: got ${got.take(3)} want ${want.take(3)}")
    // all three statuses occur: conversions, expired alerts, and views
    // near the end of the stream still inside their window
    assert(Set("converted", "alert").subsetOf(got.map(_._4).toSet),
      s"statuses seen: ${got.map(_._4).toSet}")
  }

  test("m20: frame pitch equals a scalar autocorrelation replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val ns = bytes.length / 2
      val sv = Array.tabulate(ns) { i =>
        val raw = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
        (if (raw >= 32768) raw - 65536 else raw).toLong
      }
      (0 until ns / 64).map { f =>
        val fr = sv.slice(64 * f, 64 * f + 64)
        val r0 = fr.map(x => x * x).sum
        val rs = (4 to 32).map(l => l -> (0 until 64 - l).map(i => fr(i) * fr(i + l)).sum)
        val (bl, br) = rs.minBy { case (l, r) => (-r, l) }
        val voiced = br > 0 && r0 > 0
        (id, f, if (voiced) Some(bl) else None, if (voiced) Some(br) else None, r0,
          if (voiced) Some(BigDecimal(br.toDouble / r0.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) else None)
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = run("m20_pitch_autocorr").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSeq
    assert(got == want, s"pitch mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.nonEmpty && got.exists(_._3.isDefined), "no voiced frames at all")
  }
}
