package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fifty-ninth wave (q161 FK conformance,
  * q162 encoding advisor, q163 nearest-event as-of join).
  */
class Round6gOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q161: conformance matrix equals scalar orphan counts") {
    def keys(t: String, c: String) = graft.Tables.table(spark, sf0001, t)
      .selectExpr(s"CAST($c AS BIGINT)").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val edges = Seq(
      ("customer->nation", keys("customer", "c_nationkey"), keys("nation", "n_nationkey")),
      ("lineitem->orders", keys("lineitem", "l_orderkey"), keys("orders", "o_orderkey")),
      ("lineitem->part", keys("lineitem", "l_partkey"), keys("part", "p_partkey")),
      ("nation->region", keys("nation", "n_regionkey"), keys("region", "r_regionkey")),
      ("orders->customer", keys("orders", "o_custkey"), keys("customer", "c_custkey")),
      ("supplier->nation", keys("supplier", "s_nationkey"), keys("nation", "n_nationkey")))
    val want = edges.map { case (name, child, parent) =>
      val pset = parent.flatten.toSet
      val nulls = child.count(_.isEmpty).toLong
      val orphans = child.flatten.count(!pset.contains(_)).toLong
      val n = child.length.toLong
      (name, n, nulls, orphans, (n - nulls - orphans) * 1000000L / n)
    }
    val got = run("q161_fk_conformance").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"fk mismatch: got $got want $want")
    // the synthetic schema is referentially clean
    got.foreach(r => assert(r._5 == 1000000L, s"${r._1} not conformant"))
  }

  test("q162: per-column stats equal a scalar replay") {
    val rows = graft.Tables.lineitem(spark, sf0001)
      .selectExpr("l_orderkey", "l_linenumber",
        "CAST(l_orderkey AS STRING)", "CAST(l_partkey AS STRING)",
        "CAST(l_suppkey AS STRING)",
        "CAST(CAST(l_quantity AS DECIMAL(12,2)) AS STRING)",
        "CAST(CAST(l_discount AS DECIMAL(12,2)) AS STRING)",
        "CAST(CAST(l_tax AS DECIMAL(12,2)) AS STRING)").collect()
      .map(r => ((r.getLong(0), r.getInt(1)),
        Seq(r.getString(2), r.getString(3), r.getString(4), r.getString(5),
          r.getString(6), r.getString(7))))
    val names = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_discount", "l_tax")
    val want = names.zipWithIndex.map { case (nm, i) =>
      // the total order includes the column's own value as final key
      val vs = rows.map(r => (r._1, r._2(i))).sortBy(r => (r._1._1, r._1._2, r._2))
        .map(_._2)
      val n = vs.length.toLong
      val nd = vs.distinct.length.toLong
      val runs = 1L + vs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      val dm = nd * 1000000L / n; val rm = runs * 1000000L / n
      (nm, n, nd, runs, dm, rm,
        if (dm < 100000L) "dictionary" else if (rm < 500000L) "rle" else "plain")
    }.sortBy(_._1)
    val got = run("q162_encoding_advisor").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))).toSeq
    assert(got == want, s"advisor mismatch: got ${got.take(3)} want ${want.take(3)}")
    // low-cardinality money columns dictionary-encode; keys stay plain
    assert(got.find(_._1 == "l_discount").exists(_._7 == "dictionary"))
    assert(got.find(_._1 == "l_orderkey").exists(_._7 != "dictionary"))
  }

  test("q163: nearest click equals a scalar bidirectional scan") {
    val ev = graft.Tables.events(spark, sf0001)
      .filter("event_type IN ('click', 'error')")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val clicks = g.filter(_._3 == "click").sortBy(r => (r._4, r._2))
      g.filter(_._3 == "error").map { e =>
        // prev = last click strictly before in (us, event_id) order
        def lt(a: (Long, Long), b: (Long, Long)) =
          a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
        val prev = clicks.filter(c => lt((c._4, c._2), (e._4, e._2))).lastOption
        val next = clicks.find(c => lt((e._4, e._2), (c._4, c._2)))
        val (nid, gap) = (prev, next) match {
          case (None, None) => (None, None)
          case (Some(p), None) => (Some(p._2), Some(e._4 - p._4))
          case (None, Some(nx)) => (Some(nx._2), Some(nx._4 - e._4))
          case (Some(p), Some(nx)) =>
            if (e._4 - p._4 <= nx._4 - e._4) (Some(p._2), Some(e._4 - p._4))
            else (Some(nx._2), Some(nx._4 - e._4))
        }
        (u, e._2, e._4, nid, gap)
      }
    }.sortBy(r => (r._1, r._2))
    val got = run("q163_nearest_event").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == want, s"nearest mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.exists(_._4.isDefined))
    got.foreach(r => assert(r._5.forall(_ >= 0), s"negative gap: $r"))
  }
}
