package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fifty-first wave (q151 weighted
  * quantiles, p25 packing-efficiency curve, g18 WL color refinement).
  */
class Round5zyOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q151: weighted quantiles equal a scalar cumulative-weight replay") {
    val part = graft.Tables.part(spark, sf0001)
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = graft.Tables.lineitem(spark, sf0001)
      .selectExpr("l_partkey", "l_orderkey", "l_linenumber",
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)",
        "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)").collect()
      .map(r => (part(r.getLong(0)), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val want = li.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, g) =>
      val sorted = g.sortBy(r => (r._4, r._2, r._3))
      val tw = g.map(_._5).sum
      var cum = 0L
      val cums = sorted.map { r => cum += r._5; (r._4, cum) }
      def q(num: Long, den: Long) =
        cums.find { case (_, cw) => den * cw >= num * tw }.get._1
      (b, g.length.toLong, tw, q(1, 4), q(1, 2), q(3, 4))
    }
    val got = run("q151_weighted_quantile").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"wq mismatch: got ${got.take(2)} want ${want.take(2)}")
    got.foreach(r => assert(r._4 <= r._5 && r._5 <= r._6, s"${r._1} not monotone"))
  }

  test("p25: packing curve equals a scalar next-fit replay") {
    val items = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (for (ci <- 0 to 3; shard <- 0 to 7) yield {
      val cap = 512L << ci
      val mine = items.filter(_._1 % 8 == shard).sortBy(_._1)
      val fit = mine.filter(_._2 <= cap)
      var load = 0L; var bins = 0L; var packed = 0L
      fit.foreach { case (_, t) =>
        if (bins == 0) { bins = 1; load = t }
        else if (load + t <= cap) load += t
        else { bins += 1; load = t }
        packed += t
      }
      (cap, shard, mine.length.toLong, (mine.length - fit.length).toLong, bins, packed,
        if (bins > 0) Some(packed * 1000000L / (bins * cap)) else None)
    }).toSeq
    val got = run("p25_pack_efficiency").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSeq
    assert(got == want, s"pack mismatch: got ${got.take(3)} want ${want.take(3)}")
    // larger contexts waste no MORE tokens per bin-capacity on this corpus:
    // efficiency is defined and positive everywhere docs fit
    assert(got.forall(r => r._7.forall(e => e > 0 && e <= 1000000L)))
  }

  test("g18: WL histogram equals a scalar 2-round refinement replay") {
    val pairs = run("d02_minhash_lsh").collect()
      .filter(_.getDouble(2) >= 0.5).map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (n, g) => n -> g.map(_._2).toSeq }
    def h60(s0: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s0.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    var colors: Map[Long, Long] = adj.map { case (n, nb) => n -> nb.length.toLong }
    (1 to 2).foreach { _ =>
      colors = adj.map { case (n, nb) =>
        val ns = nb.map(colors).sorted.mkString(",")
        n -> h60(s"${colors(n)}|$ns")
      }
    }
    val want = colors.values.groupBy(identity)
      .map { case (c, g) => (c, g.size.toLong) }.toSeq
      .sortBy(r => (-r._2, r._1))
    val got = run("g18_wl_colors").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, s"WL mismatch: got ${got.take(3)} want ${want.take(3)}")
    // refinement distinguishes: at least as many colors as degree classes
    val degClasses = adj.values.map(_.length).toSet.size
    assert(got.length >= degClasses)
  }
}
