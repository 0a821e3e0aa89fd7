package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 thirty-sixth wave (q134 snapshot diff,
  * q135 quantile sketch, s24 filtered ANN).
  */
class Round5ziOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q134: diff classes equal a scalar replay; conservation holds") {
    val base = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)", "o_orderstatus",
        "CAST(conv(substr(md5(concat('diff:', CAST(o_orderkey AS STRING))), 1, 15), 16, 10) AS BIGINT) % 20")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val a = base.filter(_._4 != 1).map(x => x._1 -> ((x._2, x._3))).toMap
    val b = base.filter(_._4 != 2)
      .map(x => x._1 -> ((if (x._4 == 3) x._2 + 1 else x._2, x._3))).toMap
    val classes = (a.keySet ++ b.keySet).toSeq.map { k =>
      val cls =
        if (!a.contains(k)) "added"
        else if (!b.contains(k)) "removed"
        else if (a(k) != b(k)) "changed"
        else "unchanged"
      val cc = if (a.contains(k) && b.contains(k) && a(k)._1 != b(k)._1) Some("cents")
        else if (a.contains(k) && b.contains(k) && a(k)._2 != b(k)._2) Some("status")
        else None
      (k, cls, cc)
    }
    val want = classes.groupBy(_._2).toSeq.sortBy(_._1).map { case (cls, xs) =>
      (cls, xs.length.toLong, xs.flatMap(_._3).distinct.length.toLong,
        xs.map(_._1).min, xs.map(_._1).max)
    }
    val got = run("q134_snapshot_diff").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"diff mismatch: got $got want $want")
    // conservation: |A| = removed + changed + unchanged; |B| = added + ...
    val m = got.map(r => r._1 -> r._2).toMap
    assert(a.size.toLong == m.getOrElse("removed", 0L) + m.getOrElse("changed", 0L)
      + m.getOrElse("unchanged", 0L))
    assert(b.size.toLong == m.getOrElse("added", 0L) + m.getOrElse("changed", 0L)
      + m.getOrElse("unchanged", 0L))
    assert(m.keySet == Set("added", "removed", "changed", "unchanged"))
  }

  test("q135: sketch quantiles equal a scalar replay; rank error within 1/8 + bucket slack") {
    val base = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)",
        "CAST(conv(substr(md5(concat('kll:', CAST(o_orderkey AS STRING))), 1, 15), 16, 10) AS BIGINT) % 32")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val kept = base.groupBy(_._3).values.flatMap { xs =>
      xs.toSeq.sortBy(x => (x._2, x._1)).zipWithIndex
        .filter(_._2 % 8 == 0).map(_._1)
    }.toSeq.sortBy(x => (x._2, x._1))
    val tw = 8L * kept.length
    val sortedAll = base.sortBy(x => (x._2, x._1)).map(_._2)
    val n = sortedAll.length.toLong
    val want = Seq(25, 50, 90, 99).map { q =>
      val pick = (q * tw + 99) / 100
      var cw = 0L
      val est = kept.iterator.map { x => cw += 8; (x._2, cw) }
        .find(_._2 >= pick).get._1
      val exact = sortedAll(((q * n + 99) / 100).toInt - 1)
      val estRank = sortedAll.count(_ <= est).toLong
      (q, est, exact, math.abs(1000000 * estRank / n - 10000 * q))
    }
    val got = run("q135_quantile_sketch").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"sketch mismatch: got $got want $want")
    // one compaction of factor 8 over 32 buckets: rank error stays well
    // under 10% of the range at this n
    assert(got.forall(_._4 <= 100000L), s"rank error too large: $got")
  }

  test("s24: pre-filter truth equals a scalar replay; post-filter misses deep neighbors") {
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE))")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val norms = vecs.map(v => v._1 -> math.sqrt(dot(v._3, v._3))).toMap
    val want = vecs.filter(_._1 % 50 == 0).sortBy(_._1).flatMap { case (qid, ql, qv) =>
      val all = vecs.filter(_._1 != qid)
        .map(v => (r6(dot(qv, v._3) / (norms(qid) * norms(v._1))), v._1, v._2))
        .sortBy(x => (-x._1, x._2))
      val pre = all.filter(_._3 == ql).take(5)
      val post = all.take(20).filter(_._3 == ql).take(5).map(_._2).toSet
      pre.zipWithIndex.map { case ((cos, id, _), i) =>
        (qid, i + 1, id, cos, post(id))
      }
    }.toSeq
    val got = run("s24_filtered_ann").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toSeq
    assert(got == want, s"filtered-ann mismatch: got ${got.take(3)} want ${want.take(3)}")
    // the recall-loss phenomenon is real on this data: at least one
    // ground-truth neighbor is invisible to post-filtering
    assert(got.exists(!_._5), "post-filter found everything — overfetch test is vacuous")
    assert(got.exists(_._5))
  }
}
