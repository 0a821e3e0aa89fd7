package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fifty-second wave (d15 LSH bucket-skew
  * audit, q152 Mahalanobis outliers).
  */
class Round5zzOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("d15: per-band skew card is consistent with the d02 candidate set") {
    val got = run("d15_lsh_bucket_skew").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.map(_._1) == Seq(0, 1, 2, 3), "4 bands")
    // every banded doc appears in every band exactly once
    assert(got.map(_._3).distinct.size == 1, s"doc counts differ: ${got.map(_._3)}")
    got.foreach { case (b, nBuckets, nDocs, maxB, pairs, gini) =>
      assert(maxB >= 1 && maxB <= nDocs)
      assert(nBuckets <= nDocs)
      assert(gini >= 0 && gini < 1000000L, s"band $b gini $gini")
      // candidate pairs bound: the biggest bucket alone contributes
      // max*(max-1)/2 and no band exceeds all-pairs
      assert(pairs >= maxB * (maxB - 1) / 2 && pairs <= nDocs * (nDocs - 1) / 2)
    }
    // the union of per-band candidate work upper-bounds the distinct d02
    // candidate-pair count
    val d02 = run("d02_minhash_lsh").collect().length.toLong
    assert(got.map(_._5).sum >= d02, s"${got.map(_._5).sum} < $d02")
  }

  test("q152: Mahalanobis top-3 equals a scalar exact-rational replay") {
    val oc = graft.Tables.orders(spark, sf0001)
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = graft.Tables.customer(spark, sf0001)
      .selectExpr("c_custkey", "c_nationkey",
        "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) div 100").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), oc.getOrElse(r.getLong(0), 0L)))
    val want = cust.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (nk, g) =>
      val n = g.length.toLong
      val sx = g.map(_._3).sum; val sy = g.map(_._4).sum
      val sxx = g.map(c => BigInt(c._3) * c._3).sum
      val syy = g.map(c => BigInt(c._4) * c._4).sum
      val sxy = g.map(c => BigInt(c._3) * c._4).sum
      val cxx = BigInt(n) * sxx - BigInt(sx) * sx
      val cyy = BigInt(n) * syy - BigInt(sy) * sy
      val cxy = BigInt(n) * sxy - BigInt(sx) * sy
      val det = cxx * cyy - cxy * cxy
      if (det <= 0) Nil
      else g.map { case (ck, _, x, y) =>
        val dx = BigInt(n) * x - sx; val dy = BigInt(n) * y - sy
        val q = cyy * dx * dx - 2 * cxy * dx * dy + cxx * dy * dy
        (nk, ck, x, y, q)
      }.sortBy(r => (r._5 * -1, r._2)).take(3).zipWithIndex.map { case (r, i) =>
        (r._1, i + 1L, r._2, r._3, r._4, (r._5 * 1000000 / det).toLong)
      }
    }
    val got = run("q152_mahalanobis_outliers").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"mahalanobis mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.nonEmpty && got.forall(_._6 >= 0))
  }
}
