package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 fiftieth wave (m21 pHash via integer
  * DCT, q150 CUPED variance reduction).
  */
class Round5zxOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("m21: pHash equals a scalar integer-DCT replay") {
    val C = Array(
      Array(1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L),
      Array(980785L, 831470L, 555570L, 195090L, -195090L, -555570L, -831470L, -980785L),
      Array(923880L, 382683L, -382683L, -923880L, -923880L, -382683L, 382683L, 923880L),
      Array(831470L, -195090L, -980785L, -555570L, 555570L, 980785L, 195090L, -831470L),
      Array(707107L, -707107L, -707107L, 707107L, 707107L, -707107L, -707107L, 707107L),
      Array(555570L, -980785L, 195090L, 831470L, -831470L, -195090L, 980785L, -555570L),
      Array(382683L, -923880L, 923880L, -382683L, -382683L, 923880L, -923880L, 382683L),
      Array(195090L, -555570L, 831470L, -980785L, 980785L, -831470L, 555570L, -195090L))
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
      .filter(_._2.length >= 64)
    val want = docs.map { case (id, bytes) =>
      val sums = Array.fill(64)(0L); val cnts = Array.fill(64)(0L)
      bytes.indices.foreach { p => sums(p % 64) += bytes(p) & 0xff; cnts(p % 64) += 1 }
      val g = Array.tabulate(64)(j => sums(j) / cnts(j))
      val a = Array.tabulate(8, 8)((r, k) => (0 until 8).map(c => g(8 * r + c) * C(k)(c)).sum)
      val b = Array.tabulate(8, 8)((u, k) => (0 until 8).map(r => a(r)(k) * C(u)(r)).sum)
      val ac = for (u <- 0 until 8; k <- 0 until 8 if u != 0 || k != 0)
        yield (u * 8 + k - 1, b(u)(k))
      val med = ac.map(_._2).sorted.apply(31)
      val set = ac.filter(_._2 > med)
      (id, set.map(p => 1L << p._1).foldLeft(0L)(_ | _), set.length.toLong, med)
    }.sortBy(_._1).toSeq
    val got = run("m21_phash_dct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"phash mismatch: got ${got.take(2)} want ${want.take(2)}")
    // the AC median split sets at most 31 of 63 bits (>, not >=)
    assert(got.forall(r => r._3 <= 31 && r._3 > 0))
  }

  test("q150: CUPED moments equal a scalar replay; rho2 within [0,1]") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts)",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) div 100").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val us0 = ev.map(_._2).min
    val cut = us0 + 1296000000000L
    val per = ev.groupBy(_._1).map { case (u, g) =>
      (u, g.filter(_._2 < cut).map(_._3).sum, g.filter(_._2 >= cut).map(_._3).sum)
    }
    def hash60(s0: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s0.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val want = per.groupBy(p => hash60(p._1.toString) % 2).toSeq.sortBy(_._1)
      .map { case (v, g) =>
        val n = g.size.toLong
        val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
        val sxx = g.map(p => BigInt(p._2) * p._2).sum
        val syy = g.map(p => BigInt(p._3) * p._3).sum
        val sxy = g.map(p => BigInt(p._2) * p._3).sum
        val cxx = BigInt(n) * sxx - BigInt(sx) * sx
        val cyy = BigInt(n) * syy - BigInt(sy) * sy
        val cxy = BigInt(n) * sxy - BigInt(sx) * sy
        val theta = ((cxy * 1000000 + BigInt(1000000000) * cxx) / cxx - 1000000000).toLong
        val rho2 = (cxy * cxy * 1000000 / (cxx * cyy)).toLong
        (v, n, sx, sy, theta, rho2)
      }
    val got = run("q150_cuped").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"cuped mismatch: got $got want $want")
    got.foreach { r =>
      assert(r._6 >= 0 && r._6 <= 1000000L, s"rho2 out of range: ${r._6}")
    }
  }
}
