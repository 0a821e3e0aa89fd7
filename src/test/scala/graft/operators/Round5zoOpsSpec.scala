package graft.operators

import graft.SparkSpec

/** Differentials for the round-5 forty-first wave (m19 spectral
  * centroid, c07 purity/NMI evaluation, q140 price elasticity).
  */
class Round5zoOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("m19: DFT magnitudes equal a scalar replay; Parseval-ish sanity holds") {
    val C = Array(1000000L, 923880L, 707107L, 382683L, 0L, -382683L, -707107L,
      -923880L, -1000000L, -923880L, -707107L, -382683L, 0L, 382683L, 707107L, 923880L)
    val S = Array(0L, 382683L, 707107L, 923880L, 1000000L, 923880L, 707107L,
      382683L, 0L, -382683L, -707107L, -923880L, -1000000L, -923880L, -707107L, -382683L)
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val want = docs.sortBy(_._1).flatMap { case (id, bytes) =>
      val ns = bytes.length / 2
      val sv = Array.tabulate(ns) { i =>
        val raw = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
        if (raw >= 32768) raw - 65536 else raw
      }
      (0 until ns / 16).map { f =>
        val mags = (1 to 8).map { k =>
          var re = 0L; var im = 0L
          (0 until 16).foreach { n =>
            val j = (k * n) % 16
            re += sv(16 * f + n).toLong * C(j)
            im -= sv(16 * f + n).toLong * S(j)
          }
          math.sqrt(re.toDouble * re.toDouble + im.toDouble * im.toDouble)
        }
        var den = 0.0; var num = 0.0
        (1 to 8).foreach { k => den += mags(k - 1); num += k.toDouble * mags(k - 1) }
        val dom = (1 to 8).minBy(k => (-mags(k - 1), k))
        (id, f,
          if (den == 0.0) None else Some(dom),
          if (den == 0.0) None else Some(r6(num / den)),
          r6(den / 1000000.0))
      }
    }.toSeq
    val got = run("m19_spectral_centroid").collect().map { r =>
      (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getDouble(4))
    }.toSeq
    assert(got == want, s"spectral mismatch: got ${got.take(2)} want ${want.take(2)}")
    // centroid lives inside the bin range on every non-silent frame
    assert(got.flatMap(_._4).forall(c => c >= 1.0 && c <= 8.0))
  }

  test("c07: purity/NMI equal a contingency replay off c01's assignment") {
    val asg = run("c01_kmeans").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val labels = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val cells = asg.toSeq.map { case (v, cl) => ((cl, labels(v)), 1L) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = asg.size.toLong
    val ni = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nj = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val miDec = cells.map { case ((cl, l), nij) =>
      r9((nij.toDouble / n) * math.log((n.toDouble * nij) / (ni(cl).toDouble * nj(l))))
    }.sum
    val hcDec = ni.values.map(c => r9(-(c.toDouble / n) * math.log(c.toDouble / n))).sum
    val hlDec = nj.values.map(c => r9(-(c.toDouble / n) * math.log(c.toDouble / n))).sum
    val pursum = cells.groupBy(_._1._1).values.map(_.values.max).sum
    val want = (n, ni.size.toLong, nj.size.toLong,
      r6(pursum.toDouble / n), r6(miDec.toDouble), r6(hcDec.toDouble), r6(hlDec.toDouble),
      r6(miDec.toDouble / math.sqrt(hcDec.toDouble * hlDec.toDouble)))
    val r = run("c07_cluster_purity").collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert(got == want, s"purity/nmi mismatch: got $got want $want")
    // purity can't beat 1 nor fall below the single-label floor 1/n_labels
    assert(got._4 >= 1.0 / got._3 && got._4 <= 1.0 && got._8 >= 0.0 && got._8 <= 1.0)
  }

  test("q140: elasticity equals an exact-moment scalar replay; r2 in [0,1]") {
    val rows = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.part(spark, sf0001),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr("p_brand",
        "CAST(round(ln(CAST(l_quantity AS DOUBLE)) * 1e6, 0) AS BIGINT)",
        "CAST(round(ln(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)) * 1e6, 0) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (brand, rs) =>
      val n = rs.length.toLong
      val sx = rs.map(r => BigInt(r._3)).sum
      val sy = rs.map(r => BigInt(r._2)).sum
      val sxx = rs.map(r => BigInt(r._3) * BigInt(r._3)).sum
      val sxy = rs.map(r => BigInt(r._3) * BigInt(r._2)).sum
      val syy = rs.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val vx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val vy = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
      (brand, n, r6(num / vx), r6(num * num / (vx * vy)))
    }
    val got = run("q140_price_elasticity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == want, s"elasticity mismatch: got ${got.take(2)} want ${want.take(2)}")
    assert(got.forall(g => g._4 >= 0.0 && g._4 <= 1.0))
  }
}
