package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-5 fifth-wave additions (q95 Gini, s14 kNN
  * label audit, p14 FFD bin packing) — scalar differentials plus the
  * capacity/conservation properties the oracle hash cannot name.
  */
class Round5eOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q95: gini equals a scalar Lorenz computation and sits in [0, 1)") {
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (seg, g) =>
      val xs = g.map(_._2).sorted
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum
      val six = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = BigDecimal((BigInt(2) * six - (n + 1) * sx).toDouble / (n * sx).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (seg, xs.length.toLong, xs.sum, gini)
    }
    val got = run("q95_gini").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want, s"gini mismatch: got $got want $want")
    assert(got.forall(r => r._4 >= 0.0 && r._4 < 1.0), "gini out of [0,1)")
  }

  test("s14: votes equal a scalar top-5 majority; disagreements exist (noise detector bites)") {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "label", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // the audited set: the fixed-count md5-rank sample (r9)
    val md = java.security.MessageDigest.getInstance("MD5")
    def mrank(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val smp = vecs.map(_._1).sortBy(id => (mrank(id), id)).take(64).toSet
    val want = vecs.filter(r => smp(r._1)).sortBy(_._1).map { case (qid, tl, qv) =>
      val top5 = vecs.filter(_._1 != qid)
        .map { case (id, l, v) => (id, l, cos(qv, v)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(5)
      val (pl, votes) = top5.groupBy(_._2).map { case (l, g) => (l, g.length) }
        .toSeq.sortBy { case (l, n) => (-n, l) }.head
      (qid, tl, pl, votes, pl == tl)
    }.toSeq
    val got = run("s14_knn_label_audit").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4))).toSeq
    assert(got == want, s"knn audit mismatch: got ${got.take(3)} want ${want.take(3)}")
    assert(got.exists(!_._5), "all labels consistent — audit fixture never disagrees")
  }

  test("p14: packing equals scalar FFD; capacity and conservation hold") {
    val items = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 <= 512L)
    val want = items.groupBy(_._1 % 8).toSeq.sortBy(_._1).flatMap { case (shard, g) =>
      val sorted = g.sortBy { case (id, t) => (-t, id) }
      val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
      sorted.map { case (id, t) =>
        val fit = loads.indexWhere(_ + t <= 512L)
        if (fit >= 0) { loads(fit) += t; (shard.toInt, id, t, fit + 1, loads(fit)) }
        else { loads += t; (shard.toInt, id, t, loads.length, t) }
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = run("p14_bin_packing").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4))).toSeq
    assert(got == want, s"FFD mismatch: got ${got.take(3)} want ${want.take(3)}")
    // capacity: no running load exceeds the context budget
    assert(got.forall(_._5 <= 512L), "a bin overflowed the 512-token budget")
    // conservation: per (shard, bin), the max load_after equals the bin's
    // token sum — every token landed in exactly one bin
    got.groupBy(r => (r._1, r._4)).foreach { case ((sh, bin), rows) =>
      assert(rows.map(_._3).sum == rows.map(_._5).max,
        s"shard $sh bin $bin: token sum != final load")
    }
    // FFD actually packs: fewer bins than docs somewhere
    val bins = got.groupBy(_._1).map { case (_, rows) => rows.map(_._4).max }
    val docs = got.groupBy(_._1).map { case (_, rows) => rows.length }
    assert(bins.sum < docs.sum, "no bin ever received a second document")
  }
}
