package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-5 sixth-wave additions (q96 Mann-Kendall,
  * t24 KS distance, s15 NDCG eval) — scalar differentials + statistic
  * bounds.
  */
class Round5fOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q96: S and tie-corrected variance equal a scalar Mann-Kendall") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val n = xs.length.toLong
      var s = 0L
      for (i <- xs.indices; j <- i + 1 until xs.length)
        s += java.lang.Long.signum(xs(j) - xs(i))
      val tie = xs.groupBy(identity).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie
      (u, n, s, var18)
    }
    val got = run("q96_mann_kendall").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"MK mismatch: got ${got.take(3)} want ${want.take(3)}")
    // |S| can never exceed the pair count, and Var(S) is nonnegative
    assert(got.forall(r => math.abs(r._3) <= r._2 * (r._2 - 1) / 2))
    assert(got.forall(_._4 >= 0))
  }

  test("t24: KS numerator equals a scalar merged-ECDF walk; D in [0,1]") {
    val lens = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("source", "CAST(size(split(text, ' ')) AS BIGINT) AS len")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = lens.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sorted }
    val srcs = bySrc.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- i + 1 until srcs.length
    } yield {
      val (a, b) = (bySrc(srcs(i)), bySrc(srcs(j)))
      val grid = (a ++ b).distinct.sorted
      val dnum = grid.map { v =>
        math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)
      }.max
      (srcs(i), srcs(j), a.length.toLong, b.length.toLong, dnum)
    }).toSeq
    val got = run("t24_ks_distance").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"KS mismatch: got ${got.take(3)} want ${want.take(3)}")
    val ds = run("t24_ks_distance").collect().map(_.getDouble(5))
    assert(ds.forall(d => d >= 0.0 && d <= 1.0), "KS distance out of [0,1]")
  }

  test("s15: NDCG equals a scalar graded-relevance computation; perfect ranking gives 1") {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double], dim: Int): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        (0 until dim).foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a.clone())) * math.sqrt(dot(b, b.clone()))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // NOTE the norm in cos() above uses only the first `dim` dims of each
    // side because dot() is dim-limited — matches v16 slicing
    val disc6 = (1 to 5).map(i => math.round(1e6 / (math.log(i + 1) / math.log(2))))
    val idcg6 = (1 to 5).map(i => (6 - i) * disc6(i - 1)).sum
    val qids = vecs.keys.filter(_ % 50 == 0).toSeq.sorted
    val want = qids.map { qid =>
      def top5(dim: Int) = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(vecs(qid), v, dim)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      val approx = top5(16)
      val exact = top5(64).zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      val dcg6 = approx.zipWithIndex.map { case (id, i) =>
        exact.get(id).map(er => (6L - er) * disc6(i)).getOrElse(0L)
      }.sum
      val hits = approx.count(exact.contains)
      (qid, hits, dcg6, idcg6,
        BigDecimal(dcg6.toDouble / idcg6.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = run("s15_ndcg_eval").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want, s"NDCG mismatch: got ${got.take(3)} want ${want.take(3)}")
    // structural: ndcg == 1 exactly when the truncated ranking reproduces
    // the exact top-5 in order
    got.foreach { case (qid, _, dcg6v, idcg6v, ndcg) =>
      assert((ndcg == 1.0) == (dcg6v == idcg6v), s"qid $qid ndcg/idcg inconsistency")
    }
  }
}
