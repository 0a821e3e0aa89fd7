package graft.operators

import org.apache.spark.sql.SparkSession

/** Scalar replay of [[Graph.knnDirectedBlocked]] for spec differentials:
  * the multi-probe sign-LSH blocking (KNN_H md5-derived hyperplanes, home
  * bucket + one-bit-flip probes) and the exact-cosine top-3 rerank,
  * re-implemented with plain Scala collections so the g09/g10/g11/g12
  * differentials compare the distributed build against an independent
  * scalar spelling of the SAME algorithm (the blocked builder is the
  * product contract since round 6; the all-pairs build survives only as
  * g19's recall-oracle arm).
  */
object KnnGraphFixture {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The KNN_L*KNN_H hyperplane weight rows: w(p)(i-1) for i in 1..64
    * (table l owns rows l*KNN_H .. l*KNN_H+KNN_H-1).
    */
  private lazy val hyper: Array[Array[Double]] =
    Array.tabulate(Graph.KNN_L * Graph.KNN_H) { p =>
      Array.tabulate(64) { i0 =>
        java.lang.Long.parseLong(md5hex(s"$p:${i0 + 1}").take(8), 16) /
          4294967296.0 - 0.5
      }
    }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Directed blocked kNN lists (qid -> nb), k = 3. */
  def knnDirected(spark: SparkSession, dir: String): Seq[(Long, Long)] = {
    val rows = graft.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val nrm = rows.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    // table-tagged bucket key per (vector, table): l*2^H + bucket_l
    def keys(v: Array[Double]): Seq[Long] =
      (0 until Graph.KNN_L).map { l =>
        (l.toLong << Graph.KNN_H) +
          (0 until Graph.KNN_H).map(p =>
            if (dot(v, hyper(l * Graph.KNN_H + p)) >= 0) 1L << p else 0L).sum
      }
    val byKey = rows.flatMap { case (id, v) => keys(v).map(_ -> ((id, v))) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.toSeq.flatMap { case (qid, qv) =>
      val probes = for {
        (k, l) <- keys(qv).zipWithIndex
        m <- Graph.KNN_MASKS
      } yield (l.toLong << Graph.KNN_H) + ((k - (l.toLong << Graph.KNN_H)) ^ m)
      probes.distinct.flatMap(b => byKey.getOrElse(b, Array.empty[(Long, Array[Double])]))
        .filter(_._1 != qid).distinct
        .map { case (id, v) => (id, round6(dot(qv, v) / (nrm(qid) * nrm(id)))) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(n => (qid, n._1))
    }
  }

  /** Undirected blocked edge set (a < b). */
  def und(spark: SparkSession, dir: String): Set[(Long, Long)] =
    knnDirected(spark, dir)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
}
