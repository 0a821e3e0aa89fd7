package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-5 additions: the KMV bottom-k distinct
  * sketch (q84). The DuckDB oracle pins exact output; these pin the
  * sketch ALGEBRA against a scalar reimplementation — in particular
  * that the ALL row is a true sketch MERGE (k-min of the union of
  * per-group sketches) and identical to the sketch a single pass over
  * the base data would build, the property that makes per-executor
  * sketching + combine correct at cluster scale.
  */
class Round5OpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private val K = 256

  /** Scalar 52-bit md5 hash identical to Ns.hash52. */
  private def h52(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  private def estimate(sketch: Seq[Long]): Double =
    if (sketch.length < K) sketch.length.toDouble
    else (255L * 4503599627370496L).toDouble / sketch.max.toDouble

  test("q84: per-group and merged estimates equal a scalar KMV over collected keys") {
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderpriority").as("grp"), col("o_custkey"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val byGrp = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val sketches: Map[String, Seq[Long]] =
      byGrp.view.mapValues(_.map(k => h52(k.toString)).distinct.sorted.take(K).toSeq).toMap

    val got = run("q84_kmv_sketch").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    for ((g, sk) <- sketches) {
      val exact = byGrp(g).length.toLong
      val est = BigDecimal(estimate(sk)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      assert(got(g) == ((exact, sk.length.toLong, est.toDouble)), s"group $g")
    }

    // merge = k smallest of the union of per-group sketches; must equal
    // both the reported ALL row and a from-scratch global sketch
    val merged = sketches.values.flatten.toSeq.distinct.sorted.take(K)
    val global = rows.map(_._2).distinct.map(k => h52(k.toString)).sorted.take(K).toSeq
    assert(merged == global,
      "sketch union is not lossless vs a single-pass global sketch")
    val exactAll = rows.map(_._2).distinct.length.toLong
    assert(got("ALL") == ((exactAll, merged.length.toLong,
      BigDecimal(estimate(merged)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("q84: estimator is within the 3/sqrt(k) relative-error bound when full") {
    // sf0.001 sketches are not full (exact branch); build a full sketch
    // synthetically to exercise the bound the estimator promises
    val n = 10000
    val hashes = (1 to n).map(i => h52(i.toString)).sorted.take(K)
    val est = estimate(hashes)
    assert(math.abs(est - n) / n < 3.0 / math.sqrt(K.toDouble),
      s"estimate $est for true $n outside bound")
  }

  test("q85: sketch-intersection estimate equals a scalar KMV intersection") {
    val aKeys = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey").distinct().collect().map(_.getLong(0))
    val bRows = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_mktsegment", "c_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val aSet = aKeys.toSet
    val aSk = aKeys.map(x => h52(x.toString)).distinct.sorted.take(K).toSeq
    val got = run("q85_kmv_join_est").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    for ((g, rows) <- bRows.groupBy(_._1)) {
      val bs = rows.map(_._2)
      val bSk = bs.map(x => h52(x.toString)).distinct.sorted.take(K).toSeq
      val u = (aSk ++ bSk).distinct.sorted.take(K)
      val nBoth = u.count(h => aSk.contains(h) && bSk.contains(h)).toLong
      val exact = bs.count(aSet).toLong
      val est =
        if (u.length < K) nBoth.toDouble
        else BigDecimal(nBoth.toDouble / u.length *
          ((255L * 4503599627370496L).toDouble / u.max.toDouble))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(g) == ((exact, u.length.toLong, nBoth, est)), s"segment $g")
    }
  }

  test("t20: entropy and KL respect the information-theoretic bounds") {
    val rows = run("t20_domain_divergence").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    for ((src, n, vocab, h, kl) <- rows) {
      assert(h > 0.0 && h <= math.log(vocab.toDouble) + 1e-6,
        s"$src: entropy $h outside (0, ln($vocab)]")
      // Gibbs: KL >= 0 (tolerance for the per-term 1e-9 quantization)
      assert(kl >= -1e-4, s"$src: negative KL $kl")
      assert(n > vocab, s"$src: token count $n not above vocab $vocab")
    }
    // per-source token counts partition the corpus token count
    val corpusToks = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("size(split(text, ' ')) AS n").collect().map(_.getInt(0).toLong).sum
    assert(rows.map(_._2).sum == corpusToks)
  }

  test("d09: prefix filtering loses no pair vs an exhaustive all-pairs scan") {
    // the pigeonhole completeness claim, checked against brute force:
    // every pair with shingle-Jaccard >= 3/5 must survive the prefix join
    val shingles = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(0, size(split(text, ' ')) - 3), " +
          "i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2]))) AS sh")
      .where("size(split(text, ' ')) >= 3")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val brute = (for {
      (a, sa) <- shingles; (b, sb) <- shingles if a < b
      common = (sa & sb).size
      if 5L * common >= 3L * (sa.size + sb.size - common)
    } yield (a, b, common.toLong)).toSet
    val got = run("d09_prefix_filter_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} spurious=${(got -- brute).take(5)}")
  }

  test("q86: window-scan skyline equals brute-force dominance") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_totalprice AS DOUBLE) AS p",
        "CAST(o_orderdate AS STRING) AS dt")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    def dominates(a: (Long, Double, String), b: (Long, Double, String)): Boolean =
      a._2 >= b._2 && a._3 <= b._3 && (a._2 > b._2 || a._3 < b._3)
    val brute = orders.filter(o => !orders.exists(x => dominates(x, o))).map(_._1).toSet
    val got = run("q86_skyline").collect().map(_.getLong(0)).toSet
    assert(got == brute, s"missing=${(brute -- got).take(5)} spurious=${(got -- brute).take(5)}")
  }

  test("s10: PCA equals a scalar moments + 8-step power iteration, bit for bit") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val DIM = 16
    // CAST(double AS DECIMAL(28,12)) in both engines: shortest-repr
    // decimal of the double, HALF_UP at scale 12
    def dec12(x: Double): JBD = JBD.valueOf(x).setScale(12, RoundingMode.HALF_UP)
    def r6(x: Double): Double =
      JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("transform(slice(embedding, 1, 16), x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vecs.length.toDouble
    val s1 = Array.tabulate(DIM)(i => vecs.map(v => dec12(v(i))).reduce(_ add _))
    val s2 = Array.tabulate(DIM, DIM)((i, j) =>
      vecs.map(v => dec12(v(i) * v(j))).reduce(_ add _))
    val c = Array.tabulate(DIM, DIM)((i, j) =>
      s2(math.min(i, j))(math.max(i, j)).doubleValue() / n -
        (s1(i).doubleValue() / n) * (s1(j).doubleValue() / n))
    def matvec(x: Array[Double]): Array[Double] =
      c.map(row => row.zip(x).map { case (cv, xx) => cv * xx }.foldLeft(0.0)(_ + _))
    def norm(v: Array[Double]): Double =
      math.sqrt(v.map(y => y * y).foldLeft(0.0)(_ + _))
    val y8 = (1 to 8).foldLeft(Array.tabulate(DIM)(i => if (i == 0) 1.0 else 0.0))(
      (x, _) => matvec(x))
    val y9 = matvec(y8)
    val (n8, n9) = (norm(y8), norm(y9))

    val got = run("s10_pca_power").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == DIM)
    for ((d, loading, eig, varv) <- got) {
      assert(loading == r6(y8(d - 1) / n8), s"loading dim $d")
      assert(eig == r6(n9 / n8), s"eigenvalue dim $d")
      assert(varv == r6(c(d - 1)(d - 1)), s"variance dim $d")
    }
  }

  /** Scalar CDC re-implementation: same 4-char rolling hash, mod-32
    * boundaries, md5 chunk identity. */
  private def cdcChunks(text: String): Seq[String] = {
    val n = text.length
    val cuts = (4 to n).filter { i =>
      val c = text.substring(i - 4, i).map(_.toInt)
      (c(0) * 29791 + c(1) * 961 + c(2) * 31 + c(3)) % 32 == 0
    }
    val bounds = 0 +: cuts :+ n
    bounds.sliding(2).map { case Seq(a, b) => text.substring(a, b) }
      .filter(_.nonEmpty).toSeq
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("d10: chunking matches a scalar CDC rebuild and chunks reassemble the text") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunksByDoc = docs.map { case (id, text) => id -> cdcChunks(text) }
    // chunks reassemble the text exactly (boundaries partition, never drop)
    chunksByDoc.foreach { case (id, cs) => assert(cs.mkString == docs(id), s"doc $id") }
    // full differential: per-doc distinct-chunk counts and cross-doc
    // shared counts from the scalar rebuild must equal the query
    val hashesByDoc = chunksByDoc.map { case (id, cs) => id -> cs.map(md5hex).toSet }
    val spread = hashesByDoc.values.flatten.groupBy(identity).view
      .mapValues(_ => 0).keys.map { h =>
        h -> hashesByDoc.count(_._2.contains(h))
      }.toMap
    val expected = hashesByDoc.collect { case (id, hs) if hs.nonEmpty =>
      id -> ((hs.size.toLong, hs.count(h => spread(h) > 1).toLong))
    }
    val got = run("d10_cdc_chunks").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // an exact-duplicate text must be 100% chunk-shared with its twin
    val byText = docs.groupBy(_._2).filter(_._2.size > 1)
    val dupRatios = run("d10_cdc_chunks").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    byText.values.flatten.foreach { case (id, _) =>
      assert(dupRatios(id) == 1.0, s"exact-dup doc $id should be fully shared")
    }
  }
}
