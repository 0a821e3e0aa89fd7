package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-5 third-wave additions (q92 Hilbert layout,
  * q93 Bloom membership, s12 JL random projection, t22 Zipf fit, c03
  * grid DBSCAN, m07 PCM energy). As with Round5bOpsSpec, the DuckDB
  * oracle pins each query's VALUES; these tests pin properties the hash
  * cannot name — bijectivity, the no-false-negative guarantee, blocking
  * losslessness, estimator self-consistency — against scalar
  * reimplementations.
  */
class Round5cOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  /** Scalar xy2d for an n x n grid (n a power of two). */
  private def xy2d(n: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("q92: scalar Hilbert walk is a 256x256 bijection and reproduces the buckets") {
    // bijectivity of the curve itself (the property that makes it a layout)
    val seen = new java.util.BitSet(65536)
    for (x <- 0 until 256; y <- 0 until 256) {
      val d = xy2d(256, x, y).toInt
      assert(d >= 0 && d < 65536 && !seen.get(d), s"collision/out-of-range at ($x,$y) -> $d")
      seen.set(d)
    }
    // adjacent curve positions are always grid neighbors (|dx|+|dy| = 1)
    // on a sampled stretch — the locality property z-order lacks
    val inv = new Array[(Int, Int)](65536)
    for (x <- 0 until 256; y <- 0 until 256) inv(xy2d(256, x, y).toInt) = (x, y)
    for (d <- 0 until 4096) {
      val (ax, ay) = inv(d); val (bx, by) = inv(d + 1)
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1, s"curve jump at d=$d")
    }
    // full differential against the query's per-bucket stats
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey % 256 AS x", "CAST(floor(o_totalprice) AS BIGINT) % 256 AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = orders.map { case (x, y) => (xy2d(256, x, y), x, y) }
      .groupBy(_._1 / 1024).toSeq.sortBy(_._1)
      .map { case (b, rows) =>
        (b, rows.length.toLong, rows.map(_._1).min, rows.map(_._1).max,
          rows.map(_._2).min, rows.map(_._2).max, rows.map(_._3).min, rows.map(_._3).max)
      }
    val got = run("q92_hilbert_layout").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want, s"bucket stats mismatch: got ${got.take(3)} want ${want.take(3)}")
  }

  test("q93: scalar Bloom filter reproduces the counts; no false negatives by construction") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_totalprice") > 150000.0)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val words = new Array[Long](32)
    for (k <- orders; j <- 0 until 3) {
      val pos = (h32(s"bf$j:$k") % 1024).toInt
      words(pos / 32) |= 1L << (pos % 32)
    }
    def member(k: Long): Boolean = (0 until 3).forall { j =>
      val pos = (h32(s"bf$j:$k") % 1024).toInt
      ((words(pos / 32) >> (pos % 32)) & 1L) == 1L
    }
    val custs = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = custs.groupBy(_._2).toSeq.sortBy(_._1).map { case (seg, rows) =>
      val hits = rows.count(r => member(r._1))
      val trues = rows.count(r => orders(r._1))
      val fps = rows.count(r => member(r._1) && !orders(r._1))
      (seg, rows.length.toLong, hits.toLong, trues.toLong, fps.toLong, true)
    }
    val got = run("q93_bloom_membership").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == want, s"bloom counts mismatch: got $got want $want")
    // every actual member must hit — the defining Bloom guarantee
    assert(orders.forall(member), "false negative in the scalar filter")
    assert(got.forall(_._6), "query reported a false negative")
  }

  test("s12: projected cosines match a scalar JL projection; recall is self-consistent") {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def proj(v: Array[Double]): Array[Double] =
      Array.tabulate(8) { j0 =>
        var acc = 0.0
        for (i <- 1 to 64)
          acc += v(i - 1) * (if (h32(s"rp${j0 + 1}:$i") % 2 == 0) 1.0 else -1.0)
        acc
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      val r = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = run("s12_random_projection").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (qid, nb) = (r.getLong(0), r.getLong(2))
      assert(r.getDouble(4) == cos(proj(vecs(qid)), proj(vecs(nb))),
        s"pcos mismatch for ($qid,$nb)")
      assert(r.getDouble(3) == cos(vecs(qid), vecs(nb)), s"cosine mismatch for ($qid,$nb)")
    }
    // recall5 column equals the fraction of rows flagged in_exact per query
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val want = rows.count(_.getBoolean(5)).toDouble / 5.0
      assert(rows.forall(_.getDouble(6) == want), s"recall5 inconsistent for $qid")
    }
  }

  test("t22: slope/r2 equal a scalar exact-integer OLS over micro-nat points") {
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(t => (r.getString(0), t)))
    val want = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
      val freq = rows.groupBy(_._2).map { case (t, g) => (t, g.length.toLong) }.toSeq
        .sortBy { case (t, c) => (-c, t) }
      val pts = freq.zipWithIndex.map { case ((_, c), i) =>
        (math.round(math.log((i + 1).toDouble) * 1e6), math.round(math.log(c.toDouble) * 1e6))
      }
      val n = BigInt(pts.length)
      val sx = pts.map(p => BigInt(p._1)).sum
      val sy = pts.map(p => BigInt(p._2)).sum
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val syy = pts.map(p => BigInt(p._2) * p._2).sum
      val num = (n * sxy - sx * sy).toDouble
      val denx = (n * sxx - sx * sx).toDouble
      val deny = (n * syy - sy * sy).toDouble
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (src, pts.length.toLong, r6(num / denx), r6(num * num / (denx * deny)))
    }
    val got = run("t22_zipf_slope").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == want, s"zipf fit mismatch: got $got want $want")
    // frequency spectra are decreasing by construction: every slope is
    // negative and r2 is a valid coefficient of determination (the tiny
    // sf0.001 vocabularies make flat spectra, so no strength bound here)
    assert(got.forall(_._3 < 0), "a source has non-negative zipf slope")
    assert(got.forall(r => r._4 >= 0 && r._4 <= 1), "r2 out of [0,1]")
  }

  test("c03: grid blocking is lossless vs scalar all-pairs DBSCAN (roles + clusters)") {
    val pts = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id",
        "CAST(floor(CAST(embedding[0] AS DOUBLE) * 50) AS BIGINT) AS x",
        "CAST(floor(CAST(embedding[1] AS DOUBLE) * 50) AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nbrs = pts.map { case (id, x, y) =>
      id -> pts.filter { case (id2, x2, y2) =>
        id2 != id && (x - x2) * (x - x2) + (y - y2) * (y - y2) <= 2
      }.map(_._1).toSet
    }.toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size >= 4).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    for (c <- core; n <- nbrs(c) if core(n)) {
      val (ra, rb) = (find(c), find(n))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = core.map(c => c -> core.filter(o => find(o) == find(c)).min).toMap
    val want = pts.sortBy(_._1).map { case (id, x, y) =>
      if (core(id)) (id, x, y, "core", Some(comp(id)))
      else {
        val cn = nbrs(id).filter(core)
        if (cn.nonEmpty) (id, x, y, "border", Some(cn.map(comp).min))
        else (id, x, y, "noise", None)
      }
    }.toSeq
    val got = run("c03_dbscan_grid").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == want, s"dbscan mismatch: got ${got.take(5)} want ${want.take(5)}")
    assert(got.exists(_._4 == "core"), "no core points — parameters degenerate")
  }

  test("m07: windows equal a scalar PCM16-LE fold; silence flag is exact-integer") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val want = docs.flatMap { case (id, bytes) =>
      val ns = bytes.length / 2
      (0 until (ns + 63) / 64).map { w =>
        val lo = w * 64; val hi = math.min(lo + 64, ns)
        var ss = 0L
        for (k <- lo until hi) {
          val raw = (bytes(2 * k) & 0xff) | ((bytes(2 * k + 1) & 0xff) << 8)
          val sv = if (raw >= 32768) raw - 65536 else raw
          ss += sv.toLong * sv
        }
        val n = hi - lo
        val rms = BigDecimal(math.sqrt(ss.toDouble / n))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, w, n, ss, rms, ss < 1000L * n)
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = run("m07_pcm_energy").collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got == want, s"pcm mismatch: got ${got.take(3)} want ${want.take(3)}")
  }
}
